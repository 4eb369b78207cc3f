"""Interleaved same-process A/B of the Pallas AR kernel's weight dtypes
(bf16 vs W8A8 int8) at serving batch.  The tunneled backend's throughput
drifts on an hour scale (benchmarks/RESULTS.md "Variance"), so the two
variants alternate rep-by-rep and medians are compared — drift hits both
equally.  Usage:
    python benchmarks/ab_ar_dtype.py [B] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.fastgen import Fastgen
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu",
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    sr = 16000
    rng = np.random.RandomState(0)
    t = np.arange(sr) / sr
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, sr),
        -0.99, 0.99,
    ).astype(np.float32)
    mel = stft.melspectrogram_np(wav)
    gen_len = (mel.shape[1] - 1) * 200

    gens = {}
    for name, wd in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        gen = jax.jit(
            lambda p, m, s, wd=wd: fg.generate_pallas(p, m, s, length=gen_len,
                                                      weight_dtype=wd)
        )
        t0 = time.time()
        out = np.asarray(gen(params, mel, 0))
        assert np.isfinite(out).all()
        print(f"{name}: compile+first {time.time() - t0:.0f}s", file=sys.stderr)
        gens[name] = gen

    times = {"bf16": [], "int8": []}
    for r in range(reps):
        for name in ("bf16", "int8"):
            t0 = time.time()
            np.asarray(gens[name](params, mel, r + 1))
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        med = float(np.median(ts))
        print(
            f"{name}: median {med * 1e3:.0f} ms over {reps} "
            f"(spread {min(ts) * 1e3:.0f}-{max(ts) * 1e3:.0f}) -> "
            f"{B * gen_len / med:,.0f} samples/s, "
            f"{B * gen_len / sr / med:.1f} audio-sec/s/chip, "
            f"step {med / gen_len * 1e6:.1f} us",
            file=sys.stderr,
        )
    ratio = float(np.median(times["bf16"])) / float(np.median(times["int8"]))
    print(f"int8 speedup over bf16: {ratio:.3f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
