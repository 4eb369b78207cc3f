"""Interleaved same-process A/B of W8A8 kernel variants at serving batch:

  * bf16             — bf16 weights (baseline)
  * int8_static      — W8A8 v4 (shipped): calibrated static per-layer
                       activation scales — taps + current activation merge
                       into ONE int8 matmul, no per-row abs-max/exp2
                       passes, ring rows drop the exponent lane block
  * int8_static_gate — v4 plus a fixed 1/127 gate scale (no per-row gate
                       abs-max pass; scale folded into s_rs at build)

Measured dead end (code removed): a pair-ring layout fetching both
dilation taps in ONE DMA (ring slots [l_t, l_{t-d}], 30 fewer DMA waits
per step) measured 6% SLOWER than the split ring (234.2 vs 221.6 us) —
per-layer tap-DMA wait latency is not the serialization bottleneck, and
the doubled ring-write bytes cost more than the saved wait.

Earlier round-2 measurements (same harness): the v3 schedule itself took
int8 from 1.12x to 1.26x bf16; a bf16 post-matmul combine measured WORSE
(1.19x) than f32 — conversions negate the 2x VPU elementwise win, and the
v5e Mosaic target cannot lower bf16 transcendental/compare chains at all
(see ops/fastgen_kernel._gate).

The tunneled backend's throughput drifts on an hour scale
(benchmarks/RESULTS.md "Variance"), so variants alternate rep-by-rep and
medians are compared.  Usage:
    python benchmarks/ab_int8_combine.py [B] [reps]
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
from nsynth_wavenet_tpu.ops import fastgen_kernel as fk
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

# (name, weight_dtype, int8_combine, rs_dtype, act_scale, gate_static)
VARIANTS = (
    ("bf16", jnp.bfloat16, "f32", None, "row", False),
    ("int8_static", jnp.int8, "f32", None, "static", False),
    ("int8_static_gate", jnp.int8, "f32", None, "static", True),
)


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
    encoding, _ = jax.jit(model.deconv_stack)(params, mel)
    gen_len = (mel.shape[1] - 1) * 200
    enc_t = jnp.transpose(encoding, (1, 0, 2))[:gen_len].astype(jnp.bfloat16)

    # calibration runs a full f32 training-style forward — a small batch
    # slice is plenty (amax is over all rows/timesteps) and fits HBM
    amax = jax.jit(fg.calibrate_act_amax)(
        params, jnp.asarray(wav[:8]), jnp.asarray(mel[:8])
    )
    print(f"calibrated act amax: {np.asarray(amax).round(3).tolist()}", file=sys.stderr)

    gens, kws = {}, {}
    for name, wd, comb, rsd, ascale, gs in VARIANTS:
        kw = jax.device_put(
            {k: v for k, v in fk.build_kernel_weights(
                cfg, params, weight_dtype=wd, rs_dtype=rsd,
                act_amax=amax if ascale == "static" else None,
                gate_static=gs).items()
             if not isinstance(v, int) and v is not None}
        )
        gen = fk.cached_generate_fn(
            cfg, B, gen_len, weight_dtype=wd, int8_combine=comb, rs_dtype=rsd,
            act_scale=ascale, gate_scale="static" if gs else "row",
        )
        t0 = time.time()
        out = np.asarray(gen(kw, enc_t, 0))
        assert np.isfinite(out).all()
        print(f"{name}: compile+first {time.time() - t0:.0f}s", file=sys.stderr)
        gens[name], kws[name] = gen, kw

    times = {name: [] for name, *_ in VARIANTS}
    for r in range(reps):
        for name, *_ in VARIANTS:
            t0 = time.time()
            np.asarray(gens[name](kws[name], enc_t, r + 1))
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        med = float(np.median(ts))
        print(
            f"{name}: median {med * 1e3:.0f} ms over {reps} "
            f"(spread {min(ts) * 1e3:.0f}-{max(ts) * 1e3:.0f}) -> "
            f"{B * gen_len / sr / med:.1f} audio-sec/s/chip, "
            f"step {med / gen_len * 1e6:.1f} us",
            file=sys.stderr,
        )
    base = float(np.median(times["bf16"]))
    for name, *_ in VARIANTS[1:]:
        print(f"{name} speedup over bf16: {base / float(np.median(times[name])):.3f}x",
              file=sys.stderr)


if __name__ == "__main__":
    main()
