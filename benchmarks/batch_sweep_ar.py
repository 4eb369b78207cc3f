"""Sweep serving batch for the Pallas AR kernel: weights are re-streamed
from HBM every step regardless of batch, so throughput should rise with B
until ring-buffer/cond DMA traffic catches up.  Usage:
    python benchmarks/batch_sweep_ar.py [dtype] [B ...]
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
    variant = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, "int8s": jnp.int8}[variant]
    batches = [int(b) for b in sys.argv[2:]] or [128, 256, 512]
    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu",
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    sr = 16000
    length = sr
    rng = np.random.RandomState(0)
    t = np.arange(length) / sr
    extra = {}
    if variant == "int8s":
        # v4 static activation + gate scales: the VMEM-lightest variant
        # (no exponent lanes, one merged matmul) — the one that can reach
        # the largest serving batches
        cal = np.clip(
            0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(8, length),
            -0.99, 0.99,
        ).astype(np.float32)
        cal_mel = stft.melspectrogram_np(cal)
        amax = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(cal), jnp.asarray(cal_mel))
        extra = dict(act_amax=amax, gate_static=True)
    for B in batches:
        wav = np.clip(
            0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, length),
            -0.99, 0.99,
        ).astype(np.float32)
        mel = stft.melspectrogram_np(wav)
        gen_len = (mel.shape[1] - 1) * 200
        try:
            # scalar witness: bulk audio fetches time the debug tunnel, not
            # the chip (benchmarks/RESULTS.md round-3)
            gen = jax.jit(
                lambda p, m, s: jnp.mean(jnp.abs(fg.generate_pallas(
                    p, m, s, length=gen_len, weight_dtype=dtype, **extra)))
            )
            t0 = time.time()
            out = np.asarray(gen(params, mel, 1))
            compile_s = time.time() - t0
            assert np.isfinite(out).all()
            runs = 3
            t0 = time.time()
            for i in range(runs):
                out = np.asarray(gen(params, mel, i))
            dt = (time.time() - t0) / runs
            print(
                f"B={B}: {B * gen_len / dt:,.0f} samples/s "
                f"({B * gen_len / sr / dt:.1f} audio-sec/s/chip, "
                f"step {dt / gen_len * 1e6:.1f}us, compile {compile_s:.0f}s)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
