"""Interleaved A/B of flow-trunk kernel variants for one-shot student
serving (round-5: the trunk kernels are 67% of the path —
profile_student_tail.py — so the levers are IN the kernel):

  default   — the shipped round-4 path (fuse_taps, per-cycle calls)
  cond      — fuse_cond: fold the K=256 cond matmul into the fused tap
              issue (one K=448 matmul per layer instead of two issues)
  lpc       — layers_per_call=30: flow 3's three dilation cycles in ONE
              pallas_call (no inter-group [L, B, W] HBM round trip, enc
              streamed once instead of 3x)
  cond+lpc  — both

Protocol: same-session interleaved reps, scalar witness, medians
(RESULTS.md bench conventions).  Parity asserted against `default`.

Usage: python benchmarks/ab_trunk_variants.py [--batch 32] [--sec 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models import parallelgen
from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--sec", type=float, default=4.0)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--b_tile", type=int, default=8)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    B, L = args.batch, int(16000 * args.sec)

    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    t = np.arange(L) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L),
        -0.99, 0.99,
    ).astype(np.float32)
    mel = jnp.asarray(stft.melspectrogram_np(wav))

    def arm(**kw):
        return jax.jit(lambda p, m, r: (lambda a: (a, jnp.mean(jnp.abs(a))))(
            parallelgen.synthesize_pallas(
                pwn, p, m, r, tile=args.tile, b_tile=args.b_tile, **kw)))

    arms = {
        "default": arm(),
        "cond": arm(fuse_cond=True),
        "lpc": arm(layers_per_call=30),
        "cond+lpc": arm(fuse_cond=True, layers_per_call=30),
    }
    fns = {}
    for name, f in arms.items():
        t0 = time.time()
        audio, w = f(params, mel, jax.random.PRNGKey(0))
        w = float(np.asarray(w))
        print(f"{name}: compile+first {time.time() - t0:.1f}s (witness "
              f"{w:.4f})", file=sys.stderr)
        assert np.isfinite(w)
        fns[name] = (f, [], audio)

    base = np.asarray(fns["default"][2])
    for name, (_, _, audio) in fns.items():
        if name == "default":
            continue
        d = np.abs(np.asarray(audio) - base).max()
        print(f"parity {name} vs default: max abs diff {d:.2e}")

    for rep in range(args.reps):
        for name, (f, times, _) in fns.items():
            t0 = time.time()
            _, w = f(params, mel, jax.random.PRNGKey(rep))
            np.asarray(w)
            times.append(time.time() - t0)
    audio_sec = base.shape[0] * base.shape[1] / 16000.0
    meds = {n: float(np.median(ts)) for n, (f, ts, _) in fns.items()}
    for name, med in meds.items():
        print(f"{name}: median {med*1e3:.1f} ms "
              f"(spread {min(fns[name][1])*1e3:.0f}-"
              f"{max(fns[name][1])*1e3:.0f}) = "
              f"{audio_sec/med:.1f} audio-sec/s/chip  "
              f"[{meds['default']/med:.3f}x vs default]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
