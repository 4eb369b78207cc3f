"""Interleaved end-to-end A/B of one-shot student serving: XLA conv path
vs the integrated fused-Pallas flow-kernel path
(models/parallelgen.synthesize_pallas) at the full student config.

Round-3 VERDICT #1 sets the done bar: >= 2x end-to-end one-shot throughput
(>= ~280 audio-sec/s/chip device-level at the sweep's B=16 optimum).
Reference to beat: wavenet/parallelgen.py:22-51 (one GPU, graph rebuilt
per utterance).

Protocol (benchmarks/RESULTS.md round-3 "bench protocol"): jitted inputs
passed as args, scalar witness per timed rep (never time the tunnel),
same-session interleaved reps, medians.  One untimed full fetch checks
cross-path parity.

Usage: python benchmarks/ab_student_serving.py [--batches 8,16] [--sec 4.0]
           [--tile 128] [--b_tile 8] [--reps 6]
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


def make_inputs(B, L, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(L) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L),
        -0.99, 0.99,
    ).astype(np.float32)
    return np.asarray(stft.melspectrogram_np(wav))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--sec", type=float, default=4.0)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--b_tile", type=int, default=8)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--fuse_cond", action="store_true",
                    help="fold the cond matmul into the fused tap issue "
                         "(K=3W+DW) in the pallas arm")
    ap.add_argument("--lpc", type=int, default=0,
                    help="layers_per_call for the pallas arm (0 = one "
                         "dilation cycle; 30 fuses the whole long flow)")
    ap.add_argument("--profile", action="store_true",
                    help="also capture a device trace of one pallas batch")
    args = ap.parse_args()

    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))
    L = int(16000 * args.sec)

    speedups = {}
    for B in [int(b) for b in args.batches.split(",")]:
        mel = jnp.asarray(make_inputs(B, L))

        @jax.jit
        def synth_xla(params, mel, rng):
            audio = parallelgen.synthesize(pwn, params, mel, rng)
            return audio, jnp.mean(jnp.abs(audio))

        @jax.jit
        def synth_pl(params, mel, rng):
            audio = parallelgen.synthesize_pallas(
                pwn, params, mel, rng, tile=args.tile, b_tile=args.b_tile,
                layers_per_call=args.lpc, fuse_cond=args.fuse_cond,
            )
            return audio, jnp.mean(jnp.abs(audio))

        arms = [("xla", synth_xla), ("pallas", synth_pl)]

        fns = {}
        for name, f in arms:
            t0 = time.time()
            audio, w = f(params, mel, jax.random.PRNGKey(0))
            w = float(np.asarray(w))
            print(f"B={B} {name}: compile+first {time.time() - t0:.1f}s "
                  f"(witness {w:.4f})", file=sys.stderr)
            assert np.isfinite(w)
            fns[name] = (f, [], audio)

        # untimed cross-path parity fetch (one quantization-bin bound would
        # need identical rounding; report the raw max diff instead)
        a = np.asarray(fns["xla"][2])
        b = np.asarray(fns["pallas"][2])
        print(f"B={B} parity: max abs diff {np.abs(a - b).max():.2e} "
              f"(bin width {2.0 / cfg.quant_chann:.2e}), "
              f"corr {np.corrcoef(a.ravel(), b.ravel())[0, 1]:.6f}")

        for rep in range(args.reps):
            for name, (f, times, _) in fns.items():
                t0 = time.time()
                _, w = f(params, mel, jax.random.PRNGKey(rep))
                np.asarray(w)
                times.append(time.time() - t0)
        audio_sec = a.shape[0] * a.shape[1] / 16000.0
        meds = {}
        for name, (f, times, _) in fns.items():
            meds[name] = float(np.median(times))
            print(f"B={B} {name}: median {meds[name] * 1e3:.1f} ms "
                  f"(spread {min(times) * 1e3:.0f}-{max(times) * 1e3:.0f}) = "
                  f"{audio_sec / meds[name]:.1f} audio-sec/s/chip")
        speedups[B] = meds["xla"] / meds["pallas"]
        print(f"B={B} pallas end-to-end speedup: {speedups[B]:.2f}x "
              f"(done bar: >= 2x)")

    if args.profile:
        B = max(speedups)
        mel = jnp.asarray(make_inputs(B, L))
        f = jax.jit(lambda p, m, r: jnp.mean(jnp.abs(
            parallelgen.synthesize_pallas(pwn, p, m, r, tile=args.tile,
                                          b_tile=args.b_tile))))
        np.asarray(f(params, mel, jax.random.PRNGKey(0)))
        log_dir = os.environ.get("PROFILE_DIR", "/tmp/student_pallas_profile")
        os.makedirs(log_dir, exist_ok=True)
        with jax.profiler.trace(log_dir, create_perfetto_trace=True):
            np.asarray(f(params, mel, jax.random.PRNGKey(1)))
        from benchmarks.trace_util import top_device_ops
        top_device_ops(log_dir, top=20)
    return 0


if __name__ == "__main__":
    sys.exit(main())
