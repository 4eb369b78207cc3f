"""Student one-shot IAF serving: batch sweep + speed-of-light floor analysis
(round-3 VERDICT #6).

The AR path has a meticulous floor story (weight-streaming-bound, Pallas
kernel at ~0.9x of the HBM floor); the IAF student — the reference's
production vocoder, the very point of distillation (reference
Readme.md:84-92, parallelgen.py:22-51) — had only a dtype A/B.  This tool

  1. sweeps the serving batch at fixed utterance length,
  2. computes the analytic floors from the config:
       MXU floor  = total MACs / peak MAC rate (bf16),
       HBM floor  = a fused-activation-traffic estimate (each flow layer
                    streams its input once and writes its residual output
                    once in the trunk compute dtype; conv weights are
                    negligible at width 64 and read once per batch),
  3. captures a device trace of one batch and aggregates the top ops, so
     the measured-vs-floor verdict names WHERE the time goes.

Usage: python benchmarks/floor_student.py [--batches 8,16,32,64] [--sec 4.0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models import parallelgen
from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

PEAK_BF16_MACS = 98.5e12  # v5e: 197 TFLOP/s bf16
PEAK_HBM = 819e9  # v5e HBM GB/s


def analytic_floors(cfg, dtype_bytes=2):
    """(macs_per_sample, min_bytes_per_sample) from the flow topology.

    MACs: dilated conv (3 taps) + mel-cond 1x1 + res 1x1 per layer, the
    per-flow out heads, and the shared deconv upsampler.
    Bytes: fused lower bound — per layer one read + one write of the
    [.., width] activation stream, one read of the gate intermediate's
    extra half when gate_width != width, plus the per-flow mean/scale
    composition streams (f32) and the deconv output read per flow.
    """
    w = cfg.width
    gw = w  # student flows never double the gate width
    dw = cfg.deconv_width
    n_layers = sum(cfg.num_iaf_layers)
    n_flows = len(cfg.num_iaf_layers)

    macs = 0
    macs += n_layers * (3 * w * gw + dw * gw + (gw // 2) * w)  # dilated+cond+res
    macs += n_flows * 2 * w  # out2_mean / out2_scale 1x1 -> 1 channel
    # deconv stack (shared): trans conv [40,10] mel->dw then [80,20] dw->dw
    f1, s1 = cfg.deconv_config[0]
    f2, s2 = cfg.deconv_config[1]
    up1 = s1 * s2  # samples per stage-1 input frame... stage1 output is L/s2
    from nsynth_wavenet_tpu.ops.stft import MEL_PARAMS

    macs += f1 * MEL_PARAMS.num_mel * dw // (s1 * s2) + f2 * dw * dw // s2

    bytes_pm = 0
    # per layer: read l + write l' (residual), in trunk dtype; the gate
    # intermediate (gw) counts once as written+read when XLA cannot fuse
    # the dilated-conv output into the res conv (kept OUT of the lower
    # bound — this is the optimistic fused floor)
    bytes_pm += n_layers * 2 * w * dtype_bytes
    # per flow: mean/scale composition streams (f32 by design) ~4 arrays
    bytes_pm += n_flows * 4 * 4
    # deconv encoding read once per flow layer's cond conv input
    bytes_pm += n_layers * dw * dtype_bytes // 8  # enc tiles re-read, amortized
    return macs, bytes_pm


def trace_top_ops(log_dir, top=20):
    from benchmarks.trace_util import top_device_ops

    top_device_ops(log_dir, top=top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--sec", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--profile_batch", type=int, default=16)
    args = ap.parse_args()

    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))

    import jax.numpy as jnp

    # scalar witness per timed rep: the debug tunnel's transfer rate swings
    # ~KB/s-MB/s (benchmarks/RESULTS.md round-3), so fetching the full
    # audio batch would time the tunnel, not the chip
    @jax.jit
    def synth(params, mel, rng):
        audio = parallelgen.synthesize(pwn, params, mel, rng)
        return audio, jnp.mean(jnp.abs(audio))

    L = int(16000 * args.sec)
    macs_ps, bytes_ps = analytic_floors(cfg)
    print(f"analytic: {macs_ps / 1e6:.2f} M MACs/sample, fused-floor "
          f"{bytes_ps} B/sample")
    print(f"floors per chip: MXU {PEAK_BF16_MACS / macs_ps / 1e6:.1f} M samples/s "
          f"({PEAK_BF16_MACS / macs_ps / 16000:.0f} audio-sec/s), "
          f"HBM {PEAK_HBM / bytes_ps / 1e6:.1f} M samples/s "
          f"({PEAK_HBM / bytes_ps / 16000:.0f} audio-sec/s)")

    rng0 = np.random.RandomState(0)
    t = np.arange(L) / 16000.0
    results = {}
    for B in [int(b) for b in args.batches.split(",")]:
        wav = np.clip(
            0.3 * np.sin(2 * np.pi * 150 * t)[None]
            + 0.01 * rng0.randn(B, L), -0.99, 0.99
        ).astype(np.float32)
        mel = np.asarray(stft.melspectrogram_np(wav))
        t0 = time.time()
        audio_dev, w = synth(params, mel, jax.random.PRNGKey(0))
        assert np.isfinite(float(np.asarray(w)))
        print(f"B={B}: compile+first {time.time() - t0:.1f}s "
              f"(audio {audio_dev.shape})", file=sys.stderr)
        shape = audio_dev.shape
        times = []
        for i in range(args.reps):
            t0 = time.time()
            _, w = synth(params, mel, jax.random.PRNGKey(i))
            np.asarray(w)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        audio_sec = shape[0] * shape[1] / 16000.0
        sps = shape[0] * shape[1] / dt
        results[B] = audio_sec / dt
        print(f"B={B}: median {dt * 1e3:.1f} ms "
              f"(spread {min(times) * 1e3:.0f}-{max(times) * 1e3:.0f}) = "
              f"{audio_sec / dt:.1f} audio-sec/s/chip, {sps / 1e6:.2f} M samples/s, "
              f"MXU {macs_ps * sps / PEAK_BF16_MACS * 100:.1f}%, "
              f"fused-HBM-floor share {bytes_ps * sps / PEAK_HBM * 100:.1f}%")

    best_b = max(results, key=results.get)
    print(f"\nbest: B={best_b} at {results[best_b]:.1f} audio-sec/s/chip")

    # device trace of one batch at the profile batch size
    B = args.profile_batch
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng0.randn(B, L),
        -0.99, 0.99,
    ).astype(np.float32)
    mel = np.asarray(stft.melspectrogram_np(wav))
    np.asarray(synth(params, mel, jax.random.PRNGKey(0))[1])
    log_dir = os.environ.get("PROFILE_DIR", "/tmp/student_profile")
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        np.asarray(synth(params, mel, jax.random.PRNGKey(1))[1])
    trace_top_ops(log_dir)


if __name__ == "__main__":
    main()
