"""A/B the one-shot IAF serving path's flow-trunk dtype (compute_dtype
float32 vs bfloat16) in ONE process — the student flows now carry bf16
activations (models/parallel_wavenet.py), and the one-shot synthesis is
HBM-bound at width 64, so the carriers should matter for serving too.

Interleaved ABAB runs guard against the tunneled backend's monotonic
drift (benchmarks/RESULTS.md "variance").

Usage: python benchmarks/ab_iaf_dtype.py [reps]
"""

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

B, L = 16, 64000


def setup(compute_dtype):
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
        compute_dtype=compute_dtype,
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    t = np.arange(L) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L), -0.99, 0.99
    ).astype(np.float32)
    mel = np.asarray(stft.melspectrogram_np(wav))
    synth = parallelgen.jit_synthesize(pwn)
    out = np.asarray(synth(params, mel, jax.random.PRNGKey(0)))  # compile
    assert np.isfinite(out).all()
    return synth, params, mel, out.shape


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    runs_per_rep = 5
    ab = {}
    for cd in ("float32", "bfloat16"):
        ab[cd] = {"setup": setup(cd), "times": []}
    for rep in range(reps):
        for cd in ("float32", "bfloat16"):  # interleaved vs backend drift
            synth, params, mel, shape = ab[cd]["setup"]
            t0 = time.time()
            for i in range(runs_per_rep):
                np.asarray(synth(params, mel, jax.random.PRNGKey(i)))
            ab[cd]["times"].append((time.time() - t0) / runs_per_rep)
    audio_sec = shape[0] * shape[1] / 16000.0
    meds = {}
    for cd in ("float32", "bfloat16"):
        ts = np.asarray(ab[cd]["times"])
        meds[cd] = float(np.median(ts))
        print(
            f"iaf[{cd}]: median {meds[cd]*1e3:.1f} ms/batch over {reps} reps "
            f"(spread {ts.min()*1e3:.1f}-{ts.max()*1e3:.1f}) = "
            f"{audio_sec/meds[cd]:.1f} audio-sec/s/chip, Delay {meds[cd]/audio_sec:.5f}",
            file=sys.stderr,
        )
    print(f"bf16/f32 ratio: {meds['bfloat16']/meds['float32']:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
