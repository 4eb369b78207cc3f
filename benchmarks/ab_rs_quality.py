"""int8 serving quality-tax mitigation experiment (round-3 VERDICT #7).

The W8A8 modes trail bf16 on golden free-run matched-mel corr by ~0.02-0.08
(benchmarks/RESULTS.md round-3 table).  One controlled attempt to buy the
quality back: stream the res/skip matrices in bf16 (rs_dtype=bfloat16 —
plumbing already in ops/fastgen_kernel.py) while the big dilated+cond
matmuls stay W8A8-static.  Round-2 measured this variant's SPEED
(~parity with full int8, "v3 + bf16-streamed res/skip"); its QUALITY was
never measured.  This tool free-runs every committed golden head through

    bf16 | int8s (v4) | int8s + rs_dtype=bf16

and reports matched/mismatched tracking corr per mode, plus an interleaved
step-time A/B of the two int8 variants at serving batch.

Usage: python benchmarks/ab_rs_quality.py [--speed_batch 512] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from nsynth_wavenet_tpu.models.fastgen import Fastgen  # noqa: E402
from tools.make_golden_ckpt import available_heads, eval_mels, load_golden  # noqa: E402
from tools.quality_smoke import mel_track_corr  # noqa: E402


def quality():
    heads = available_heads()
    assert heads, "no golden checkpoints"
    for head in heads:
        model, params, meta = load_golden(head)
        mels, wavs = eval_mels(n=8)
        fg = Fastgen(model)
        amax = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(wavs), jnp.asarray(mels))
        for name, kw in (
            ("bf16", dict(weight_dtype=jnp.bfloat16)),
            ("int8s", dict(weight_dtype=jnp.int8, act_amax=amax,
                           gate_static=True)),
            ("int8s+rsbf16", dict(weight_dtype=jnp.int8, act_amax=amax,
                                  rs_dtype=jnp.bfloat16)),
        ):
            audio = np.asarray(jax.jit(
                lambda p, m, kw=kw: fg.generate_pallas(p, m, seed=7, **kw)
            )(params, jnp.asarray(mels)))
            m_corr, mm_corr = mel_track_corr(audio, mels, meta["gen_samples"])
            print(f"quality[{head}/{name}]: matched {m_corr:.3f} vs "
                  f"mismatched {mm_corr:.3f} (committed XLA "
                  f"{meta['matched_corr']:.3f})")


def speed(B, reps):
    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.ops import stft

    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu",
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, 16000),
        -0.99, 0.99,
    ).astype(np.float32)
    mel = jnp.asarray(stft.melspectrogram_np(wav))
    gen_len = (mel.shape[1] - 1) * 200
    amax = jax.jit(fg.calibrate_act_amax)(
        params, jnp.asarray(wav[:8]), mel[:8])
    fns = {}
    for name, kw in (
        ("int8s", dict(weight_dtype=jnp.int8, act_amax=amax, gate_static=True)),
        ("int8s+rsbf16", dict(weight_dtype=jnp.int8, act_amax=amax,
                              rs_dtype=jnp.bfloat16)),
    ):
        f = jax.jit(lambda p, m, s, kw=kw: fg.generate_pallas(
            p, m, s, length=gen_len, **kw))
        t0 = time.time()
        out = np.asarray(f(params, mel, 1))
        print(f"speed[{name}]: compile+first {time.time() - t0:.0f}s",
              file=sys.stderr)
        assert np.isfinite(out).all()
        fns[name] = (f, [])
    for rep in range(reps):
        for name, (f, times) in fns.items():
            t0 = time.time()
            np.asarray(f(params, mel, rep))
            times.append(time.time() - t0)
    for name, (f, times) in fns.items():
        dt = float(np.median(times))
        print(f"speed[{name}]: median step {dt / gen_len * 1e6:.1f} us at B={B} "
              f"({B * gen_len / 16000 / dt:.1f} audio-sec/s/chip)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed_batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip_speed", action="store_true")
    args = ap.parse_args()
    quality()
    if not args.skip_speed:
        speed(args.speed_batch, args.reps)


if __name__ == "__main__":
    main()
