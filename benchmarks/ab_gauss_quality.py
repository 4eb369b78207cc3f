"""Gauss-head int8 quality-tax diagnosis (round-3 VERDICT #5).

The golden free-run table shows the gauss head with the largest
int8-static drop (0.628 vs the committed XLA 0.707, ~11% relative; CE
drops ~3%).  But free-running a stochastic sampler re-rolls the audio:
each serving mode consumes a DIFFERENT random stream (in-kernel PRNG vs
XLA threefry; int8 vs bf16 arithmetic diverges the sample path within
steps), so a single-seed comparison confounds the quantization tax with
sampling variance.  This A/B separates them: every serving mode free-runs
the gauss golden checkpoint at N seeds, and the per-mode mean +/- spread
decides whether the tax is real and which mitigation (if any) pays.

Modes: xla (lax.scan reference), bf16 kernel, int8 row-scale, int8 static
(shipped fastest), int8 static + rs_dtype=bf16 (the round-3 mitigation:
gate/rs stay bf16), int8 row + more calibration (n/a — row mode has no
calibration).

Usage: python benchmarks/ab_gauss_quality.py [--seeds 5] [--head gauss]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--head", default="gauss")
    args = ap.parse_args()

    from tools.make_golden_ckpt import eval_mels, load_golden
    from tools.quality_smoke import mel_track_corr
    from nsynth_wavenet_tpu.models.fastgen import Fastgen

    model, params, meta = load_golden(args.head)
    mels, wavs = eval_mels(n=8)
    fg = Fastgen(model)
    amax = jax.jit(fg.calibrate_act_amax)(
        params, jnp.asarray(wavs), jnp.asarray(mels)
    )

    def pallas_fn(wd, am, rs):
        return jax.jit(
            lambda p, m, s: fg.generate_pallas(
                p, m, seed=s, weight_dtype=wd, act_amax=am,
                gate_static=am is not None and rs is None, rs_dtype=rs,
            )
        )

    modes = {
        "xla": jax.jit(lambda p, m, s: fg.generate(
            p, m, jax.random.PRNGKey(s), precompute_cond=False)),
        "bf16": pallas_fn(jnp.bfloat16, None, None),
        "int8_row": pallas_fn(jnp.int8, None, None),
        "int8_static": pallas_fn(jnp.int8, amax, None),
        "int8_static_rsbf16": pallas_fn(jnp.int8, amax, jnp.bfloat16),
    }
    seeds = [3, 5, 7, 11, 13, 17, 19, 23][: args.seeds]
    print(f"head={args.head} committed XLA matched_corr "
          f"{meta['matched_corr']:.3f}; {len(seeds)} seeds x "
          f"{len(modes)} modes", file=sys.stderr)
    rows = {}
    for name, fn in modes.items():
        cs = []
        for s in seeds:
            audio = np.asarray(fn(params, jnp.asarray(mels), s))
            m_corr, mm_corr = mel_track_corr(audio, mels, meta["gen_samples"])
            cs.append(m_corr)
        rows[name] = cs
        print(f"{name:>20}: mean {np.mean(cs):.3f} +/- {np.std(cs):.3f} "
              f"(per-seed {' '.join(f'{c:.3f}' for c in cs)})")

    base = np.mean(rows["bf16"])
    for name, cs in rows.items():
        d = np.mean(cs) - base
        sig = abs(d) > 2 * (np.std(cs) + np.std(rows["bf16"])) / np.sqrt(len(cs))
        print(f"{name:>20}: delta vs bf16 {d:+.3f} "
              f"({'significant' if sig else 'within noise'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
