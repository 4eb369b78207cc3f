"""Attribute the W8A8 v4 serving kernel's step time with perf probes
(round-3 VERDICT #2).

The schedule A/Bs of rounds 1-2 each moved only a few percent, leaving a
~2x gap to the naive MXU+DMA floor unexplained.  These probes MODIFY the
kernel's work (producing wrong audio) to measure cost shares directly, in
one process, interleaved against the real v4 kernel:

  * cheap_gate     — replaces the f32 sigmoid*tanh chain with two clips.
                     The delta is the VPU transcendental cost sitting on
                     the per-layer dependency chain.
  * no_ring_write  — skips the 30 ring writeback DMAs (+ their waits).
                     The delta bounds the ring write-bandwidth/wait share.

Usage: python benchmarks/ab_probe.py [B] [reps]
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
    mel = jnp.asarray(stft.melspectrogram_np(wav))
    gen_len = (mel.shape[1] - 1) * 200

    amax = jax.jit(fg.calibrate_act_amax)(
        params, jnp.asarray(wav[:8]), mel[:8])
    kw = fk.build_kernel_weights(
        cfg, params, weight_dtype=jnp.int8, act_amax=amax, gate_static=True)
    kw.pop("out_pad"), kw.pop("out_pad_seg")
    kw = jax.device_put(kw)
    enc, _ = model.deconv_stack(params, mel)
    enc_t = jax.device_put(jnp.transpose(enc, (1, 0, 2))[:gen_len].astype(jnp.bfloat16))

    variants = {}
    for name in ("v4", "cheap_gate", "no_ring_write"):
        gen = fk.cached_generate_fn(
            cfg, B, gen_len, weight_dtype=jnp.int8, act_scale="static",
            gate_scale="static", probe="" if name == "v4" else name,
        )
        f = jax.jit(lambda k, e, s, gen=gen: gen(k, e, s))
        t0 = time.time()
        out = np.asarray(f(kw, enc_t, 1))
        print(f"{name}: compile+first {time.time() - t0:.0f}s", file=sys.stderr)
        assert np.isfinite(out).all()
        variants[name] = (f, [])

    for rep in range(reps):
        for name, (f, times) in variants.items():
            t0 = time.time()
            np.asarray(f(kw, enc_t, rep))
            times.append(time.time() - t0)

    base = None
    for name, (f, times) in variants.items():
        dt = float(np.median(times))
        us = dt / gen_len * 1e6
        if name == "v4":
            base = us
        print(f"{name:14s} median step {us:7.1f} us "
              f"(spread {min(times) / gen_len * 1e6:.1f}-"
              f"{max(times) / gen_len * 1e6:.1f}) "
              f"delta vs v4 {base - us:+.1f} us")


if __name__ == "__main__":
    main()
