"""Decompose the fused-Pallas student one-shot path: kernel vs XLA tail.

Round-5 question: after the round-4 kernel wins, what share of
synthesize_pallas is the flow-stack kernels vs everything else (deconv
encode, enc transpose, start convs, out-head chains, f32 composition,
clip/quantize)?  The heads-in-kernel experiment LOST 20% end-to-end
(ab_student_serving --heads_ab), which falsifies "the XLA head chain
dominates the tail" — this probe measures where the non-kernel time
actually lives so the next lever is chosen on evidence.

Components timed (jitted, scalar witness, medians):
  A. deconv encode + time-major/cond-dtype transpose (shared stack)
  B. A + trunk kernels only (start conv + 6 stack calls, no heads)
  C. full path, fuse_heads=False      (B + XLA heads + composition)
  D. full path, fuse_heads=True       (kernel-epilogue heads)
  E. XLA head chain alone on a precomputed trunk stream (4 flows)

Usage: python benchmarks/profile_student_tail.py [--batch 32] [--sec 4]
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


def timeit(name, fn, *args, runs=5):
    t0 = time.time()
    w = np.asarray(fn(*args))
    compile_s = time.time() - t0
    assert np.isfinite(w).all()
    times = []
    for i in range(runs):
        t0 = time.time()
        np.asarray(fn(*args))
        times.append(time.time() - t0)
    med = float(np.median(times)) * 1000
    print(f"{name:54s} {med:8.1f} ms  (compile {compile_s:.1f}s)",
          file=sys.stderr)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--sec", type=float, default=4.0)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--b_tile", type=int, default=8)
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
    key = jax.random.PRNGKey(0)
    length = pwn.sample_length(mel.shape[1])

    from nsynth_wavenet_tpu.models.parallelgen import (
        _head_params_for_kernel, _iaf_flow_pallas, _mm_1x1, _trim_to,
    )
    from nsynth_wavenet_tpu.models import wavenet as wavenet_lib
    from nsynth_wavenet_tpu.ops import conv as conv_ops
    from nsynth_wavenet_tpu.ops import flow_kernel as flow_kernel_ops

    compact = pwn.dtype == jnp.bfloat16
    cond_dt = jnp.bfloat16 if compact else jnp.float32

    def enc_only(params, mel):
        mel_en, _ = pwn._flow_deconv(params, None, mel, False)
        enc_tm = jnp.transpose(_trim_to(mel_en, length), (1, 0, 2)).astype(cond_dt)
        return jnp.sum(enc_tm.astype(jnp.float32))

    t_enc = timeit("A. deconv encode + tm transpose", jax.jit(enc_only),
                   params, mel)

    def trunk_only(params, mel, rng):
        mel_en, _ = pwn._flow_deconv(params, None, mel, False)
        enc_tm = jnp.transpose(_trim_to(mel_en, length), (1, 0, 2)).astype(cond_dt)
        x = pwn.base_noise(rng, B, length)
        x_tm = jnp.transpose(x)[..., None]
        acc = 0.0
        iaf_x = x_tm
        for fi in range(pwn.num_flows):
            fp = params["flows"][fi]
            sw = flow_kernel_ops.stack_flow_weights(fp)
            w_start = conv_ops.effective_kernel(fp["start_conv"])
            taps = []
            for k in range(3):
                delay = 3 - k
                xd = jnp.concatenate(
                    [jnp.zeros((delay, B, 1), iaf_x.dtype),
                     iaf_x[: length - delay]], 0)
                taps.append(xd * w_start[k, 0][None, None, :])
            l = taps[0] + taps[1] + taps[2] + fp["start_conv"]["b"]
            b_eff = sw["b"] + sw["b_cond"]
            n_layers = cfg.num_iaf_layers[fi]
            for s in range(0, n_layers, cfg.num_stages):
                nl = min(cfg.num_stages, n_layers - s)
                fn = flow_kernel_ops.make_flow_stack_fn(
                    nl, cfg.num_stages, cfg.width, B, length,
                    tile=args.tile, b_tile=args.b_tile, interpret=False,
                    compact=compact, cond_features=enc_tm.shape[-1],
                    time_major=True, fuse_taps=True,
                )
                l = fn(l, enc_tm, sw["w_tap"][s:s+nl], b_eff[s:s+nl],
                       sw["w_res"][s:s+nl], sw["b_res"][s:s+nl],
                       sw["w_cond"][s:s+nl])
            acc = acc + jnp.sum(l)
            # feed the NEXT flow the same noise (no heads -> no real x');
            # keeps the inter-flow dependency without any tail math
            iaf_x = x_tm
        return acc

    t_trunk = timeit("B. A + start convs + trunk kernels only",
                     jax.jit(trunk_only), params, mel, key)

    full_nh = jax.jit(lambda p, m, r: jnp.mean(jnp.abs(
        parallelgen.synthesize_pallas(pwn, p, m, r, tile=args.tile,
                                      b_tile=args.b_tile, fuse_heads=False))))
    t_full = timeit("C. full path (XLA heads)", full_nh, params, mel, key)

    full_h = jax.jit(lambda p, m, r: jnp.mean(jnp.abs(
        parallelgen.synthesize_pallas(pwn, p, m, r, tile=args.tile,
                                      b_tile=args.b_tile, fuse_heads=True))))
    t_fullh = timeit("D. full path (kernel-epilogue heads)", full_h,
                     params, mel, key)

    def heads_only(params, mel, l_tm):
        mel_en, _ = pwn._flow_deconv(params, None, mel, False)
        enc_tm = jnp.transpose(_trim_to(mel_en, length), (1, 0, 2)).astype(cond_dt)
        dtype = pwn.dtype or jnp.float32
        acc = 0.0
        for fi in range(pwn.num_flows):
            fp = params["flows"][fi]
            h = jax.nn.relu(l_tm.astype(dtype))
            h = _mm_1x1(fp["out1"], h, dtype, dtype)
            c = _mm_1x1(fp["mel_cond_out1"], enc_tm, dtype, dtype)
            h = jax.nn.relu(h + c)
            mean = _mm_1x1(fp["out2_mean"], h, dtype)
            scale, log_scale = pwn.scale_log_scale(
                _mm_1x1(fp["out2_scale"], h, dtype))
            acc = acc + jnp.sum(mean) + jnp.sum(scale)
        return acc

    l_tm = jnp.asarray(
        rng.randn(length, B, cfg.width).astype(np.float32) * 0.3)
    t_heads = timeit("E. enc + 4x XLA head chain alone", jax.jit(heads_only),
                     params, mel, l_tm)

    print("\n--- shares (B=%d, %.1fs utts) ---" % (B, args.sec))
    print(f"deconv+transpose           {t_enc:7.1f} ms "
          f"({t_enc / t_full:.0%} of full)")
    print(f"trunk kernels (B - A)      {t_trunk - t_enc:7.1f} ms "
          f"({(t_trunk - t_enc) / t_full:.0%})")
    print(f"XLA tail (C - B)           {t_full - t_trunk:7.1f} ms "
          f"({(t_full - t_trunk) / t_full:.0%})  [heads + composition + "
          "clip/quant]")
    print(f"XLA head chains alone (E - A) {t_heads - t_enc:7.1f} ms")
    print(f"kernel-epilogue heads delta (D - C) {t_fullh - t_full:+7.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
