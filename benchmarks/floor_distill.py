"""Floor accounting for the student DISTILLATION TRAIN STEP (round-5).

The other three hot paths got quantitative closure statements (teacher
training: at-XLA-ceiling with per-conv MFU evidence; AR serving:
corrected-floor; student serving: analytic floor + attribution); this
gives the distillation step — the thing users run for 200-400k iterations
(reference train_parallel_wavenet.py, config num_iters) — the same
treatment:

  1. measure the full step and grad-variants that isolate each loss
     component's fwd+bwd share (KL incl. the 2B fused teacher scoring,
     power incl. 2x STFT, the student IAF fwd+bwd alone);
  2. compute the MXU floor from the MAC counts the math REQUIRES
     (teacher fwd at 2B + the KL backward's input-gradient pass through
     the frozen teacher — frozen weights don't need weight grads, but
     d(KL)/d(student sample) flows through every teacher conv — plus the
     student flows fwd+bwd and the deconvs);
  3. print measured/floor and what dominates.

Timing protocol: scalar-witness host fetch per rep, medians (bench_all
conventions).  Run on a QUIET host — concurrent CPU load inflates the
tunnel dispatch share (measured 10x on a busy host).

Usage: python benchmarks/floor_distill.py [--batch 8] [--runs 5]
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
from nsynth_wavenet_tpu.models.parallel_wavenet import (
    ParallelWavenet,
    transplant_teacher_deconv,
)
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft as stft_ops
from nsynth_wavenet_tpu.training import train_lib
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

# v5e single-chip peaks (jax-ml.github.io/scaling-book numbers)
MXU_BF16_FLOPS = 197e12
HBM_GBPS = 819e9


def timeit(name, fn, *args, runs=5):
    t0 = time.time()
    w = np.asarray(fn(*args))
    compile_s = time.time() - t0
    assert np.isfinite(w).all()
    times = []
    for _ in range(runs):
        t0 = time.time()
        np.asarray(fn(*args))
        times.append(time.time() - t0)
    med = float(np.median(times)) * 1000
    print(f"{name:42s} {med:8.1f} ms   (compile {compile_s:.1f}s, "
          f"spread {min(times)*1e3:.0f}-{max(times)*1e3:.0f})",
          file=sys.stderr)
    return med


def teacher_macs_per_sample(cfg):
    """MACs/sample of one teacher forward (trunk + heads + cond)."""
    gw = cfg.gate_width
    per_layer = (
        3 * cfg.width * gw            # dilated conv
        + cfg.deconv_width * gw       # mel-cond 1x1
        + (gw // 2) * cfg.width       # res 1x1
        + (gw // 2) * cfg.skip_width  # skip 1x1
    )
    heads = (
        1 * cfg.width * 3             # conv_start (in=1)
        + cfg.width * cfg.skip_width  # skip_start
        + cfg.skip_width * cfg.skip_width
        + cfg.deconv_width * cfg.skip_width
        + cfg.skip_width * cfg.out_width
    )
    deconv = sum(
        fl * cfg.deconv_width * (cfg.deconv_width if i else 80) / st
        for i, (fl, st) in enumerate(cfg.deconv_config)
    )  # per OUTPUT sample (transposed conv; num_mel=80 first layer)
    return cfg.num_layers * per_layer + heads + deconv


def student_macs_per_sample(cfg):
    per_layer = (
        3 * cfg.width * cfg.width
        + cfg.deconv_width * cfg.width
        + (cfg.width // 2) * cfg.width
    )
    n_layers = sum(cfg.num_iaf_layers)
    heads_per_flow = (
        cfg.width * cfg.width + cfg.deconv_width * cfg.width + cfg.width * 2
    )
    deconv = sum(
        fl * cfg.deconv_width * (cfg.deconv_width if i else 80) / st
        for i, (fl, st) in enumerate(cfg.deconv_config)
    )
    return (n_layers * per_layer + len(cfg.num_iaf_layers) * heads_per_flow
            + deconv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    te_cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu", dropout_inputs=True, use_as_teacher=True,
    )
    teacher = Wavenet(te_cfg)
    te_params = teacher.init_params(jax.random.PRNGKey(1))
    st_cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
        num_samples=100, power_loss_factor=1.0, contrastive_loss_factor=0.3,
    )
    pwn = ParallelWavenet(st_cfg, teacher)
    params = transplant_teacher_deconv(
        pwn.init_params(jax.random.PRNGKey(0)), te_params
    )
    L = st_cfg.wave_length
    rng = np.random.RandomState(0)
    t = np.arange(L) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L),
        -0.99, 0.99,
    ).astype(np.float32)
    wav = jnp.asarray(wav)
    key = jax.random.PRNGKey(0)

    def witness(v):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(v))

    # ---- measured shares ------------------------------------------------
    def grad_of(loss_fn):
        def f(p, w, k):
            loss, grads = jax.value_and_grad(loss_fn)(p, w, k)
            return loss + 0.0 * witness(grads)
        return jax.jit(f)

    def mk_ff(p, w, k):
        mel = stft_ops.melspectrogram(w)
        ff, _ = pwn.feed_forward(p, {"mel": mel}, k)
        ff["mel"] = mel
        ff["wav"] = w
        return ff

    def loss_full(p, w, k):
        ff = mk_ff(p, w, k)
        ff["mel_rand"] = jnp.roll(ff["mel"], 1, axis=0)
        return pwn.calculate_loss(te_params, ff, k)["loss"]

    def loss_kl(p, w, k):
        ff = mk_ff(p, w, k)
        return pwn.kl_loss_logistic(te_params, ff, k, st_cfg.num_samples)[
            "kl_loss"]

    def loss_power(p, w, k):
        ff = mk_ff(p, w, k)
        return pwn.power_loss(ff)["power_loss"]

    def loss_ff_only(p, w, k):
        ff = mk_ff(p, w, k)
        return jnp.mean(jnp.abs(ff["x"]))

    t_full = timeit("full loss fwd+bwd (kl+power+cl)", grad_of(loss_full),
                    params, wav, key, runs=args.runs)
    t_kl = timeit("KL-only fwd+bwd (incl. 2B teacher)", grad_of(loss_kl),
                  params, wav, key, runs=args.runs)
    t_pw = timeit("power-only fwd+bwd (incl. 2x STFT)", grad_of(loss_power),
                  params, wav, key, runs=args.runs)
    t_ff = timeit("student IAF ff-only fwd+bwd", grad_of(loss_ff_only),
                  params, wav, key, runs=args.runs)

    # teacher scoring forward alone (the KL's inner 2B forward), no grad
    x = jax.jit(lambda p, w, k: mk_ff(p, w, k)["x"])(params, wav, key)
    x2 = jnp.concatenate([x, x], 0)
    mel = jax.jit(stft_ops.melspectrogram)(wav)
    mel2 = jnp.concatenate([mel, mel], 0)
    te_fn = jax.jit(lambda tp, xs, m: jnp.mean(teacher.feed_forward(
        tp, {"wav_scaled": xs, "mel": m})[0]["out_params"]))
    t_te2b = timeit("teacher scoring fwd alone (2B)", te_fn, te_params, x2,
                    mel2, runs=args.runs)

    # full step (fwd+bwd+Adam+EMA), pipelined like bench_all
    optimizer = train_lib.make_student_optimizer(st_cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    step = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, optimizer))
    t0 = time.time()
    s1, m1 = step(state, wav, wav, key)
    float(m1["loss"])
    print(f"step compile {time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(args.runs):
        t0 = time.time()
        s1, m1 = step(s1, wav, wav, key)
        float(m1["loss"])
        times.append(time.time() - t0)
    t_step = float(np.median(times)) * 1000
    print(f"{'full train step (fwd+bwd+opt)':42s} {t_step:8.1f} ms",
          file=sys.stderr)

    # ---- analytic MXU floor --------------------------------------------
    te_macs = teacher_macs_per_sample(te_cfg)
    st_macs = student_macs_per_sample(st_cfg)
    # KL path: teacher fwd at 2B + input-grad bwd through the teacher at 2B
    # (weight grads not needed — frozen); input-grad pass ~= one more
    # conv-transpose sweep of the same MAC count.
    kl_macs = 2 * B * L * te_macs * 2
    # student flows: fwd + full bwd (weight grads needed) ~= 3x fwd
    st_train_macs = B * L * st_macs * 3
    # STFT power loss: 2x rfft via DFT matmuls (frame 800, fft 2048, hop
    # 200) fwd + bwd ~= 2x fwd
    n_frames = L // 200
    stft_macs = 2 * B * n_frames * 800 * 1025 * 2 * 2  # re+im, fwd+bwd
    tot_macs = kl_macs + st_train_macs + stft_macs
    floor_ms = 2 * tot_macs / MXU_BF16_FLOPS * 1e3
    print("\n--- analytic accounting (B=%d, L=%d) ---" % (B, L))
    print(f"teacher MACs/sample {te_macs/1e6:.2f}M, student {st_macs/1e6:.2f}M")
    print(f"MXU floor: KL(teacher fwd+input-bwd @2B) "
          f"{2*kl_macs/MXU_BF16_FLOPS*1e3:.1f} ms + student flows(3x fwd) "
          f"{2*st_train_macs/MXU_BF16_FLOPS*1e3:.1f} ms + 2xSTFT fwd+bwd "
          f"{2*stft_macs/MXU_BF16_FLOPS*1e3:.1f} ms = {floor_ms:.1f} ms")
    print(f"measured: full step {t_step:.1f} ms = {t_step/floor_ms:.2f}x "
          f"MXU floor")
    print(f"shares (grad-variant medians): KL {t_kl:.0f} ms "
          f"({t_kl/t_full:.0%} of loss fwd+bwd), power {t_pw:.0f} ms "
          f"({t_pw/t_full:.0%}), student-ff {t_ff:.0f} ms "
          f"({t_ff/t_full:.0%}); teacher 2B fwd alone {t_te2b:.0f} ms")
    print(f"(shares overlap — each variant re-runs the student ff; "
          f"KL-minus-ff {t_kl - t_ff:.0f} ms is the teacher-scoring "
          f"fwd+bwd increment, power-minus-ff {t_pw - t_ff:.0f} ms the "
          f"STFT increment)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
