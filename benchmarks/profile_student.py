"""Scratch: decompose the student distillation step cost on TPU.

Times (fwd-only, jitted, host-fetch forced):
  student feed_forward | teacher scoring fwd | kl fwd | power fwd |
  full loss fwd | full step (fwd+bwd+opt)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.parallel_wavenet import (
    ParallelWavenet, transplant_teacher_deconv,
)
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft as stft_ops
from nsynth_wavenet_tpu.training import train_lib


def _fetch(out):
    """Force completion via host fetch (block_until_ready is unreliable on
    the tunneled axon backend — see bench_all.py timing protocol)."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1].sum())


def timeit(name, fn, *args, runs=10):
    t0 = time.time()
    _fetch(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(runs):
        _fetch(fn(*args))
    dt = (time.time() - t0) / runs * 1000
    print(f"{name:36s} {dt:8.1f} ms   (compile {compile_s:.1f}s)", file=sys.stderr)
    return dt


def main():
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
    params = transplant_teacher_deconv(pwn.init_params(jax.random.PRNGKey(0)), te_params)

    B = 4
    rng = np.random.RandomState(0)
    t = np.arange(st_cfg.wave_length) / 16000.0
    wav = np.clip(0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, st_cfg.wave_length), -0.99, 0.99).astype(np.float32)
    mel = jnp.asarray(stft_ops.melspectrogram_np(wav))
    wav = jnp.asarray(wav)
    key = jax.random.PRNGKey(0)

    # student feed_forward alone
    ff_fn = jax.jit(lambda p, m, k: pwn.feed_forward(p, {"mel": m}, k)[0]["x"])
    timeit("student feed_forward fwd", ff_fn, params, mel, key)

    # teacher scoring fwd at B and 2B
    x = ff_fn(params, mel, key)
    te_fn = jax.jit(lambda tp, xs, m: teacher.feed_forward(tp, {"wav_scaled": xs, "mel": m})[0]["out_params"])
    timeit("teacher scoring fwd (B)", te_fn, te_params, x, mel)
    x2 = jnp.concatenate([x, x], 0)
    mel2 = jnp.concatenate([mel, mel], 0)
    timeit("teacher scoring fwd (2B)", te_fn, te_params, x2, mel2)

    # kl fwd (teacher + MoL broadcast)
    def kl_fwd(p, w, m, k):
        ff, _ = pwn.feed_forward(p, {"mel": m}, k)
        ff["mel"] = m
        ff["wav"] = w
        return pwn.kl_loss_logistic(te_params, ff, k, st_cfg.num_samples)["kl_loss"]

    timeit("student ff + kl fwd", jax.jit(kl_fwd), params, wav, mel, key)

    # power loss fwd
    def pw_fwd(p, w, m, k):
        ff, _ = pwn.feed_forward(p, {"mel": m}, k)
        ff["mel"] = m
        ff["wav"] = w
        return pwn.power_loss(ff)["power_loss"]

    timeit("student ff + power fwd", jax.jit(pw_fwd), params, wav, mel, key)

    # full loss fwd
    def loss_fwd(p, w, m, k):
        ff, _ = pwn.feed_forward(p, {"mel": m}, k)
        ff["mel"] = m
        ff["wav"] = w
        ff["mel_rand"] = jnp.roll(m, 1, axis=0)
        return pwn.calculate_loss(te_params, ff, k)["loss"]

    timeit("full loss fwd", jax.jit(loss_fwd), params, wav, mel, key)

    # full loss fwd+bwd (single scalar output forces the whole program)
    def loss_and_gradsum(p, w, m, k):
        loss, grads = jax.value_and_grad(loss_fwd)(p, w, m, k)
        gs = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gs

    timeit("full loss fwd+bwd", jax.jit(loss_and_gradsum), params, wav, mel, key, runs=5)

    # full train step
    optimizer = train_lib.make_student_optimizer(st_cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    step = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, optimizer))

    def run_step(s, w, k):
        ns, m_ = step(s, w, w, k)
        return m_["loss"]

    timeit("full train step", run_step, state, wav, key, runs=5)


if __name__ == "__main__":
    main()
