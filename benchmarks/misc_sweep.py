"""Misc TPU measurements: host-fetch RTT floor, IAF one-shot batch scaling,
student distillation step at batch 8.

Usage: python benchmarks/misc_sweep.py [rtt] [iaf] [student]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np


def _wav_mel(B, L, seed=0):
    from nsynth_wavenet_tpu.ops import stft

    rng = np.random.RandomState(seed)
    t = np.arange(L) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L), -0.99, 0.99
    ).astype(np.float32)
    return wav, stft.melspectrogram_np(wav)


def bench_rtt():
    """Round-trip floor: dispatch + fetch of a trivial jitted computation.
    Every number in RESULTS.md includes one of these per timed iteration."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(f(x))
    for trial in range(3):
        t0 = time.time()
        runs = 20
        for _ in range(runs):
            np.asarray(f(x))
        dt = (time.time() - t0) / runs * 1000
        print(f"rtt trial {trial}: {dt:.1f} ms", file=sys.stderr)


def bench_iaf():
    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models import parallelgen
    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu"
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))
    synth = parallelgen.jit_synthesize(pwn)
    for B in (16, 32, 64):
        wav, mel = _wav_mel(B, 64000)
        t0 = time.time()
        out = np.asarray(synth(params, mel, jax.random.PRNGKey(0)))
        compile_s = time.time() - t0
        t0 = time.time()
        runs = 5
        for i in range(runs):
            out = np.asarray(synth(params, mel, jax.random.PRNGKey(i)))
        dt = (time.time() - t0) / runs
        audio_sec = out.shape[0] * out.shape[1] / 16000.0
        print(
            f"iaf B={B}: {audio_sec / dt:.1f} audio-sec/s/chip "
            f"(delay {dt / audio_sec:.5f}, compile {compile_s:.0f}s)",
            file=sys.stderr,
        )




def bench_student(B):

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.parallel_wavenet import (
        ParallelWavenet, transplant_teacher_deconv,
    )
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.training import train_lib

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
    optimizer = train_lib.make_student_optimizer(st_cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    wav, _ = _wav_mel(B, st_cfg.wave_length)
    step = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, optimizer))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step(state, wav, wav, key)
    float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    runs = 10
    for _ in range(runs):
        state, metrics = step(state, wav, wav, key)
        float(metrics["loss"])
    dt = (time.time() - t0) / runs * 1000
    print(
        f"student B={B}: {dt:.1f} ms/step ({B / dt * 1000:.1f} utt/s/chip, "
        f"compile {compile_s:.0f}s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    what = sys.argv[1:] or ["rtt", "iaf", "student"]
    if "rtt" in what:
        bench_rtt()
    if "iaf" in what:
        bench_iaf()
    if "student" in what:
        for B in (8,):
            bench_student(B)
