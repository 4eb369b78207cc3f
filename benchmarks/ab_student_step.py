"""A/B the student distillation step: fused KL+contrastive teacher pass
(current code) vs remat on/off.  Prints ms/step for each variant."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.parallel_wavenet import (
    ParallelWavenet, transplant_teacher_deconv,
)
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft as stft_ops
from nsynth_wavenet_tpu.training import train_lib


def bench_step(remat, runs=10):
    te_cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu", dropout_inputs=True, use_as_teacher=True,
    )
    teacher = Wavenet(te_cfg)
    te_params = teacher.init_params(jax.random.PRNGKey(1))
    st_cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
        num_samples=100, power_loss_factor=1.0, contrastive_loss_factor=0.3,
        remat_teacher=remat,
    )
    pwn = ParallelWavenet(st_cfg, teacher)
    params = transplant_teacher_deconv(pwn.init_params(jax.random.PRNGKey(0)), te_params)
    optimizer = train_lib.make_student_optimizer(st_cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    B = 4
    rng = np.random.RandomState(0)
    t = np.arange(st_cfg.wave_length) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, st_cfg.wave_length),
        -0.99, 0.99,
    ).astype(np.float32)
    step = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, optimizer))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step(state, wav, wav, key)
    float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(runs):
        state, metrics = step(state, wav, wav, key)
        float(metrics["loss"])
    dt = (time.time() - t0) / runs * 1000
    print(
        f"remat={remat}: {dt:.1f} ms/step ({B / dt * 1000:.1f} utt/s) "
        f"compile {compile_s:.0f}s loss {float(metrics['loss']):.3f}",
        file=sys.stderr,
    )
    return dt


if __name__ == "__main__":
    variants = sys.argv[1:] or ["true", "false"]
    for v in variants:
        bench_step(v == "true")
