"""A/B the student distillation step's flow-trunk dtype (compute_dtype
float32 vs bfloat16) in ONE process, so tunnel-RTT / compile-service
variance between sessions cannot confound the comparison.  Also prints the
measured host round-trip time first (benchmarks/misc_sweep.py rtt).

Usage: python benchmarks/ab_student_dtype.py [runs]
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
from nsynth_wavenet_tpu.training import train_lib
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def measure_rtt(runs=20):
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))
    t0 = time.time()
    for _ in range(runs):
        np.asarray(f(x))
    return (time.time() - t0) / runs * 1000


def bench_step(compute_dtype, runs):
    te_cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu", dropout_inputs=True, use_as_teacher=True,
    )
    teacher = Wavenet(te_cfg)
    te_params = teacher.init_params(jax.random.PRNGKey(1))
    st_cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
        num_samples=100, power_loss_factor=1.0, contrastive_loss_factor=0.3,
        compute_dtype=compute_dtype,
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
    times = []
    for _ in range(runs):
        t0 = time.time()
        state, metrics = step(state, wav, wav, key)
        float(metrics["loss"])
        times.append(time.time() - t0)
    med = float(np.median(times)) * 1000
    print(
        f"student[{compute_dtype}]: median {med:.1f} ms/step "
        f"(mean {np.mean(times)*1e3:.1f}, min {np.min(times)*1e3:.1f}) "
        f"= {B / np.median(times):.1f} utt/s; compile {compile_s:.0f}s "
        f"loss {float(metrics['loss']):.3f}",
        file=sys.stderr,
    )
    return med


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"rtt: {measure_rtt():.1f} ms", file=sys.stderr)
    f32 = bench_step("float32", runs)
    bf16 = bench_step("bfloat16", runs)
    print(f"bf16/f32 step ratio: {bf16 / f32:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
