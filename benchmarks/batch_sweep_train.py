"""Per-chip batch-size sweep for the FULL fused training steps.

Training throughput was only ever recorded at the reference-like per-chip
batches (teacher B=8, student B=4 — reference Readme.md:22-26 runs total
batch 28 over 4 GPUs).  But utterances/s/chip is the metric that matters
(BASELINE.json), and the step has fixed costs (dispatch, optimizer/EMA
param traffic, mel frontend) that a larger per-chip batch amortizes — while
the HBM-bound activation stream scales linearly.  This sweep measures the
full step (mel -> fwd -> grad -> Adam -> EMA) across batch sizes in ONE
process (so backend drift cannot fake a trend; see RESULTS.md "Variance"),
pipelined protocol.

Usage: python benchmarks/batch_sweep_train.py [--teacher 8,16,32,64]
           [--student 4,8,16] [--runs 20]
       python benchmarks/batch_sweep_train.py --teacher '' --student 4,8 \
           --ab --rounds 6   # interleaved A/B (alternating chunks, median)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _wav(B, L, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(L) / 16000.0
    return np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L), -0.99, 0.99
    ).astype(np.float32)


def _time_pipelined(step_fn, state, args, runs):
    import jax

    t0 = time.time()
    state2, metrics = step_fn(state, *args)
    float(metrics["loss"])
    compile_s = time.time() - t0
    # pipelined: chain steps, fetch once (training-loop protocol)
    t0 = time.time()
    st = state2
    for _ in range(runs):
        st, metrics = step_fn(st, *args)
    float(metrics["loss"])
    dtp = (time.time() - t0) / runs
    del st, state2
    return dtp, compile_s


REMAT = False  # set via --remat: per-layer jax.checkpoint in the teacher


def _build_teacher(B):
    import jax

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
    from nsynth_wavenet_tpu.training import optimizer as opt_lib, train_lib

    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu", dropout_inputs=True, remat=REMAT,
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
    state = train_lib.make_train_state(params, optimizer)
    mesh = mesh_lib.data_mesh_for_batch(B)
    state = mesh_lib.shard_train_state(state, mesh)
    bs = mesh_lib.batch_sharding(mesh)
    step = train_lib.jit_train_step(
        train_lib.make_wavenet_train_step(model, optimizer), bs
    )
    wav = jax.device_put(_wav(B, cfg.wave_length), bs)
    return step, state, (wav, jax.random.PRNGKey(0))


def _build_student(B):
    import jax

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.parallel_wavenet import (
        ParallelWavenet, transplant_teacher_deconv,
    )
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
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
    params = transplant_teacher_deconv(
        pwn.init_params(jax.random.PRNGKey(0)), te_params
    )
    optimizer = train_lib.make_student_optimizer(st_cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    mesh = mesh_lib.data_mesh_for_batch(B)
    state = mesh_lib.shard_train_state(state, mesh, spec_fn=lambda p: mesh_lib.P())
    bs = mesh_lib.batch_sharding(mesh)
    te_rep = mesh_lib.replicate_tree(te_params, mesh)
    step = train_lib.jit_pwn_train_step(
        train_lib.make_pwn_train_step(pwn, te_rep, optimizer), bs
    )
    wav = jax.device_put(_wav(B, st_cfg.wave_length), bs)
    return step, state, (wav, wav, jax.random.PRNGKey(0))


def sweep(name, build, batches, runs):
    out = {}
    for B in batches:
        try:
            step, state, args = build(B)
            dtp, compile_s = _time_pipelined(step, state, args, runs)
        except Exception as e:  # OOM at large B is an expected outcome
            print(f"{name} B={B}: FAILED ({type(e).__name__})", file=sys.stderr)
            out[B] = None
            continue
        out[B] = dict(
            ms_per_step=round(dtp * 1000, 1),
            utt_per_s_per_chip=round(B / dtp, 1),
            compile_s=round(compile_s, 1),
        )
        print(f"{name} B={B}: {out[B]}", file=sys.stderr)
        del step, state, args
    return out


def ab_sweep(name, build, batches, rounds, chunk):
    """Interleaved A/B: alternate timed chunks between the batch sizes so
    backend drift (RESULTS.md 'Variance') hits all variants equally; report
    the per-variant median chunk time."""
    built = {}
    for B in batches:
        step, state, args = build(B)
        dtp, compile_s = _time_pipelined(step, state, args, 2)  # warm
        built[B] = [step, state, args]
        print(f"{name} B={B}: compiled ({compile_s:.1f}s), warm "
              f"{dtp * 1000:.1f} ms", file=sys.stderr)
    times = {B: [] for B in batches}
    for r in range(rounds):
        for B in batches:
            step, state, args = built[B]
            t0 = time.time()
            st = state
            for _ in range(chunk):
                st, metrics = step(st, *args)
            float(metrics["loss"])
            dt = (time.time() - t0) / chunk
            times[B].append(dt)
            print(f"{name} round {r} B={B}: {dt * 1000:.1f} ms/step",
                  file=sys.stderr)
    out = {}
    for B in batches:
        med = float(np.median(times[B]))
        out[B] = dict(
            ms_per_step_median=round(med * 1000, 1),
            utt_per_s_per_chip=round(B / med, 1),
            all_ms=[round(t * 1000, 1) for t in times[B]],
        )
        print(f"{name} B={B} median: {out[B]['ms_per_step_median']} ms "
              f"({out[B]['utt_per_s_per_chip']} utt/s/chip)", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", default="8,16,32,64")
    ap.add_argument("--student", default="4,8,16")
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--ab", action="store_true")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--remat", action="store_true",
                    help="teacher per-layer remat (cfg.remat)")
    args = ap.parse_args()
    global REMAT
    REMAT = args.remat

    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    results = {}
    for name, build, spec in (
        ("teacher", _build_teacher, args.teacher),
        ("student", _build_student, args.student),
    ):
        if not spec:
            continue
        batches = [int(b) for b in spec.split(",")]
        if args.ab:
            results[name] = ab_sweep(name, build, batches, args.rounds, args.chunk)
        else:
            results[name] = sweep(name, build, batches, args.runs)
    print(results)


if __name__ == "__main__":
    main()
