"""Full benchmark suite (BASELINE.md surface): AR synthesis (XLA scan vs
Pallas bf16/int8), one-shot IAF synthesis Delay, and teacher/student
training throughput.  Run manually on hardware; the driver-facing headline
lives in bench.py.

Timing protocol: every timed step forces a host fetch of a scalar that
depends on the full computation — no dispatch-only illusions.

Usage: python benchmarks/bench_all.py [--quick]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import sys
import time

import numpy as np

from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()  # compile_s reflects a cache hit on repeat runs


def _wav_mel(B, L, seed=0):
    from nsynth_wavenet_tpu.ops import stft

    rng = np.random.RandomState(seed)
    t = np.arange(L) / 16000.0
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, L), -0.99, 0.99
    ).astype(np.float32)
    return wav, stft.melspectrogram_np(wav)


def bench_ar(results, quick):
    import jax
    import jax.numpy as jnp

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.models.wavenet import Wavenet

    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False, upsample_act="leaky_relu"
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    B, L = (32, 4000) if quick else (128, 16000)
    wav, mel = _wav_mel(B, L)
    gen_len = (mel.shape[1] - 1) * 200

    paths = {
        "ar_xla_scan": jax.jit(
            lambda p, m, s: fg.generate(p, m, jax.random.PRNGKey(s), length=gen_len,
                                        precompute_cond=False)
        ),
        "ar_pallas_bf16": jax.jit(lambda p, m, s: fg.generate_pallas(p, m, s, length=gen_len)),
        "ar_pallas_int8": jax.jit(
            lambda p, m, s: fg.generate_pallas(
                p, m, s, length=gen_len, weight_dtype=jnp.int8
            )
        ),
    }
    for name, fn in paths.items():
        try:
            t0 = time.time()
            out = np.asarray(fn(params, mel, 1))
            compile_s = time.time() - t0
            assert np.isfinite(out).all()
            t0 = time.time()
            runs = 3
            for i in range(runs):
                out = np.asarray(fn(params, mel, i + 2))
            dt = (time.time() - t0) / runs
            results[name] = {
                "audio_sec_per_s_per_chip": round(B * gen_len / 16000.0 / dt, 2),
                "samples_per_s": round(B * gen_len / dt),
                "batch": B,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(f"{name}: {results[name]}", file=sys.stderr)


def bench_iaf(results, quick):
    """One-shot IAF student serving, XLA and fused-Pallas paths, with the
    XLA path doubling as the interleaved same-session anchor (round-3
    VERDICT #3: make student serving a tracked scoreboard metric with the
    same anchor-ratio discipline as the AR headline).  Scalar-witness
    timing — fetching the audio batch would time the debug tunnel."""
    import jax
    import jax.numpy as jnp

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models import parallelgen
    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu"
    )
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))
    B, L = (8, 16000) if quick else (16, 64000)
    wav, mel = _wav_mel(B, L)
    mel = np.asarray(mel)

    fns = {
        "iaf_parallel_gen": jax.jit(
            lambda p, m, r: jnp.mean(jnp.abs(parallelgen.synthesize(pwn, p, m, r)))
        ),
        "iaf_parallel_gen_pallas": jax.jit(
            lambda p, m, r: jnp.mean(
                jnp.abs(parallelgen.synthesize_pallas(pwn, p, m, r))
            )
        ),
    }
    timed, compiles = {n: [] for n in fns}, {}
    utt_len = None
    for name, fn in fns.items():
        t0 = time.time()
        w = float(np.asarray(fn(params, mel, jax.random.PRNGKey(0))))
        compiles[name] = time.time() - t0
        assert np.isfinite(w)
    utt_len = pwn.sample_length(mel.shape[1])
    runs = 3 if quick else 5
    for i in range(runs):
        for name, fn in fns.items():  # interleaved: shared weather
            t0 = time.time()
            np.asarray(fn(params, mel, jax.random.PRNGKey(i)))
            timed[name].append(time.time() - t0)
    audio_sec = B * utt_len / 16000.0
    meds = {n: float(np.median(t)) for n, t in timed.items()}
    for name in fns:
        results[name] = {
            "audio_sec_per_s_per_chip": round(audio_sec / meds[name], 1),
            "delay": round(meds[name] / audio_sec, 5),  # parallelgen.py:46-50
            "batch": B,
            "utterance_sec": round(utt_len / 16000.0, 2),
            "compile_s": round(compiles[name], 1),
        }
    results["iaf_parallel_gen_pallas"]["ratio_vs_xla_anchor"] = round(
        meds["iaf_parallel_gen"] / meds["iaf_parallel_gen_pallas"], 2
    )
    for name in fns:
        print(f"{name}: {results[name]}", file=sys.stderr)


def bench_delay(results, quick):
    """Per-utterance latency ("Delay", the reference's own built-in metric:
    wall-clock / audio-seconds, wavenet/parallelgen.py:46-50) at B=1 and
    B=8 — the interactive-vocoding case the throughput rows (B>=16) hide.

    AR kernel note: the fastgen kernel requires batch % 8 == 0, so the B=1
    row runs the B=8 program with one real utterance (7 rows synthesize
    unused audio).  That IS the single-request latency this engine
    delivers — per-sample serialization means the wasted rows ride the
    same dependency chain, not extra wall-clock.  Student B=1 runs the
    flow kernel with b_tile == batch == 1 (the kernel's whole-batch rule).
    Scalar-witness timing; medians of `runs` reps.
    """
    import jax
    import jax.numpy as jnp

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models import parallelgen
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
    from nsynth_wavenet_tpu.models.wavenet import Wavenet

    sec = 1.0 if quick else 4.0
    L = int(16000 * sec)
    runs = 3 if quick else 5

    # ---- AR teacher (bf16 + W8A8 static) ----
    te_cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu",
    )
    teacher = Wavenet(te_cfg)
    te_params = teacher.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(teacher)
    wav8, mel8 = _wav_mel(8, L)
    gen_len = (mel8.shape[1] - 1) * 200
    amax = jax.jit(fg.calibrate_act_amax)(
        te_params, jnp.asarray(wav8), jnp.asarray(mel8)
    )

    def ar_arm(name, use_amax=False, **kw):
        # batch 8 is the kernel minimum, so B=1 and B=8 run the SAME
        # program — one measurement, two rows (B=1: one real request,
        # 7 wasted rows; per-sample serialization means the wasted rows
        # ride the same dependency chain, not extra wall-clock)
        fn = jax.jit(lambda p, m, s, am: (lambda a: jnp.mean(jnp.abs(a)))(
            fg.generate_pallas(
                p, m, s, length=gen_len,
                act_amax=am if use_amax else None, **kw)))
        key = f"delay_{name}_B1"
        try:
            t0 = time.time()
            w = float(np.asarray(fn(te_params, mel8, 1, amax)))
            compile_s = time.time() - t0
            assert np.isfinite(w)
            times = []
            for i in range(runs):
                t0 = time.time()
                np.asarray(fn(te_params, mel8, i + 2, amax))
                times.append(time.time() - t0)
            med = float(np.median(times))
            audio_sec = gen_len / 16000.0  # ONE utterance
            results[key] = {
                "delay": round(med / audio_sec, 4),
                "realtime_factor": round(audio_sec / med, 3),
                "batch_padded_to": 8,
                "utterance_sec": round(audio_sec, 2),
                "compile_s": round(compile_s, 1),
            }
            results[f"delay_{name}_B8"] = dict(
                results[key],
                note="same program; 8 concurrent utterances per call",
            )
        except Exception as e:
            results[key] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(f"{key}: {results[key]}", file=sys.stderr)

    ar_arm("ar_int8s", use_amax=True, weight_dtype=jnp.int8, gate_static=True)
    ar_arm("ar_bf16", weight_dtype=jnp.bfloat16)

    # ---- student one-shot (fused kernel) + streaming ----
    st_cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", use_share_deconv=True, upsample_act="leaky_relu",
    )
    pwn = ParallelWavenet(st_cfg)
    st_params = pwn.init_params(jax.random.PRNGKey(0))
    for B in (1, 8):
        wav, mel = _wav_mel(B, L)
        mel = jnp.asarray(mel)
        utt_sec = pwn.sample_length(mel.shape[1]) / 16000.0
        fn = jax.jit(lambda p, m, r: jnp.mean(jnp.abs(
            parallelgen.synthesize_pallas(pwn, p, m, r))))
        key = f"delay_student_oneshot_B{B}"
        try:
            t0 = time.time()
            w = float(np.asarray(fn(st_params, mel, jax.random.PRNGKey(0))))
            compile_s = time.time() - t0
            assert np.isfinite(w)
            times = []
            for i in range(runs):
                t0 = time.time()
                np.asarray(fn(st_params, mel, jax.random.PRNGKey(i)))
                times.append(time.time() - t0)
            med = float(np.median(times))
            results[key] = {
                "delay": round(med / utt_sec, 4),
                "realtime_factor": round(utt_sec / med, 3),
                "batch": B,
                "utterance_sec": round(utt_sec, 2),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            results[key] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(f"{key}: {results[key]}", file=sys.stderr)

        key = f"delay_student_streaming_B{B}"
        try:
            st = parallelgen.StudentStreamer(pwn, chunk=16384)
            t0 = time.time()
            a = st.synthesize(st_params, mel, jax.random.PRNGKey(0))
            compile_s = time.time() - t0
            assert np.isfinite(a).all()
            times = []
            for i in range(runs):
                t0 = time.time()
                st.synthesize(st_params, mel, jax.random.PRNGKey(i))
                times.append(time.time() - t0)
            med = float(np.median(times))
            results[key] = {
                "delay": round(med / utt_sec, 4),
                "realtime_factor": round(utt_sec / med, 3),
                "batch": B,
                "utterance_sec": round(utt_sec, 2),
                "chunk": 16384,
                "compile_s": round(compile_s, 1),
                "note": "incl. the tunnel audio fetch (streamer returns np)",
            }
        except Exception as e:
            results[key] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(f"{key}: {results[key]}", file=sys.stderr)


def bench_teacher_train(results, quick):
    import jax

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
    from nsynth_wavenet_tpu.training import optimizer as opt_lib, train_lib

    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu", dropout_inputs=True,
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
    state = train_lib.make_train_state(params, optimizer)
    B = 4 if quick else 8
    mesh = mesh_lib.data_mesh_for_batch(B)
    state = mesh_lib.shard_train_state(state, mesh)
    bs = mesh_lib.batch_sharding(mesh)
    step = train_lib.jit_train_step(train_lib.make_wavenet_train_step(model, optimizer), bs)
    wav, _ = _wav_mel(B, cfg.wave_length)
    wav = jax.device_put(wav, bs)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step(state, wav, key)
    float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    runs = 5 if quick else 20
    for _ in range(runs):
        state, metrics = step(state, wav, key)
        float(metrics["loss"])  # force the full chain to complete each step
    dt = (time.time() - t0) / runs
    # pipelined protocol: chain steps on device, fetch once at the end —
    # how the training loop actually runs (metrics fetched every LOG_EVERY);
    # removes the tunnel's ~27 ms dispatch+fetch RTT from every step
    t0 = time.time()
    for _ in range(runs):
        state, metrics = step(state, wav, key)
    float(metrics["loss"])
    dtp = (time.time() - t0) / runs
    results["teacher_train"] = {
        "utterances_per_s_per_chip": round(B / dt, 1),
        "ms_per_step": round(dt * 1000, 1),
        "utterances_per_s_per_chip_pipelined": round(B / dtp, 1),
        "ms_per_step_pipelined": round(dtp * 1000, 1),
        "batch": B,
        "compile_s": round(compile_s, 1),
    }
    print(f"teacher_train: {results['teacher_train']}", file=sys.stderr)


def bench_student_train(results, quick):
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
    params = transplant_teacher_deconv(pwn.init_params(jax.random.PRNGKey(0)), te_params)
    optimizer = train_lib.make_student_optimizer(st_cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    # per-chip batch 8 is 1.44x more utt/s/chip than 4 (interleaved A/B,
    # benchmarks/batch_sweep_train.py --ab); 16 regresses
    B = 4 if quick else 8
    mesh = mesh_lib.data_mesh_for_batch(B)
    state = mesh_lib.shard_train_state(state, mesh, spec_fn=lambda p: mesh_lib.P())
    bs = mesh_lib.batch_sharding(mesh)
    te_rep = mesh_lib.replicate_tree(te_params, mesh)
    step = train_lib.jit_pwn_train_step(
        train_lib.make_pwn_train_step(pwn, te_rep, optimizer), bs
    )
    wav, _ = _wav_mel(B, st_cfg.wave_length)
    wav = jax.device_put(wav, bs)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step(state, wav, wav, key)
    float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    runs = 5 if quick else 10
    for _ in range(runs):
        state, metrics = step(state, wav, wav, key)
        float(metrics["loss"])
    dt = (time.time() - t0) / runs
    # pipelined protocol (see bench_teacher_train)
    t0 = time.time()
    for _ in range(runs):
        state, metrics = step(state, wav, wav, key)
    float(metrics["loss"])
    dtp = (time.time() - t0) / runs
    results["student_train"] = {
        "utterances_per_s_per_chip": round(B / dt, 1),
        "ms_per_step": round(dt * 1000, 1),
        "utterances_per_s_per_chip_pipelined": round(B / dtp, 1),
        "ms_per_step_pipelined": round(dtp * 1000, 1),
        "batch": B,
        "compile_s": round(compile_s, 1),
    }
    print(f"student_train: {results['student_train']}", file=sys.stderr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="",
                    help="comma list: ar,iaf,delay,teacher,student")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    results = {}
    if only is None or "ar" in only:
        bench_ar(results, args.quick)
    if only is None or "iaf" in only:
        bench_iaf(results, args.quick)
    if only is None or "delay" in only:
        bench_delay(results, args.quick)
    if only is None or "teacher" in only:
        bench_teacher_train(results, args.quick)
    if only is None or "student" in only:
        bench_student_train(results, args.quick)
    print(json.dumps(results, indent=2))
