"""Benchmark harness.

Headline metric: **fastgen AR synthesis throughput** in generated
audio-seconds per wall-second per chip on the full-size MoL teacher — the
component the reference bottlenecks hardest (1 session.run + 2 host
transfers per audio sample, reference wavenet/fastgen.py:156-168; ~16,000
host round trips per generated second).  Here the whole utterance is one
XLA program, so the number measures the hardware, not the Python loop.

Weather-robust protocol (round-3): the tunneled backend's throughput
swings up to ~35% on an hour scale (benchmarks/RESULTS.md "Variance"), so
a single-mode timing is not a headline.  This harness times the shipped
serving mode (Pallas W8A8 v4: int8 weights + calibrated static activation
scales + static gate scale) INTERLEAVED rep-by-rep with a fixed anchor
program (the Pallas bf16 kernel, unchanged since round 1) and reports the
median of each plus their ratio — the ratio is stable across weather
windows and pins the shipped mode's speed to a known quantity.  Medians
(not means) absorb the backend's multi-second load spikes.

Timed quantity (round-3 fix): each rep forces the FULL synthesis by
fetching a scalar mean computed from the whole audio batch inside the
jitted program — the 32 MB f32 audio batch itself stays on device during
timing.  A device profile showed the old full-batch fetch was measuring
the debug TUNNEL, not the chip: kernel device time 142 us/step while the
wall clock swung 197-427 us/step with tunnel load (the entire round-2
"headline regression" was transfer weather).  Production serving egresses
audio over PCIe/DCN at GB/s, not a tunnel; round 5 dropped even the
one-off full fetch (BENCH_r04 paid 544 s of tunnel for it) — the
finiteness gate is a device-side scalar reduce plus a 1 s / 4-row audio
slice fetch, timed and reported as fetch_s_full.

vs_baseline is the real-time factor (1.0 == real-time 16 kHz synthesis),
the unit the reference's own "Delay" metric implies
(wavenet/parallelgen.py:46-50: delay = wall / audio-sec; we report 1/delay).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} —
extra keys carry the anchor median, the shipped/anchor ratio, and both
compile times.  Extra context goes to stderr.

Set BENCH_SKIP_ANCHOR=1 to time only the shipped mode (quick checks).
"""

import json
import os
import sys
import time

import numpy as np

SR = 16000
# measured optimum (benchmarks/batch_sweep_ar.py int8s): round-3 shipped
# B=640; round-4 raised the kernel's scoped-VMEM limit (the B=768+
# "spill" was the 16 MB default, not physical VMEM), unlocking B=896 at
# +4.4% throughput over 640 in an interleaved A/B (251.8 vs 241.2
# audio-sec/s; B=1024 still fails to compile)
BATCH = 896
REPS = 5


# JSON protocol tag: bumped whenever the timed quantity changes, so
# round-over-round BENCH_r*.json values are only compared within one
# protocol.  v1 = full-audio fetch (rounds 1-2, tunnel-dominated);
# v2 = scalar witness + interleaved bf16 anchor (round 3 on).
PROTOCOL = "scalar-witness-v2"


def main():
    import jax

    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

    # BENCH_CACHE_DIR: tools/warm_bench_cache.py points this at a fresh dir
    # to collect exactly the entries bench.py needs for the committed warm
    # cache
    enable_persistent_cache(os.environ.get("BENCH_CACHE_DIR"))

    import jax.numpy as jnp

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.ops import stft

    cfg = config_lib.WavenetConfig(
        loss_type="mol",
        use_mu_law=False,
        double_gate_width=False,
        upsample_act="leaky_relu",
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)

    rng = np.random.RandomState(0)
    t = np.arange(SR) / SR
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(BATCH, SR),
        -0.99,
        0.99,
    ).astype(np.float32)
    mel = stft.melspectrogram_np(wav)
    gen_len = (mel.shape[1] - 1) * 200  # trim partial last frame

    # ---- shipped mode: Pallas W8A8 v4 (int8 + static act/gate scales) ----
    # quality-validated on trained weights: teacher-forced parity
    # (benchmarks/tpu_kernel_parity.py), golden free-run mel corr, and the
    # speech-corpus conditioning-tracking gate (tools/quality_smoke.py
    # --corpus speech --compare_pallas).  Falls back to the XLA lax.scan
    # path if the Pallas compile fails.
    t0 = time.time()
    shipped_name = "pallas W8A8 v4 (static act+gate scales)"
    try:
        amax = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(wav[:8]), jnp.asarray(mel[:8])
        )

        # amax is passed as an ARGUMENT (not closure-captured): a captured
        # array embeds as an HLO constant, making the persistent-cache key
        # depend on its exact bits — measured to miss across processes.  As
        # a traced arg the key depends only on shape/dtype.
        def _shipped(p, m, s, am):
            audio = fg.generate_pallas(
                p, m, s, length=gen_len, weight_dtype=jnp.int8, act_amax=am,
                gate_static=True,
            )
            # scalar witness: depends on every sample, so fetching it forces
            # the full synthesis without shipping 32 MB through the tunnel.
            # The finiteness gate and a 1 s / 4-row audio slice ride the SAME
            # program — a separate jit for them would pay a fresh remote
            # compile (measured 459 s of "fetch" that was really compile).
            return (
                audio[:4, : min(SR, gen_len)],
                jnp.mean(jnp.abs(audio)),
                jnp.isfinite(audio).all(),
            )

        gen_shipped = jax.jit(_shipped)
        gen = lambda p, m, s: gen_shipped(p, m, s, amax)
        out_dev = gen(params, mel, 1)
        jax.block_until_ready(out_dev)
    except Exception as e:  # backend-specific pallas failure
        print(f"pallas path failed ({type(e).__name__}); XLA scan fallback",
              file=sys.stderr)
        shipped_name = "XLA lax.scan fallback"

        def _fallback(p, m, s):
            audio = fg.generate(
                p, m, jax.random.PRNGKey(s), length=gen_len, precompute_cond=False
            )
            return (
                audio[:4, : min(SR, gen_len)],
                jnp.mean(jnp.abs(audio)),
                jnp.isfinite(audio).all(),
            )

        gen = jax.jit(_fallback)
        out_dev = gen(params, mel, 1)
        jax.block_until_ready(out_dev)
    compile_shipped = time.time() - t0
    # first-execution warmup, attributed separately: block_until_ready is
    # unreliable on this tunneled backend, so the compile timer above may
    # return before the first run actually executes; forcing the witness
    # here absorbs program load + first execution (measured 73-758 s
    # depending on tunnel weather / host CPU contention) so fetch_s_full
    # below measures ONLY the host fetch.
    t0 = time.time()
    first_witness = float(np.asarray(out_dev[1]))
    warmup_s = time.time() - t0
    assert np.isfinite(first_witness)
    # finiteness gate WITHOUT the 32 MB tunnel fetch (round-4 VERDICT #8:
    # BENCH_r04 spent 544 s shipping the full audio batch through the debug
    # tunnel for a check the device does in-program): fetch the device-side
    # finiteness scalar + the 1 s / 4-row slice the shipped program returns.
    t0 = time.time()
    out_slice = np.asarray(out_dev[0])
    finite = bool(np.asarray(out_dev[2]))
    fetch_s_full = time.time() - t0
    assert finite
    assert np.isfinite(out_slice).all() and np.abs(out_slice).max() <= 1.0
    print(f"shipped path: {shipped_name}; compile+first dispatch: "
          f"{compile_shipped:.1f}s; first-exec warmup {warmup_s:.1f}s; "
          f"finiteness scalar + 1s slice fetch: {fetch_s_full:.2f}s "
          f"(full 32MB fetch eliminated, round-5)", file=sys.stderr)

    # ---- anchor: Pallas bf16 kernel (fixed since round 1) ----
    # the anchor is a FIXED reference program — pallas bf16 at B=512 (the
    # bf16 kernel exceeds VMEM at the shipped B=640) — so its absolute
    # time tracks backend weather and the shipped/anchor ratio stays
    # comparable across rounds regardless of the shipped batch
    ANCHOR_BATCH = 512
    mel_anchor = mel[:ANCHOR_BATCH]
    anchor_gen = None
    compile_anchor = None
    if not os.environ.get("BENCH_SKIP_ANCHOR") and "fallback" not in shipped_name:
        t0 = time.time()
        try:

            def _anchor(p, m, s):
                audio = fg.generate_pallas(
                    p, m, s, length=gen_len, weight_dtype=jnp.bfloat16
                )
                return jnp.mean(jnp.abs(audio))

            anchor_gen = jax.jit(_anchor)
            out_a = np.asarray(anchor_gen(params, mel_anchor, 1))
            assert np.isfinite(out_a).all()
            compile_anchor = time.time() - t0
            print(f"anchor (pallas bf16, B={ANCHOR_BATCH}) compile+first run: "
                  f"{compile_anchor:.1f}s", file=sys.stderr)
        except Exception as e:
            print(f"anchor path failed ({type(e).__name__}); shipped-only run",
                  file=sys.stderr)
            anchor_gen = None

    # ---- interleaved timing (scalar-witness fetch per rep) ----
    shipped_times, anchor_times = [], []
    witness = None
    for i in range(REPS):
        if anchor_gen is not None:
            t0 = time.time()
            np.asarray(anchor_gen(params, mel_anchor, 100 + i))
            anchor_times.append(time.time() - t0)
        t0 = time.time()
        _, w, _ = gen(params, mel, i)
        witness = float(np.asarray(w))
        shipped_times.append(time.time() - t0)
    assert np.isfinite(witness), witness

    dt = float(np.median(shipped_times))
    audio_sec = BATCH * gen_len / SR
    value = audio_sec / dt
    print(
        f"shipped: {gen_len} samples x{BATCH} median {dt:.3f}s over {REPS} "
        f"(spread {min(shipped_times):.3f}-{max(shipped_times):.3f}; "
        f"{BATCH * gen_len / dt:,.0f} samples/s, step {dt / gen_len * 1e6:.1f}us)",
        file=sys.stderr,
    )
    extra = {}
    if anchor_times:
        dta = float(np.median(anchor_times))
        anchor_tp = (ANCHOR_BATCH * gen_len / SR) / dta
        extra["anchor_audio_sec_per_s"] = round(anchor_tp, 4)
        # cross-batch ratio: shipped runs at B=640, the anchor at B=512
        # (bf16 exceeds VMEM at 640), so this folds the batch-size
        # advantage in with the kernel-mode speedup — the key name says so
        extra["ratio_vs_bf16_anchor_B512"] = round(value / anchor_tp, 4)
        print(
            f"anchor:  median {dta:.3f}s at B={ANCHOR_BATCH} (spread "
            f"{min(anchor_times):.3f}-{max(anchor_times):.3f}) = "
            f"{anchor_tp:.1f} audio-sec/s; shipped(B={BATCH})/anchor(B="
            f"{ANCHOR_BATCH}) cross-batch throughput ratio "
            f"{value / anchor_tp:.3f}x",
            file=sys.stderr,
        )
    extra["compile_s_shipped"] = round(compile_shipped, 1)
    extra["warmup_s_shipped"] = round(warmup_s, 1)
    extra["fetch_s_full"] = round(fetch_s_full, 2)
    if compile_anchor is not None:
        extra["compile_s_anchor"] = round(compile_anchor, 1)

    print(
        json.dumps(
            {
                "metric": "fastgen_ar_synthesis_throughput",
                "value": round(value, 4),
                "unit": "audio_sec/s/chip",
                "vs_baseline": round(value / 1.0, 4),
                "protocol": PROTOCOL,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
