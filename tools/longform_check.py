"""Long-horizon streaming-serving fidelity check.

Free-running AR quality over LONG utterances is where a subtly broken
recurrent state (ring phase across chunks, streaming xh carry, bucketed
deconv tails) or a drifting sampler shows up: short smokes can pass while
tracking collapses after a few seconds.  This tool loads a TRAINED teacher
run (e.g. from tools/quality_smoke.py --corpus speech), synthesizes an
N-second pseudo-speech utterance through the streaming Pallas path (chunked
generation state, one compile), and reports the generated-mel vs
conditioning-mel correlation PER 1-SECOND WINDOW — the gate is that late
windows track as well as early ones.

The reference has no long-form gate at all (its committed golden wavs are
short clips, Readme.md:93-107); this is a serving-quality guard the TPU
framework adds.

Usage:
    python tools/longform_check.py --ckpt_dir <teacher run dir> \
        [--seconds 12] [--chunk 4000] [--weight_dtype bf16|int8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ckpt_dir, seconds, chunk, weight_dtype, out_dir):
    import jax.numpy as jnp

    from nsynth_wavenet_tpu import evaluation
    from nsynth_wavenet_tpu.data.dataset import write_wav
    from nsynth_wavenet_tpu.data.synthetic import make_speechlike_utterance
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.ops import stft
    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    wd = {
        "bf16": jnp.bfloat16, "int8": jnp.int8, "int8_static": jnp.int8,
    }[weight_dtype]

    model, params = evaluation.load_eval_model(ckpt_dir)
    sr = 16000

    # held-out long utterances (seed disjoint from the smoke's train corpus);
    # batch 8 to satisfy the kernel's sublane rule, metrics on all rows
    rng = np.random.default_rng(99)
    wavs = np.stack(
        [make_speechlike_utterance(rng, sr, float(seconds)) for _ in range(8)]
    )
    mel = stft.melspectrogram_np(wavs)

    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

    if isinstance(model, ParallelWavenet):
        # student run: stream the one-shot IAF path instead
        # (parallelgen.StudentStreamer — same cross-chunk-state design);
        # weight_dtype does not apply (the flow kernel is bf16-compact)
        import jax

        from nsynth_wavenet_tpu.models.parallelgen import StudentStreamer

        chunk = -(-chunk // 256) * 256  # kernel tile alignment
        streamer = StudentStreamer(model, chunk=chunk, tile=256)
        audio = streamer.synthesize(params, mel, rng=jax.random.PRNGKey(0))
        weight_dtype = "student-flow"
    else:
        fg = Fastgen(model)
        act_amax = None
        if weight_dtype == "int8_static":
            import jax

            cal = wavs[:, :sr]  # 1 s calibration slice of the held-out audio
            act_amax = jax.jit(fg.calibrate_act_amax)(
                params, jnp.asarray(cal),
                jnp.asarray(stft.melspectrogram_np(cal)),
            )

        audio = np.asarray(
            fg.generate_pallas(
                params, mel, seed=0, weight_dtype=wd, chunk=chunk,
                act_amax=act_amax, gate_static=act_amax is not None,
            )
        )

    os.makedirs(out_dir, exist_ok=True)
    L = min(audio.shape[1], wavs.shape[1])
    n_win = L // sr
    win_corr = np.zeros((len(wavs), n_win))
    win_mcd = np.zeros((len(wavs), n_win))
    from tools.quality_smoke import _mcd

    for i in range(len(wavs)):
        write_wav(os.path.join(out_dir, f"longform_{weight_dtype}_{i}.wav"), audio[i])
        for w in range(n_win):
            seg = audio[i, w * sr : (w + 1) * sr]
            gen_mel = stft.melspectrogram_np(seg)
            n = gen_mel.shape[0]
            ref_mel = stft.melspectrogram_np(wavs[i, w * sr : (w + 1) * sr])[:n]
            win_corr[i, w] = np.corrcoef(gen_mel.ravel(), ref_mel.ravel())[0, 1]
            win_mcd[i, w] = _mcd(gen_mel, ref_mel)

    per_win = win_corr.mean(axis=0)
    per_win_mcd = win_mcd.mean(axis=0)
    print("per-window matched mel corr:",
          " ".join(f"{c:.3f}" for c in per_win))
    print("per-window MCD (dB):       ",
          " ".join(f"{c:.1f}" for c in per_win_mcd))
    early = float(per_win[: max(n_win // 3, 1)].mean())
    late = float(per_win[-max(n_win // 3, 1):].mean())
    mcd_early = float(per_win_mcd[: max(n_win // 3, 1)].mean())
    mcd_late = float(per_win_mcd[-max(n_win // 3, 1):].mean())
    # late windows must keep tracking: no collapse (absolute floor) and no
    # substantial decay vs the start of the utterance — on BOTH the
    # correlation and the spectral (MCD) axis (round-5: correlation alone
    # can miss spectral artifacts that grow over a long stream)
    ok = (late > 0.3 and late > early - 0.15
          and mcd_late < mcd_early * 1.25)
    print(f"early {early:.3f} late {late:.3f}; "
          f"mcd early {mcd_early:.1f} late {mcd_late:.1f} dB -> "
          f"{'PASS' if ok else 'FAIL'} ({weight_dtype}, {seconds}s, chunk {chunk})")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--seconds", default=12, type=int)
    ap.add_argument("--chunk", default=4000, type=int)
    ap.add_argument("--weight_dtype", default="bf16", choices=["bf16", "int8", "int8_static"])
    ap.add_argument("--out_dir", default="/tmp/longform_check")
    args = ap.parse_args()
    sys.exit(main(args.ckpt_dir, args.seconds, args.chunk,
                  args.weight_dtype, args.out_dir))
