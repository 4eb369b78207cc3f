"""End-to-end learning-quality smoke: train a small teacher on synthetic
audio, synthesize from held-out mels, and check that the generated audio's
spectral content follows the conditioning.

This is the audible-regression idea of the reference (committed golden wavs
per config, Readme.md:93-107) made quantitative and runnable in minutes.
Two corpora (--corpus):

* ``tones`` (default) — stationary harmonic tones.  Pass criteria:
  (1) training loss far below uniform, (2) held-out teacher-forced loss far
  below uniform, (3) free-running generation is strongly tonal (low
  spectral flatness) with mel correlation above chance.
  Note on conditioning: on perfectly periodic tones the AR context alone
  determines the next sample, so a WaveNet learns to ignore the (redundant)
  mel — matched-vs-mismatched teacher-forced losses differ by only ~0.05
  nats here, with or without dropout_inputs.  Free-running pitch therefore
  need not track the conditioning on this corpus; that is a property of the
  toy data, not of the conditioning path.

* ``speech`` — formant-synthesized pseudo-speech (data/synthetic.py) whose
  random segment sequences make the mel genuinely informative.  Criteria
  (2)/(3) become true conditioning-usage gates: the held-out teacher-forced
  loss must be markedly lower with the MATCHED mel than with a shuffled one
  (cond gap), and free-running audio must correlate with its own
  conditioning mel more than with the other utterances' mels.  This is the
  strongest conditioning check available without a real speech corpus.

Usage: python tools/quality_smoke.py [--steps 30000] [--corpus speech]
(~4 min of training on one v5e at the default steps; the tonal
spectral-flatness criterion needs >= ~30k steps to pass — fewer steps
still validate the loss criteria but leave free-run audio noisier)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dropout_inputs is the reference's own trick for forcing mel reliance
# (wavenet_mol.json sets it): on perfectly AR-predictable tonal data a
# WaveNet otherwise ignores the conditioning entirely (verified: without
# it, teacher-forced loss is flat across matched/mismatched mels).
TEACHER_CFG = {
    "wave_length": 3840,
    "num_layers": 10,
    "num_stages": 5,
    "filter_length": 3,
    "width": 128,
    "skip_width": 128,
    "deconv_width": 128,
    "deconv_config": [[40, 10], [80, 20]],
    "use_mu_law": True,
    "loss_type": "ce",
    "dropout_inputs": True,
    "num_iters": 3000,
}


def make_corpus(out_dir, sr=16000, seed=0):
    from nsynth_wavenet_tpu.data import dataset as data_lib

    rng = np.random.default_rng(seed)
    waves, ids = [], []
    t = np.arange(2 * sr) / sr
    pitches = [110, 150, 200, 270]
    for i, f0 in enumerate(pitches * 4):
        amp = 0.45 * (0.7 + 0.3 * np.sin(2 * np.pi * rng.uniform(1, 3) * t))
        w = amp * (
            np.sin(2 * np.pi * f0 * t)
            + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 3 * f0 * t)
        )
        waves.append(np.clip(w + 0.005 * rng.standard_normal(len(t)), -0.99, 0.99).astype(np.float32))
        ids.append(f"tone_{i:02d}_f{f0}")
    return data_lib.build_dataset_from_arrays(waves, ids, out_dir), pitches


# Student-smoke pairings (reference asserts these, parallel_wavenet.py:146-151):
# gauss: Gaussian teacher + Gaussian student (ClariNet closed-form KL,
#        reference parallel_wavenet.py:404-428) — the cheapest path;
# mol:   MoL teacher + logistic student (Monte-Carlo KL with num_samples
#        draws, reference parallel_wavenet.py:361-402).
GAUSS_TEACHER_CFG = dict(TEACHER_CFG, loss_type="gauss", use_mu_law=False)
# the MoL teacher is the reference's finicky one: wavenet_mol.json gives it
# a LOWER lr schedule (1e-4 start vs the 2e-4 default) and 2x the iters —
# at 2e-4 it plateaus fitting the marginal and never picks up the mel
# (measured: cond_gap ~0.005 after 30k steps on the speech corpus)
MOL_TEACHER_CFG = dict(
    TEACHER_CFG,
    loss_type="mol",
    use_mu_law=False,
    lr_schedule=[[0, 1e-4], [90000, 6e-5], [120000, 4e-5], [150000, 2e-5],
                 [180000, 6e-6], [210000, 2e-6]],
)

STUDENT_CFG = {
    "wave_length": 3840,
    "num_iaf_layers": [5, 5],
    "num_stages": 5,
    "filter_length": 3,
    "width": 64,
    "deconv_width": 128,
    "deconv_config": [[40, 10], [80, 20]],
    "use_mu_law": False,
    "loss_type": "gauss",
    "power_loss_factor": 1.0,
    "use_weight_norm": False,
    "num_iters": 30000,
}


def make_speech_corpus(out_dir, seed=0, n_utts=24):
    from nsynth_wavenet_tpu.data import dataset as data_lib
    from nsynth_wavenet_tpu.data.synthetic import make_speechlike_corpus

    waves, ids = make_speechlike_corpus(n_utts=n_utts, duration=2.0, seed=seed)
    return data_lib.build_dataset_from_arrays(waves, ids, out_dir)


# The only REAL speech in this environment: the ~9.7 s 16 kHz LJSpeech clip
# the reference commits for its own tests (reference tests/test_wavenet.py
# loads exactly this file; the reference's quality story is built on
# LJSpeech training, Readme.md:22-26, 93-113).  Used read-only.
REF_WAV = "/root/reference/tests/test_data/test.wav"


def load_real_wav():
    import wave

    w = wave.open(REF_WAV)
    assert w.getframerate() == 16000 and w.getnchannels() == 1
    pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return pcm.astype(np.float32) / 32768.0


def main_real(steps, out_dir):
    """Real-speech overfit gate: train a tiny CE teacher to overfit the
    reference's committed real-LJSpeech clip and check it generates audio
    with SPEECH statistics that tracks real conditioning mels — including
    a held-out tail the model never saw.  This is the closest available
    evidence that the stack produces speech-statistics audio (no full
    corpus is mounted in this environment; the pseudo-speech corpus gates
    remain the generalization check).

    Corpus: first ~8.65 s split into 6 training utterances; the final 1 s
    tail is held out entirely.  Gates:
      1. training CE loss far below the uniform 5.55-nat ceiling;
      2. held-out-tail teacher-forced loss below uniform AND markedly worse
         under a shuffled mel (cond gap) — the model needs the mel on data
         it never saw;
      3. free-running generation tracks its own mel above mismatched ones
         across 4 eval windows (held-out tail + 3 training windows), with
         the held-out matched corr reported separately;
      4. with --compare_pallas, the Pallas bf16 / W8A8 / W8A8-static
         serving kernels pass the same tracking gate on the trained weights.
    """
    import json

    import jax

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.data import dataset as data_lib
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.ops import stft
    from nsynth_wavenet_tpu.training import runner

    os.makedirs(out_dir, exist_ok=True)
    sr = 16000
    wav = load_real_wav()
    holdout = wav[-sr:]
    train = wav[: len(wav) - sr]
    n_seg = 6
    seg = len(train) // n_seg
    ds_dir = os.path.join(out_dir, "ds")
    data_lib.build_dataset_from_arrays(
        [train[i * seg : (i + 1) * seg] for i in range(n_seg)],
        [f"lj_{i}" for i in range(n_seg)],
        ds_dir,
    )

    cfg_path = os.path.join(out_dir, "teacher_real.json")
    with open(cfg_path, "wt") as f:
        json.dump(dict(TEACHER_CFG, num_iters=steps), f)
    run_dir, state = runner.train_wavenet(
        train_path=ds_dir, config_path=cfg_path,
        log_root=os.path.join(out_dir, "runs"), total_batch_size=8,
        num_steps=steps, ckpt_every_steps=max(steps, 1),
    )

    cfg = config_lib.load_config(cfg_path)
    model = Wavenet(cfg)
    params = jax.device_get(state["ema"])
    fg = Fastgen(model)

    # 4 one-second eval windows: index 0 = the held-out tail, 1-3 = windows
    # from the training region (distinct phonetic content, so matched vs
    # mismatched mels are discriminative)
    wavs = np.stack([holdout, train[10000:10000 + sr],
                     train[60000:60000 + sr], train[110000:110000 + sr]])
    mel = stft.melspectrogram_np(wavs)

    losses = []
    with open(os.path.join(run_dir, "train.log")) as f:
        for line in f:
            if " loss " in line:
                losses.append(float(line.split(" loss ")[1].split()[0]))
    final_loss = losses[-1] if losses else None
    loss_ok = final_loss is not None and final_loss < 4.0
    print(f"final training loss {final_loss} (uniform {np.log(256):.2f}) -> {loss_ok}")

    tf_fn = jax.jit(lambda p, w, m: model.forward_loss(p, w, m)["loss"])
    wav_crop = wavs[:, : cfg.wave_length]
    mel_crop = mel[:, : cfg.wave_length // 200 + 1]
    tf_loss = float(tf_fn(params, wav_crop, mel_crop))
    tf_mis = float(tf_fn(params, wav_crop, np.roll(mel_crop, 1, axis=0)))
    cond_gap = tf_mis - tf_loss
    # gate the held-out tail ALONE (window 0), not just the 4-window mean —
    # the mean dilutes the tail 1:3 with overfit training windows, so it
    # could sit under the uniform ceiling even if the tail didn't
    # (round-3 advisor finding)
    tf_held = float(tf_fn(params, wav_crop[0:1], mel_crop[0:1]))
    tf_ok = tf_loss < 4.5 and tf_held < np.log(256)
    cond_ok = cond_gap > 0.15
    print(f"held-out+train teacher-forced loss {tf_loss:.3f}, held-out tail "
          f"alone {tf_held:.3f} (uniform {np.log(256):.2f}) -> {tf_ok}; "
          f"cond gap {cond_gap:.3f} -> {cond_ok}")

    audio = np.asarray(jax.jit(fg.generate)(params, mel, jax.random.PRNGKey(0)))
    m_corr, mm_corr = mel_track_corr(audio, mel, sr, out_dir=out_dir,
                                     wav_prefix="gen_real")
    gen_mel_h = stft.melspectrogram_np(np.asarray(audio[0])[:sr])
    held_corr = float(np.corrcoef(
        gen_mel_h.ravel(), mel[0, : gen_mel_h.shape[0]].ravel())[0, 1])
    track_ok = m_corr > mm_corr + 0.1 and held_corr > 0.55
    print(f"free-run mel corr matched {m_corr:.3f} vs mismatched {mm_corr:.3f}; "
          f"HELD-OUT tail corr {held_corr:.3f} -> {track_ok}")
    passed = loss_ok and tf_ok and cond_ok and track_ok

    if COMPARE_PALLAS:
        import jax.numpy as jnp

        mel_rep = np.tile(mel, (2, 1, 1))  # kernel needs batch % 8 == 0
        amax = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(wavs), jnp.asarray(mel))
        for mode, wd, am in (
            ("pallas-bf16", jnp.bfloat16, None),
            ("pallas-int8", jnp.int8, None),
            ("pallas-int8s", jnp.int8, amax),
        ):
            audio_p = np.asarray(fg.generate_pallas(
                params, mel_rep, seed=0, weight_dtype=wd, act_amax=am,
                gate_static=am is not None))[: len(wavs)]
            pmc, pmmc = mel_track_corr(audio_p, mel, sr, out_dir=out_dir,
                                       wav_prefix=f"gen_real_{mode}")
            ok = pmc > pmmc + 0.1 and pmc > m_corr - 0.1
            print(f"{mode}: matched {pmc:.3f} vs mismatched {pmmc:.3f} "
                  f"(xla matched {m_corr:.3f}) -> {ok}")
            passed = passed and ok

    print("QUALITY SMOKE (real speech overfit):", "PASS" if passed else "FAIL")
    return 0 if passed else 1


def _mcd(mel_a, mel_b, n_coef: int = 13):
    """Mel-cepstral distortion (dB) between two normalized-dB mel
    spectrograms [T, num_mel] (stft.melspectrogram convention:
    norm = (dB + 100) / 100, so dB = norm * 100 - 100).  Standard MCD:
    (10 / ln 10) * sqrt(2 * sum_{k=1..K-1} (c_a[k] - c_b[k])^2) averaged
    over frames, cepstra via a DCT-II over the mel-bin axis, coefficient
    0 (energy) excluded."""
    from scipy.fftpack import dct

    ca = dct(mel_a * 100.0, type=2, axis=-1, norm="ortho")[:, 1:n_coef]
    cb = dct(mel_b * 100.0, type=2, axis=-1, norm="ortho")[:, 1:n_coef]
    d = np.sqrt(2.0 * np.sum((ca - cb) ** 2, axis=-1))
    return float((10.0 / np.log(10.0)) * np.mean(d))


def mel_track_metrics(audio, mels, n_samples, out_dir=None, wav_prefix=None):
    """Matched-vs-mismatched conditioning-tracking metrics.

    For each generated clip audio[i] (first n_samples samples), compares
    its mel against every conditioning mel mels[j]: i == j entries are
    'matched', the rest 'mismatched'.  Three metric families (round-5
    VERDICT #9: correlation alone can miss spectral artifacts the
    reference's audible-wav baselines would catch by ear):

      corr — Pearson correlation of the flattened mels (the original gate)
      msd  — RMS distance in normalized-dB mel units (lower = closer)
      mcd  — mel-cepstral distortion in dB, DCT coefs 1-12 (lower =
             closer; the standard objective vocoder-quality metric)

    Returns a dict {metric: (matched_mean, mismatched_mean)}.  Optionally
    writes the clips as {out_dir}/{wav_prefix}_{i}.wav."""
    from nsynth_wavenet_tpu.data.dataset import write_wav
    from nsynth_wavenet_tpu.ops import stft

    vals = {m: ([], []) for m in ("corr", "msd", "mcd")}
    for i in range(len(mels)):
        if out_dir is not None:
            write_wav(os.path.join(out_dir, f"{wav_prefix}_{i}.wav"), audio[i])
        gen_mel = stft.melspectrogram_np(np.asarray(audio[i])[:n_samples])
        n = gen_mel.shape[0]
        for j in range(len(mels)):
            ref = np.asarray(mels[j, :n])
            k = 0 if i == j else 1
            vals["corr"][k].append(
                float(np.corrcoef(gen_mel.ravel(), ref.ravel())[0, 1])
            )
            vals["msd"][k].append(
                float(np.sqrt(np.mean((gen_mel - ref) ** 2)))
            )
            vals["mcd"][k].append(_mcd(gen_mel, ref))
    return {
        m: (float(np.mean(a)), float(np.mean(b)))
        for m, (a, b) in vals.items()
    }


def mel_track_corr(audio, mels, n_samples, out_dir=None, wav_prefix=None):
    """Correlation-only view of mel_track_metrics (the original gate)."""
    m = mel_track_metrics(audio, mels, n_samples, out_dir=out_dir,
                          wav_prefix=wav_prefix)
    return m["corr"]


def dominant_freq(wav, sr=16000):
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freqs = np.fft.rfftfreq(len(wav), 1 / sr)
    lo = freqs > 60
    return freqs[lo][np.argmax(spec[lo])]


def main(steps, out_dir, corpus="tones", head="ce", n_utts=24):
    import json

    import jax

    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.ops import stft
    from nsynth_wavenet_tpu.training import runner

    os.makedirs(out_dir, exist_ok=True)
    ds_dir = os.path.join(out_dir, "ds")
    if corpus == "speech":
        make_speech_corpus(ds_dir, n_utts=n_utts)
        pitches = None
    else:
        _, pitches = make_corpus(ds_dir)

    # head selects the teacher output distribution: the CE thresholds below
    # are in nats against the uniform log(256) ceiling; the continuous
    # heads (mol/gauss) have no comparable absolute scale, so for them the
    # absolute-loss gates become improvement gates and the (relative)
    # conditioning gates carry the check.  This matters for --compare_pallas:
    # each head has its OWN in-kernel sampler (gumbel-argmax CE, logistic
    # MoL, Box-Muller gauss), and only a free-running quality gate exercises
    # a sampler end to end.
    base_cfg = {"ce": TEACHER_CFG, "mol": MOL_TEACHER_CFG, "gauss": GAUSS_TEACHER_CFG}[head]
    cfg_path = os.path.join(out_dir, "teacher.json")
    with open(cfg_path, "wt") as f:
        json.dump(dict(base_cfg, num_iters=steps), f)

    run_dir, state = runner.train_wavenet(
        train_path=ds_dir,
        config_path=cfg_path,
        log_root=os.path.join(out_dir, "runs"),
        total_batch_size=8,
        num_steps=steps,
        ckpt_every_steps=max(steps, 1),
    )

    # synthesize conditioned on one held-out mel per pitch
    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.wavenet import Wavenet

    cfg = config_lib.load_config(cfg_path)
    model = Wavenet(cfg)
    params = jax.device_get(state["ema"])
    fg = Fastgen(model)

    sr = 16000
    t = np.arange(sr) / sr  # 1 s held-out clips
    if corpus == "speech":
        from nsynth_wavenet_tpu.data.synthetic import make_speechlike_utterance

        rng = np.random.default_rng(1234)  # disjoint from the training seed
        wavs = np.stack([make_speechlike_utterance(rng, sr, 1.0) for _ in range(4)])
    else:
        wavs = np.stack(
            [
                0.4
                * (
                    np.sin(2 * np.pi * f0 * t)
                    + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
                    + 0.2 * np.sin(2 * np.pi * 3 * f0 * t)
                )
                for f0 in pitches
            ]
        ).astype(np.float32)
    mel = stft.melspectrogram_np(wavs)
    audio = np.asarray(jax.jit(fg.generate)(params, mel, jax.random.PRNGKey(0)))

    from nsynth_wavenet_tpu.data.dataset import write_wav

    # -- criteria ---------------------------------------------------------
    # 1. training learned the audio distribution.  CE: absolute thresholds
    # in nats against the uniform log(256) ceiling.  mol/gauss: continuous
    # NLL with no comparable absolute scale -> gate on substantial
    # improvement over the first logged loss instead.
    losses = []
    with open(os.path.join(run_dir, "train.log")) as f:
        for line in f:
            if " loss " in line:
                losses.append(float(line.split(" loss ")[1].split()[0]))
    final_loss = losses[-1] if losses else None
    if head == "ce":
        # pseudo-speech is a harder distribution (noise bursts are near the
        # entropy ceiling); thresholds calibrated per corpus, both far below
        # the uniform 5.55 nats
        loss_thresh, tf_thresh = (4.0, 4.5) if corpus == "speech" else (2.5, 3.0)
        loss_ok = final_loss is not None and final_loss < loss_thresh
        print(f"final training loss {final_loss} (uniform {np.log(256):.2f}) -> {loss_ok}")
    else:
        loss_ok = final_loss is not None and final_loss < losses[0] - 1.0
        print(f"training loss {losses[0] if losses else None} -> {final_loss} "
              f"({head} NLL, improvement gate) -> {loss_ok}")

    # 2. held-out teacher-forced prediction: absolute for CE, no-blowup vs
    # the training loss for the continuous heads
    tf_fn = jax.jit(lambda p, w, m: model.forward_loss(p, w, m)["loss"])
    wav_crop = wavs[:, : cfg.wave_length]
    mel_crop = mel[:, : cfg.wave_length // 200 + 1]
    tf_loss = float(tf_fn(params, wav_crop, mel_crop))
    if head == "ce":
        tf_ok = tf_loss < tf_thresh
    else:
        tf_ok = final_loss is not None and tf_loss < final_loss + 0.5
    print(f"held-out teacher-forced loss {tf_loss:.3f} -> {tf_ok}")

    if corpus == "speech":
        # 3. conditioning-usage gates (only meaningful on this corpus, where
        # the mel carries information the AR context cannot predict):
        # (a) teacher-forced loss must be markedly worse under a shuffled mel;
        # (b) free-running audio must track its OWN mel more than the others'.
        tf_mis = float(tf_fn(params, wav_crop, np.roll(mel_crop, 1, axis=0)))
        cond_gap = tf_mis - tf_loss
        # the 0.15-nat gap threshold is calibrated on the CE head; the
        # continuous NLLs sit on a different scale (measured: a gauss teacher
        # with clearly-tracking free-run audio shows ~0.14), so for them the
        # gap gate is a looser sanity floor and the tracking gate decides
        gap_thresh = 0.15 if head == "ce" else 0.05
        mt = mel_track_metrics(
            audio, mel, len(t), out_dir=out_dir, wav_prefix="gen_speech"
        )
        m_corr, mm_corr = mt["corr"]
        cond_ok = cond_gap > gap_thresh
        track_ok = (m_corr > mm_corr + 0.05
                    and mt["msd"][0] < mt["msd"][1]
                    and mt["mcd"][0] < mt["mcd"][1])
        print(f"cond gap (shuffled-mel TF loss {tf_mis:.3f} - matched) "
              f"{cond_gap:.3f} -> {cond_ok}")
        print(f"free-run mel corr matched {m_corr:.3f} vs mismatched "
              f"{mm_corr:.3f}; msd {mt['msd'][0]:.3f} vs {mt['msd'][1]:.3f}; "
              f"mcd {mt['mcd'][0]:.1f} vs {mt['mcd'][1]:.1f} dB -> {track_ok}")
        passed = loss_ok and tf_ok and cond_ok and track_ok

        if COMPARE_PALLAS:
            # Pallas bf16 / W8A8 int8 serving kernels must pass the SAME
            # conditioning-tracking gate on the trained weights — a
            # stronger check than the tonal flatness compare, because a
            # subtly broken conditioning operand (enc fill, cond-kernel
            # concat, quantization) shows up directly as lost tracking.
            import jax.numpy as jnp

            rep = 8 // mel.shape[0]  # kernel needs batch % 8 == 0
            # (int8 at B=8 is validated on hardware: tpu_kernel_parity.py
            # and longform_check both run it)
            mel_rep = np.tile(mel, (rep, 1, 1))
            amax = jax.jit(fg.calibrate_act_amax)(
                params, jnp.asarray(wavs), jnp.asarray(mel)
            )
            for mode, wd, am in (
                ("pallas-bf16", jnp.bfloat16, None),
                ("pallas-int8", jnp.int8, None),
                ("pallas-int8s", jnp.int8, amax),  # static act+gate scales
            ):
                audio_p = np.asarray(
                    fg.generate_pallas(
                        params, mel_rep, seed=0, weight_dtype=wd, act_amax=am,
                        gate_static=am is not None,
                    )
                )[: len(wavs)]
                pmc, pmmc = mel_track_corr(
                    audio_p, mel, len(t), out_dir=out_dir, wav_prefix=f"gen_{mode}"
                )
                ok = pmc > pmmc + 0.05 and pmc > m_corr - 0.1
                print(f"{mode}: free-run mel corr matched {pmc:.3f} vs "
                      f"mismatched {pmmc:.3f} (xla matched {m_corr:.3f}) -> {ok}")
                passed = passed and ok

        print("QUALITY SMOKE (speech):", "PASS" if passed else "FAIL")
        return 0 if passed else 1

    # 3. free-running generation produces structured (tonal) audio, not noise
    results = []
    for i, f0 in enumerate(pitches):
        gen = audio[i]
        write_wav(os.path.join(out_dir, f"gen_f{f0}.wav"), gen)
        got_f = dominant_freq(gen[2000:])
        spec = np.abs(np.fft.rfft(gen[2000:] * np.hanning(len(gen) - 2000))) + 1e-9
        flatness = float(np.exp(np.mean(np.log(spec))) / np.mean(spec))
        gen_mel = stft.melspectrogram_np(gen[: len(t)])
        corr = np.corrcoef(gen_mel.ravel(), mel[i, : gen_mel.shape[0]].ravel())[0, 1]
        results.append((f0, got_f, flatness, corr))
        print(
            f"pitch {f0:4d} Hz -> generated dominant {got_f:7.1f} Hz, "
            f"spectral flatness {flatness:.4f}, mel corr {corr:.3f}"
        )
    # an undertrained-but-working AR sampler produces noisy tones
    # (flatness ~0.35 at 30k steps on this corpus); a broken sampler
    # produces white noise (flatness ~1.0).  Full fidelity needs
    # reference-scale training (200k steps on a real corpus).
    tonal_ok = float(np.median([r[2] for r in results])) < 0.45
    mean_corr = float(np.mean([r[3] for r in results]))
    print(f"tonal {tonal_ok}; mean mel corr {mean_corr:.3f} (informational: on "
          "perfectly AR-predictable tones the conditioning is informationally "
          "redundant, so free-running pitch need not track the mel — see "
          "module docstring; real-speech corpora do not have this property)")

    passed = loss_ok and tf_ok and tonal_ok and mean_corr > 0.4

    # 4. (optional) serving kernels on the TRAINED model: the Pallas bf16 and
    # W8A8 int8 paths must match the XLA sampler's audio quality metrics —
    # validates int8 quantization on real weights, not random ones
    # (docs/ROADMAP.md item 4).
    if COMPARE_PALLAS:
        import jax.numpy as jnp

        rep = 8 // mel.shape[0]  # kernel needs batch % 8 == 0
        mel_rep = np.tile(mel, (rep, 1, 1))
        base_med = float(np.median([r[2] for r in results]))
        amax = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(wavs), jnp.asarray(mel)
        )
        for mode, wd, am in (
            ("pallas-bf16", jnp.bfloat16, None),
            ("pallas-int8", jnp.int8, None),
            ("pallas-int8s", jnp.int8, amax),  # static act+gate scales
        ):
            audio_p = np.asarray(
                fg.generate_pallas(
                    params, mel_rep, seed=0, weight_dtype=wd, act_amax=am,
                    gate_static=am is not None,
                )
            )[: len(pitches)]
            flats, corrs = [], []
            for i, f0 in enumerate(pitches):
                gen = audio_p[i][: len(t)]
                write_wav(os.path.join(out_dir, f"gen_{mode}_f{f0}.wav"), gen)
                spec = np.abs(np.fft.rfft(gen[2000:] * np.hanning(len(gen) - 2000))) + 1e-9
                flats.append(float(np.exp(np.mean(np.log(spec))) / np.mean(spec)))
                gen_mel = stft.melspectrogram_np(gen)
                corrs.append(
                    float(np.corrcoef(gen_mel.ravel(), mel[i, : gen_mel.shape[0]].ravel())[0, 1])
                )
            med_flat, mean_c = float(np.median(flats)), float(np.mean(corrs))
            ok = med_flat < base_med + 0.1 and mean_c > 0.4
            print(f"{mode}: median flatness {med_flat:.4f} (xla {base_med:.4f}), "
                  f"mean mel corr {mean_c:.3f} -> {ok}")
            passed = passed and ok

    print("QUALITY SMOKE:", "PASS" if passed else "FAIL")
    return 0 if passed else 1


def parse_student_log(run_dir, window=10):
    """Windowed-mean (loss, kl, power) at the start and end of the student
    log.  Per-batch student losses are extremely noisy at tiny batch sizes
    (a silence-heavy crop and a voiced crop differ by >5x in power loss),
    so single-row comparisons are meaningless — compare means over the
    first/last `window` logged rows instead."""
    import re

    pat = re.compile(
        r"step \d+ loss ([\d.eE+-]+) kl ([\d.eE+-]+) power ([\d.eE+-]+)"
        r"(?: hpt ([\d.eE+-]+))?"
    )
    rows = []
    with open(os.path.join(run_dir, "train.log")) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append(tuple(float(g) if g is not None else float("nan")
                                  for g in m.groups()))
    assert rows, "no student loss lines found"
    w = min(window, max(len(rows) // 2, 1))
    head = tuple(float(np.mean([r[k] for r in rows[:w]])) for k in range(4))
    tail = tuple(float(np.mean([r[k] for r in rows[-w:]])) for k in range(4))
    return head, tail


def main_student(steps, out_dir, corpus, pairing="gauss", n_utts=24):
    """Distillation-quality smoke: teacher -> IAF student -> one-shot
    synthesis from held-out mels.  pairing='gauss' (ClariNet closed-form KL)
    or 'mol' (MoL teacher + logistic student, Monte-Carlo KL).  Gates:
    (1) KL and power loss both decrease substantially over training,
    (2) generated audio has sane amplitude statistics (no scale
    collapse/explosion), (3) on the speech corpus the free-running student
    tracks its own conditioning mel better than the other utterances' (same
    conditioning-usage gate as the teacher smoke)."""
    import json

    import jax

    from nsynth_wavenet_tpu import evaluation
    from nsynth_wavenet_tpu.models import parallelgen
    from nsynth_wavenet_tpu.ops import stft
    from nsynth_wavenet_tpu.training import runner

    os.makedirs(out_dir, exist_ok=True)
    ds_dir = os.path.join(out_dir, "ds")
    if corpus == "speech":
        make_speech_corpus(ds_dir, n_utts=n_utts)
    else:
        make_corpus(ds_dir)

    te_cfg = GAUSS_TEACHER_CFG if pairing == "gauss" else MOL_TEACHER_CFG
    te_cfg_path = os.path.join(out_dir, f"teacher_{pairing}.json")
    with open(te_cfg_path, "wt") as f:
        json.dump(dict(te_cfg, num_iters=steps), f)
    te_dir, _ = runner.train_wavenet(
        train_path=ds_dir,
        config_path=te_cfg_path,
        log_root=os.path.join(out_dir, "runs"),
        total_batch_size=8,
        num_steps=steps,
        ckpt_every_steps=max(steps, 1),
    )

    st_cfg = dict(STUDENT_CFG, num_iters=steps)
    if pairing == "mol":
        st_cfg["loss_type"] = "logistic"
        st_cfg["num_samples"] = 100  # reference MC-KL draw count
    st_cfg_path = os.path.join(out_dir, f"student_{pairing}.json")
    with open(st_cfg_path, "wt") as f:
        json.dump(st_cfg, f)
    st_dir, _ = runner.train_parallel_wavenet(
        train_path=ds_dir,
        teacher_dir=te_dir,
        config_path=st_cfg_path,
        log_root=os.path.join(out_dir, "runs"),
        total_batch_size=4,
        num_steps=steps,
        ckpt_every_steps=max(steps, 1),
    )

    (l0, kl0, pw0, hpt0), (l1, kl1, pw1, hpt1) = parse_student_log(st_dir)
    if pairing == "gauss":
        kl_ok = kl1 < kl0 * 0.5
        pw_ok = pw1 < pw0 * 0.5
    else:
        # The MC logistic KL's floor is the teacher's own NLL: H_Ps_Pt >=
        # teacher cross-entropy (~6.7 nats for a 30k-step MoL teacher on
        # this corpus) while H_Ps = mean(log_scale_tot)+2 ~ -0.5, so KL
        # cannot fall much below ~7 at smoke scale no matter how good the
        # student — and it can even RISE while the joint objective improves,
        # because power-loss sharpening lowers the student entropy term.
        # (Measured: KL flat at ~10.7-11.0 over 30k steps while power
        # halves and free-run tracking reaches 0.71.)  Gate on no-blowup
        # instead; power keeps a halving gate with a small tolerance.
        kl_ok = kl1 < kl0 * 1.2
        pw_ok = pw1 < pw0 * 0.55
        # H_Ps_Pt (the teacher cross-entropy term) is the KL component that
        # CAN move: the KL itself is floored by the teacher's own NLL while
        # power-loss sharpening lowers H_Ps in lockstep (reference
        # parallel_wavenet.py:361-402; benchmarks/RESULTS.md mol pairing).
        # At long-run scale (>= 60k steps) require it to actually DECREASE —
        # the tightened divergence gate of round-3 VERDICT #8.  At smoke
        # scale it is informational (windowed means at 30k are inside the
        # per-batch noise).
        if steps >= 60000 and np.isfinite(hpt0) and np.isfinite(hpt1):
            hpt_ok = hpt1 < hpt0 - 0.1
            kl_ok = kl_ok and hpt_ok
            print(f"student H_Ps_Pt {hpt0:.3f} -> {hpt1:.3f} "
                  f"(decreasing gate) -> {hpt_ok}")
        elif np.isfinite(hpt1):
            print(f"student H_Ps_Pt {hpt0:.3f} -> {hpt1:.3f} (informational "
                  "at smoke scale; gated at >= 60k steps)")
    print(f"student kl {kl0:.3f} -> {kl1:.3f} ({kl_ok}); "
          f"power {pw0:.3f} -> {pw1:.3f} ({pw_ok}); loss {l0:.3f} -> {l1:.3f}")

    # held-out one-shot synthesis
    sr = 16000
    if corpus == "speech":
        from nsynth_wavenet_tpu.data.synthetic import make_speechlike_utterance

        rng = np.random.default_rng(1234)
        wavs = np.stack([make_speechlike_utterance(rng, sr, 1.0) for _ in range(4)])
    else:
        t = np.arange(sr) / sr
        wavs = np.stack(
            [
                0.4
                * (
                    np.sin(2 * np.pi * f0 * t)
                    + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
                    + 0.2 * np.sin(2 * np.pi * 3 * f0 * t)
                )
                for f0 in (110, 150, 200, 270)
            ]
        ).astype(np.float32)
    mel = stft.melspectrogram_np(wavs)

    model, params = evaluation.load_eval_model(st_dir)
    audio = np.asarray(parallelgen.jit_synthesize(model)(params, mel, jax.random.PRNGKey(7)))

    std = float(np.std(audio))
    amp_ok = np.isfinite(audio).all() and 0.01 < std < 1.0
    print(f"student free-run std {std:.4f} -> {amp_ok}")

    mt = mel_track_metrics(
        audio, mel, sr, out_dir=out_dir, wav_prefix="gen_student"
    )
    m_corr, mm_corr = mt["corr"]
    if corpus == "speech":
        track_ok = m_corr > mm_corr + 0.05
        # spectral gates (round-5): matched must be spectrally CLOSER than
        # mismatched on both RMS mel distance and mel-cepstral distortion —
        # correlation alone can miss spectral artifacts
        spec_ok = (mt["msd"][0] < mt["msd"][1]) and (mt["mcd"][0] < mt["mcd"][1])
        track_ok = track_ok and spec_ok
        print(f"student mel corr matched {m_corr:.3f} vs mismatched {mm_corr:.3f}; "
              f"msd {mt['msd'][0]:.3f} vs {mt['msd'][1]:.3f}; "
              f"mcd {mt['mcd'][0]:.1f} vs {mt['mcd'][1]:.1f} dB "
              f"-> {track_ok}")
    else:
        track_ok = m_corr > 0.4
        print(f"student mel corr {m_corr:.3f} -> {track_ok}")

    passed = kl_ok and pw_ok and amp_ok and track_ok
    print("QUALITY SMOKE (student):", "PASS" if passed else "FAIL")
    return 0 if passed else 1


COMPARE_PALLAS = False

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default=30000, type=int)
    ap.add_argument("--out_dir", default="/tmp/quality_smoke")
    ap.add_argument("--corpus", default="tones",
                    choices=["tones", "speech", "real"],
                    help="'speech' = formant-synthesized pseudo-speech where "
                         "the mel is genuinely informative (conditioning-"
                         "usage gates); 'tones' = harmonic corpus (tonality "
                         "gates, optional --compare_pallas); 'real' = "
                         "overfit the reference's committed real-LJSpeech "
                         "clip with a held-out tail (main_real)")
    ap.add_argument("--compare_pallas", action="store_true",
                    help="also synthesize with the Pallas bf16 and W8A8 int8 "
                         "kernels and gate on their quality metrics "
                         "(tones: flatness compare; speech: conditioning-"
                         "tracking compare)")
    ap.add_argument("--student", action="store_true",
                    help="distillation smoke instead: teacher -> IAF "
                         "student -> one-shot synthesis gates")
    ap.add_argument("--pairing", default="gauss", choices=["gauss", "mol"],
                    help="student smoke pairing: 'gauss' = ClariNet "
                         "closed-form KL; 'mol' = MoL teacher + logistic "
                         "student with Monte-Carlo KL")
    ap.add_argument("--n_utts", default=24, type=int,
                    help="speech-corpus size; the default 24 shows train/"
                         "held-out gap at 100k steps (toy-corpus "
                         "specialization) -- raise for generalization runs")
    ap.add_argument("--head", default="ce", choices=["ce", "mol", "gauss"],
                    help="teacher output distribution; with --compare_pallas "
                         "this picks which in-kernel sampler (gumbel-argmax "
                         "CE / logistic MoL / Box-Muller gauss) gets the "
                         "free-running quality gate")
    args = ap.parse_args()
    COMPARE_PALLAS = args.compare_pallas
    if args.student:
        sys.exit(main_student(args.steps, args.out_dir, args.corpus, args.pairing,
                              args.n_utts))
    if args.corpus == "real":
        sys.exit(main_real(args.steps, args.out_dir))
    sys.exit(main(args.steps, args.out_dir, args.corpus, args.head, args.n_utts))
