"""Tests for the formant-synthesized pseudo-speech corpus
(data/synthetic.py) — the conditioning-informative stand-in for real speech
used by tools/quality_smoke.py --corpus speech."""

import numpy as np

from nsynth_wavenet_tpu.data.synthetic import (
    make_speechlike_corpus,
    make_speechlike_utterance,
)


def test_corpus_shapes_and_range():
    waves, ids = make_speechlike_corpus(n_utts=3, sr=16000, duration=1.0, seed=0)
    assert len(waves) == len(ids) == 3
    for w in waves:
        assert w.shape == (16000,)
        assert w.dtype == np.float32
        assert np.isfinite(w).all()
        assert np.max(np.abs(w)) <= 0.99


def test_deterministic_given_seed():
    w1, _ = make_speechlike_corpus(n_utts=2, duration=0.5, seed=7)
    w2, _ = make_speechlike_corpus(n_utts=2, duration=0.5, seed=7)
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(a, b)


def test_utterances_are_decorrelated():
    """Random segment sequences -> distinct utterances (this is what makes
    the mel conditioning informative, unlike stationary tones)."""
    waves, _ = make_speechlike_corpus(n_utts=4, duration=1.0, seed=1)
    for i in range(len(waves)):
        for j in range(i + 1, len(waves)):
            c = abs(float(np.corrcoef(waves[i], waves[j])[0, 1]))
            assert c < 0.2, (i, j, c)


def test_speechlike_spectral_structure():
    """Voiced segments put energy in the formant band; the waveform is
    neither silent nor white noise."""
    rng = np.random.default_rng(0)
    w = make_speechlike_utterance(rng, sr=16000, duration=2.0)
    rms = float(np.sqrt(np.mean(w**2)))
    assert 0.02 < rms < 0.5
    # glottal source + formants concentrate energy below 1 kHz; white noise
    # puts only 1000/8000 = 0.125 of its energy there (measured ~0.12)
    spec = np.abs(np.fft.rfft(w)) ** 2
    freqs = np.fft.rfftfreq(len(w), 1 / 16000)
    low_frac = float(spec[freqs < 1000].sum() / spec.sum())
    assert low_frac > 0.5, low_frac
