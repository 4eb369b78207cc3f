"""Mel/STFT frontend parity tests (model: reference tests/test_mel_extractor.py,
which checked librosa-vs-TF parity; here we check the jnp frontend against
independent direct numpy computations of the same conventions)."""

import numpy as np

from nsynth_wavenet_tpu.ops import stft


def _naive_stft_center(y, n_fft=2048, hop=200, win=800):
    """Direct numpy librosa-convention STFT for cross-checking."""
    pad = n_fft // 2
    yp = np.pad(y, pad, mode="reflect")
    n = np.arange(win)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / win)
    window = np.zeros(n_fft)
    lpad = (n_fft - win) // 2
    window[lpad : lpad + win] = w
    n_frames = 1 + len(y) // hop
    out = np.empty((n_frames, n_fft // 2 + 1), np.complex128)
    for t in range(n_frames):
        frame = yp[t * hop : t * hop + n_fft] * window
        out[t] = np.fft.rfft(frame)
    return out


def _naive_stft_pad_end(y, n_fft=2048, hop=200, win=800):
    """Direct numpy tf.signal.stft(pad_end=True) convention."""
    n_frames = -(-len(y) // hop)
    full = (n_frames - 1) * hop + win
    yp = np.pad(y, (0, max(0, full - len(y))))
    n = np.arange(win)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / win)
    out = np.empty((n_frames, n_fft // 2 + 1), np.complex128)
    for t in range(n_frames):
        frame = yp[t * hop : t * hop + win] * w
        out[t] = np.fft.rfft(frame, n=n_fft)
    return out


def test_stft_center_matches_naive():
    rng = np.random.RandomState(0)
    y = rng.randn(7680).astype(np.float32)
    got = np.asarray(stft.stft_center(y))
    want = _naive_stft_center(y)
    assert got.shape == want.shape == (39, 1025)
    np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-3, atol=1e-3)


def test_stft_pad_end_matches_naive():
    rng = np.random.RandomState(1)
    y = rng.randn(7680).astype(np.float32)
    got = np.asarray(stft.stft_pad_end(y))
    want = _naive_stft_pad_end(y)
    assert got.shape == want.shape == (39, 1025)
    np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-3, atol=1e-3)


def test_stft_batched_matches_single():
    rng = np.random.RandomState(2)
    y = rng.randn(3, 7680).astype(np.float32)
    batched = np.asarray(stft.stft_center(y))
    for b in range(3):
        single = np.asarray(stft.stft_center(y[b]))
        # f32 matmul reduction order differs between batched/single
        np.testing.assert_allclose(batched[b], single, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    fb = stft.mel_filterbank()
    assert fb.shape == (80, 1025)
    assert fb.min() >= 0.0
    # Slaney normalization: each triangular filter integrates to ~1 over Hz.
    bin_hz = 16000 / 2 / 1024
    areas = fb.sum(axis=1) * bin_hz
    # the narrowest (lowest) filters are a few bins wide -> looser tolerance
    np.testing.assert_allclose(areas[5:], 1.0, rtol=0.15)
    # Filters must be zero outside [fmin, fmax].
    freqs = np.linspace(0, 8000, 1025)
    assert fb[:, freqs < 120].max() == 0.0
    assert fb[:, freqs > 7650].max() == 0.0
    # Peak frequency must be monotonically increasing.
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) > 0)


def test_melspectrogram_shape_range():
    rng = np.random.RandomState(3)
    y = (0.3 * rng.randn(4, 7680)).astype(np.float32)
    mel = np.asarray(stft.melspectrogram(y))
    assert mel.shape == (4, 39, 80)
    assert mel.min() >= 0.0 and mel.max() <= 1.0
    # a real signal should produce non-degenerate features
    assert mel.std() > 0.01
    assert stft.num_mel_frames(7680) == 39


def test_melspectrogram_np_matches_jnp():
    rng = np.random.RandomState(7)
    y = (0.3 * rng.randn(2, 7680)).astype(np.float32)
    np.testing.assert_allclose(
        stft.melspectrogram_np(y), np.asarray(stft.melspectrogram(y)), atol=2e-4
    )


def test_melspectrogram2_pad_end_variant():
    """USE_NEW_MEL_EXTRACTOR path: pad-end STFT frames, same normalization."""
    rng = np.random.RandomState(8)
    y = (0.3 * rng.randn(7680)).astype(np.float32)
    mel2 = np.asarray(stft.melspectrogram2(y))
    assert mel2.shape == (39, 80)
    assert 0.0 <= mel2.min() and mel2.max() <= 1.0
    # differs from the centered extractor (different framing)
    mel1 = np.asarray(stft.melspectrogram(y))
    assert np.abs(mel1 - mel2).max() > 1e-3


def test_melspectrogram_sine_peak_location():
    # A 1 kHz sine must peak in the mel band whose center is nearest 1 kHz.
    sr = 16000
    t = np.arange(7680) / sr
    y = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    mel = np.asarray(stft.melspectrogram(y))  # [39, 80]
    fb = stft.mel_filterbank()
    freqs = np.linspace(0, sr / 2, 1025)
    centers = freqs[fb.argmax(axis=1)]
    peak_band = mel[10].argmax()
    assert abs(centers[peak_band] - 1000) < 150
