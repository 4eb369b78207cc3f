"""Reference-oracle parity tests (round-2, VERDICT "Missing #2").

Round 1 validated the signal/feature core against self-written numpy twins —
a self-referential check. These tests close the BASELINE.md correctness gate
at op level against *independent* oracles:

  1. The reference's OWN code: ``/root/reference/auxilaries/utils.py``
     (mu-law / inv-mu-law / cast-quantize, lines 72-169) executed under
     TF 2.x eager with ``tf.compat.v1`` rebound (``tf.log`` etc.), librosa
     and ``wavenet.masked`` shimmed (they are only used by functions we do
     not call).
  2. ``tf.signal.stft`` — the exact op behind the reference power-loss STFT
     (``auxilaries/mel_extractor.py:111-121``, tf.contrib.signal.stft ==
     tf.signal.stft) — vs our ``ops.stft.stft_pad_end``.
  3. An independent host STFT for the librosa convention
     (``mel_extractor.py:65-69``): scipy's hann window + numpy's rfft
     (a true FFT — independent of our DFT-matmul device path) + the
     documented librosa center/reflect-pad semantics.
  4. An independently re-derived Slaney mel filterbank (scalar-loop
     construction straight from the Slaney formula, no shared code with
     ``ops.stft.mel_filterbank``) for ``librosa.filters.mel`` defaults
     (``mel_extractor.py:79-82``).  librosa itself is not installed in this
     environment, so a from-the-spec reconstruction is the strongest
     available oracle; TF's ``linear_to_mel_weight_matrix`` is HTK-scale and
     intentionally NOT used (wrong convention).

All five config encodings (mu-law on/off, quant 256/65536) and both STFT
conventions are covered.
"""

import glob
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.ops import signal as sig
from nsynth_wavenet_tpu.ops import stft as stft_ops

REF = "/root/reference"

tf = pytest.importorskip("tensorflow")

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.json")))


# ---------------------------------------------------------------------------
# Oracle 1: the reference's own auxilaries/utils.py, executed.
# ---------------------------------------------------------------------------


class _TF1Shim(types.ModuleType):
    """Presents tf.compat.v1 as ``tensorflow`` (restores tf.log/tf.where
    v1 names the reference uses) with a dummy ``contrib`` attribute (the
    reference binds tf.contrib.slim at module scope but we never call
    anything that uses it)."""

    def __init__(self):
        super().__init__("tensorflow")
        self._tf1 = tf.compat.v1
        self.contrib = types.SimpleNamespace(slim=None)

    def __getattr__(self, name):
        return getattr(self._tf1, name)


def _load_reference_utils():
    saved = {
        k: sys.modules.get(k)
        for k in ("librosa", "wavenet", "wavenet.masked", "tensorflow")
    }
    try:
        sys.modules["librosa"] = types.ModuleType("librosa")  # load_audio only
        wn = types.ModuleType("wavenet")
        mk = types.ModuleType("wavenet.masked")
        mk.get_kernel = None  # only referenced by functions we do not call
        wn.masked = mk
        sys.modules["wavenet"] = wn
        sys.modules["wavenet.masked"] = mk
        sys.modules["tensorflow"] = _TF1Shim()
        spec = importlib.util.spec_from_file_location(
            "ref_aux_utils", os.path.join(REF, "auxilaries", "utils.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_utils():
    return _load_reference_utils()


def _wav(n=50000, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.uniform(-1.0, 1.0 - 1e-6, size=n)).astype(np.float32)
    # exercise the special cases the reference's formulas branch on
    w[:7] = [0.0, -1.0, 1.0 - 2**-24, 0.5, -0.5, 2**-20, -(2**-20)]
    return w


def test_mu_law_matches_reference_code(ref_utils):
    w = _wav()
    ref = np.asarray(ref_utils.mu_law(tf.constant(w)))
    got = np.asarray(sig.mu_law(w))
    # floor() sits after a float32 log computed two ways (tf.log(1+x) vs
    # jnp.log1p); a value landing within 1 ulp of an integer can floor apart.
    diff = np.abs(ref - got)
    assert diff.max() <= 1.0
    assert (diff != 0).mean() < 1e-3, f"{(diff != 0).mean():.2e} boundary flips"
    # the numpy twin in the reference is the same math again
    ref_np = ref_utils.mu_law_numpy(w.astype(np.float64))
    assert np.abs(ref_np - got).max() <= 1.0


def test_inv_mu_law_matches_reference_code(ref_utils):
    q = np.arange(-128, 128, dtype=np.float32)
    ref = np.asarray(ref_utils.inv_mu_law(tf.constant(q)))
    got = np.asarray(sig.inv_mu_law(q))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
    assert got[128] == 0.0  # 0 -> 0 exactly (reference utils.py:121)
    ref_np = ref_utils.inv_mu_law_numpy(q)
    np.testing.assert_allclose(got, ref_np, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("quant_chann", [256, 65536])
def test_cast_quantize_matches_reference_code(ref_utils, quant_chann):
    w = _wav(20000, seed=1)
    ref = np.asarray(ref_utils.cast_quantize(tf.constant(w), quant_chann))
    got = np.asarray(sig.cast_quantize(w, quant_chann))
    np.testing.assert_array_equal(got, ref)
    deq_ref = np.asarray(ref_utils.inv_cast_quantize(tf.constant(ref), quant_chann))
    deq_got = np.asarray(sig.inv_cast_quantize(got, quant_chann))
    np.testing.assert_allclose(deq_got, deq_ref, rtol=0, atol=0)


def test_encode_signal_matches_reference_composition(ref_utils):
    """Wavenet.encode_signal semantics (reference wavenet/wavenet.py:157-178)
    rebuilt from the reference's own primitive ops."""
    w = _wav(7680, seed=2)
    for cfg_path in CONFIGS:
        cfg = config_lib.load_config(cfg_path)
        qc = 256 if cfg.use_mu_law else 65536
        enc = {k: np.asarray(v) for k, v in sig.encode_signal(
            w, use_mu_law=cfg.use_mu_law, quant_chann=qc).items()}
        if cfg.use_mu_law:
            x_q = np.asarray(ref_utils.mu_law(tf.constant(w)))
            want_scaled = x_q / (qc / 2)
            want_cate = x_q.astype(np.int32) + qc // 2
        else:
            x_q = np.asarray(ref_utils.cast_quantize(tf.constant(w), qc))
            want_scaled = w
            want_cate = x_q + qc // 2
        # tolerate the same <=1-bin floor boundary flips as mu_law above
        assert np.abs(enc["cate_targets"] - want_cate).max() <= 1
        flips = enc["cate_targets"] != want_cate
        assert flips.mean() < 1e-3
        np.testing.assert_allclose(
            enc["wav_scaled"][~flips], want_scaled[~flips], rtol=1e-6, atol=1e-7
        )


def test_reduce_std_matches_reference_code(ref_utils):
    x = np.random.default_rng(3).normal(size=(4, 257)).astype(np.float32)
    ref = np.asarray(ref_utils.reduce_std(tf.constant(x), axis=1))
    got = x.std(axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Oracle 2: tf.signal.stft for the power-loss convention.
# ---------------------------------------------------------------------------


def _ref_tf_stft(y):
    """Literal mirror of reference auxilaries/mel_extractor.py:111-121
    (tf.contrib.signal.stft is tf.signal.stft in TF2)."""
    p = stft_ops.MEL_PARAMS
    frame_shift = int(p.frame_shift_ms * p.sample_rate / 1000)
    frame_length = int(p.frame_length_ms * p.sample_rate / 1000)
    fft_length = int(2 * (p.num_freq - 1))
    return tf.signal.stft(
        y,
        frame_length=frame_length,
        frame_step=frame_shift,
        fft_length=fft_length,
        pad_end=True,
    )


@pytest.mark.parametrize("length", [7680, 7000])
def test_stft_pad_end_matches_tf_signal(length):
    y = _wav(length, seed=4).reshape(1, -1)
    ref = np.asarray(_ref_tf_stft(tf.constant(y)))
    got = np.asarray(stft_ops.stft_pad_end(y))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got.real, ref.real, atol=2e-4 * scale, rtol=0)
    np.testing.assert_allclose(got.imag, ref.imag, atol=2e-4 * scale, rtol=0)
    # the power loss consumes |STFT| (reference parallel_wavenet.py:459-479)
    np.testing.assert_allclose(
        np.abs(got), np.abs(ref), atol=2e-4 * scale, rtol=0
    )


def test_tf_spectrogram_composition_matches():
    """Reference tf_spectrogram (mel_extractor.py:124-128): amp_to_db −
    ref_level_db, then clip-normalize."""
    p = stft_ops.MEL_PARAMS
    y = _wav(7680, seed=5).reshape(1, -1)
    d = _ref_tf_stft(tf.constant(y))
    s_ref = 20.0 * (tf.math.log(tf.maximum(p.min_amp, tf.abs(d))) / np.log(10.0))
    ns_ref = np.asarray(
        tf.clip_by_value(
            ((s_ref - p.ref_level_db) - p.min_level_db) / -p.min_level_db, 0.0, 1.0
        )
    )
    got_abs = np.abs(np.asarray(stft_ops.stft_pad_end(y)))
    got = np.asarray(
        stft_ops.db_normalize(stft_ops.amp_to_db(got_abs) - p.ref_level_db)
    )
    np.testing.assert_allclose(got, ns_ref, atol=5e-4, rtol=0)


# ---------------------------------------------------------------------------
# Oracle 3: independent numpy/scipy STFT for the librosa convention.
# ---------------------------------------------------------------------------


def _librosa_stft_oracle(y):
    """librosa.stft semantics (reference mel_extractor.py:65-69) built from
    independent primitives: scipy's hann window, numpy's real FFT, and the
    documented center=True reflect padding."""
    from scipy.signal import get_window

    p = stft_ops.MEL_PARAMS
    n_fft, hop, win = p.n_fft, p.hop_length, p.win_length
    window = get_window("hann", win, fftbins=True)
    # librosa pads the window symmetrically to n_fft
    lpad = (n_fft - win) // 2
    window = np.pad(window, (lpad, n_fft - win - lpad))
    y_p = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + len(y) // hop
    out = np.empty((n_frames, n_fft // 2 + 1), np.complex128)
    for t in range(n_frames):
        out[t] = np.fft.rfft(y_p[t * hop : t * hop + n_fft] * window)
    return out


def test_stft_center_matches_numpy_fft_oracle():
    y = _wav(7680, seed=6)
    ref = _librosa_stft_oracle(y.astype(np.float64))
    got = np.asarray(stft_ops.stft_center(y[None]))[0]
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.abs(got), np.abs(ref), atol=2e-4 * scale, rtol=0)
    np.testing.assert_allclose(got.real, ref.real, atol=2e-4 * scale, rtol=0)
    np.testing.assert_allclose(got.imag, ref.imag, atol=2e-4 * scale, rtol=0)


# ---------------------------------------------------------------------------
# Oracle 4: Slaney mel filterbank, re-derived scalar-wise from the formula.
# ---------------------------------------------------------------------------


def _slaney_hz_to_mel(f):
    # Slaney's Auditory Toolbox scale: linear below 1 kHz (200/3 Hz per mel),
    # logarithmic above with step 6.4^(1/27) per mel.
    if f < 1000.0:
        return f / (200.0 / 3.0)
    return 15.0 + 27.0 * np.log(f / 1000.0) / np.log(6.4)


def _slaney_mel_to_hz(m):
    if m < 15.0:
        return m * (200.0 / 3.0)
    return 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0))


def _mel_filterbank_oracle(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with defaults
    (htk=False -> Slaney scale, norm='slaney' -> 2/bandwidth area norm),
    written as direct scalar loops over the published formula."""
    n_bins = n_fft // 2 + 1
    fft_hz = [i * sr / n_fft for i in range(n_bins)]
    lo, hi = _slaney_hz_to_mel(fmin), _slaney_hz_to_mel(fmax)
    centers = [
        _slaney_mel_to_hz(lo + (hi - lo) * i / (n_mels + 1)) for i in range(n_mels + 2)
    ]
    out = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        f_lo, f_c, f_hi = centers[m], centers[m + 1], centers[m + 2]
        for k in range(n_bins):
            f = fft_hz[k]
            up = (f - f_lo) / (f_c - f_lo)
            down = (f_hi - f) / (f_hi - f_c)
            w = max(0.0, min(up, down))
            out[m, k] = w * 2.0 / (f_hi - f_lo)
    return out


def test_mel_filterbank_matches_slaney_formula():
    p = stft_ops.MEL_PARAMS
    ref = _mel_filterbank_oracle(p.sample_rate, p.n_fft, p.num_mel, p.mel_fmin, p.mel_fmax)
    got = stft_ops.mel_filterbank()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-8, rtol=1e-5)
    # every filter is non-empty at this (sr, n_fft, n_mels) combination
    assert (ref.sum(axis=1) > 0).all()


def test_melspectrogram_matches_independent_oracle():
    """Full reference mel chain (mel_extractor.py:31-35): |STFT| -> mel ->
    amp_to_db -> clip-normalize, rebuilt entirely from oracle pieces."""
    p = stft_ops.MEL_PARAMS
    y = _wav(7680, seed=7)
    spec = np.abs(_librosa_stft_oracle(y.astype(np.float64)))  # [T, F]
    basis = _mel_filterbank_oracle(p.sample_rate, p.n_fft, p.num_mel, p.mel_fmin, p.mel_fmax)
    mel = spec @ basis.T
    db = 20.0 * np.log10(np.maximum(p.min_amp, mel))
    ref = np.clip((db - p.min_level_db) / -p.min_level_db, 0.0, 1.0)

    got_dev = np.asarray(stft_ops.melspectrogram(y[None]))[0]
    got_np = stft_ops.melspectrogram_np(y[None])[0]
    np.testing.assert_allclose(got_dev, ref, atol=2e-4, rtol=0)
    np.testing.assert_allclose(got_np, ref, atol=2e-4, rtol=0)


# ---------------------------------------------------------------------------
# Real-speech inputs: the reference ships real LJSpeech audio
# (tests/test_data/test.wav — its own tests load exactly this file,
# reference tests/test_wavenet.py) — run the same oracles on real speech,
# whose spectral structure stresses the mel path harder than noise.
# ---------------------------------------------------------------------------

REF_WAV = os.path.join(REF, "tests", "test_data", "test.wav")


@pytest.fixture(scope="module")
def real_speech():
    import wave as wave_mod

    if not os.path.exists(REF_WAV):
        pytest.skip("reference test.wav not present")
    w = wave_mod.open(REF_WAV)
    assert w.getframerate() == 16000 and w.getnchannels() == 1
    data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    return (data.astype(np.float32) / 32768.0)[: 4 * 7680]


def test_mu_law_roundtrip_real_speech(ref_utils, real_speech):
    w = real_speech
    ref_q = np.asarray(ref_utils.mu_law(tf.constant(w)))
    got_q = np.asarray(sig.mu_law(w))
    assert np.abs(ref_q - got_q).max() <= 1.0
    assert (ref_q != got_q).mean() < 1e-3
    # decode chain parity on the reference's own quantization
    ref_dec = ref_utils.inv_mu_law_numpy(ref_q)
    got_dec = np.asarray(sig.inv_mu_law(ref_q))
    np.testing.assert_allclose(got_dec, ref_dec, rtol=1e-5, atol=1e-7)
    # round-trip error bounded by one mu-law bin
    assert np.abs(got_dec - w).max() < 0.05


def test_melspectrogram_real_speech_matches_oracle(real_speech):
    p = stft_ops.MEL_PARAMS
    y = real_speech[:7680]
    spec = np.abs(_librosa_stft_oracle(y.astype(np.float64)))
    basis = _mel_filterbank_oracle(p.sample_rate, p.n_fft, p.num_mel, p.mel_fmin, p.mel_fmax)
    db = 20.0 * np.log10(np.maximum(p.min_amp, spec @ basis.T))
    ref = np.clip((db - p.min_level_db) / -p.min_level_db, 0.0, 1.0)
    got = stft_ops.melspectrogram_np(y[None])[0]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)


def test_stft_pad_end_real_speech_matches_tf(real_speech):
    y = real_speech[None, :7680]
    ref = np.abs(np.asarray(_ref_tf_stft(tf.constant(y))))
    got = np.abs(np.asarray(stft_ops.stft_pad_end(y)))
    np.testing.assert_allclose(got, ref, atol=2e-4 * ref.max(), rtol=0)
