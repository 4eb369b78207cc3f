"""On-device STFT / mel-spectrogram frontend.

The reference computes mel features on the host through a ``tf.py_func`` into
librosa (auxilaries/mel_extractor.py:47-53, reader.py:90), crossing
Python<->runtime for every example.  Here the whole frontend is pure jnp and
runs inside the jitted train/eval programs on the TPU (XLA lowers rfft to its
native FFT).

Two STFT conventions are reproduced:

  * ``stft_center``     — librosa semantics (center=True, reflect padding,
    hann(win) zero-padded centered into n_fft frames); used for mel features
    (reference auxilaries/mel_extractor.py:65-69).
  * ``stft_pad_end``    — tf.contrib.signal.stft semantics (no centering,
    pad_end=True, frames zero-padded on the right to fft_length); used by the
    student's power loss (reference auxilaries/mel_extractor.py:111-121).

The mel filterbank matches librosa.filters.mel defaults (Slaney scale +
Slaney area normalization), reference auxilaries/mel_extractor.py:79-82.
"""

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelParams:
    """Frontend constants, reference auxilaries/mel_extractor.py:14-28."""

    sample_rate: int = 16000
    num_freq: int = 1025
    num_mel: int = 80
    frame_shift_ms: float = 12.5
    frame_length_ms: float = 50.0
    min_level_db: float = -140.0
    ref_level_db: float = 40.0
    mel_fmin: float = 125.0
    mel_fmax: float = 7600.0
    min_amp: float = 1e-5

    @property
    def n_fft(self) -> int:
        return (self.num_freq - 1) * 2

    @property
    def hop_length(self) -> int:
        return int(self.frame_shift_ms * self.sample_rate / 1000.0)

    @property
    def win_length(self) -> int:
        return int(self.frame_length_ms * self.sample_rate / 1000.0)


MEL_PARAMS = MelParams()
# Index of the 3 kHz bin; frequencies below it get priority weighting in the
# student's power loss (reference auxilaries/mel_extractor.py:27).
PRIORITY_FREQ = int(3000 / (MEL_PARAMS.sample_rate * 0.5) * MEL_PARAMS.num_freq)
FRAME_SHIFT = MEL_PARAMS.hop_length


def hann_window(win_length: int) -> np.ndarray:
    """Periodic hann window (what librosa and tf.signal both use)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_slaney(hz):
    hz = np.asarray(hz, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = hz / f_sp
    log_region = hz >= min_log_hz
    mel = np.where(
        log_region, min_log_mel + np.log(np.maximum(hz, min_log_hz) / min_log_hz) / logstep, mel
    )
    return mel


def _mel_to_hz_slaney(mel):
    mel = np.asarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    hz = mel * f_sp
    log_region = mel >= min_log_mel
    hz = np.where(log_region, min_log_hz * np.exp(logstep * (mel - min_log_mel)), hz)
    return hz


@lru_cache(maxsize=4)
def mel_filterbank(
    sample_rate: int = MEL_PARAMS.sample_rate,
    n_fft: int = MEL_PARAMS.n_fft,
    num_mel: int = MEL_PARAMS.num_mel,
    fmin: float = MEL_PARAMS.mel_fmin,
    fmax: float = MEL_PARAMS.mel_fmax,
) -> np.ndarray:
    """[num_mel, n_fft//2 + 1] Slaney-normalized triangular mel filterbank."""
    fftfreqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), num_mel + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)  # [num_mel + 2]

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]  # [num_mel + 2, F]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization.
    enorm = 2.0 / (hz_pts[2 : num_mel + 2] - hz_pts[:num_mel])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def _frame(x: jnp.ndarray, frame_length: int, hop: int, n_frames: int) -> jnp.ndarray:
    """Gather overlapping frames: [..., L] -> [..., n_frames, frame_length]."""
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


# The on-device rFFT is expressed as two matmuls against fixed cos/sin DFT
# matrices instead of jnp.fft.rfft: at n_fft=2048 the O(n^2) matmul is
# negligible work for the MXU, while XLA's FFT lowering on TPU compiles
# ~10-100x slower and runs no faster at this size.
@lru_cache(maxsize=2)
def _dft_matrices(n_fft: int):
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _rfft(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """rfft of [..., n_fft] real frames -> complex [..., n_fft//2 + 1]."""
    cos_m, sin_m = _dft_matrices(n_fft)
    real = frames @ cos_m
    imag = frames @ sin_m
    return jax.lax.complex(real, imag)


def stft_center(y: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    """librosa-style STFT.  y: [..., L] -> complex [..., n_frames, num_freq].

    n_frames = 1 + L // hop.  Window is hann(win_length) centered in an
    n_fft-long frame; signal reflect-padded by n_fft//2 on both sides.
    """
    n_fft, hop, win = p.n_fft, p.hop_length, p.win_length
    length = y.shape[-1]
    n_frames = 1 + length // hop

    pad = n_fft // 2
    y_padded = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")

    window = np.zeros(n_fft, dtype=np.float32)
    lpad = (n_fft - win) // 2
    window[lpad : lpad + win] = hann_window(win)

    frames = _frame(y_padded, n_fft, hop, n_frames)  # [..., n_frames, n_fft]
    return _rfft(frames * window, n_fft)


def stft_pad_end(y: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    """tf.signal.stft(pad_end=True) semantics for the power loss.

    y: [..., L] -> complex [..., n_frames, num_freq], n_frames = ceil(L/hop).
    Frames are win_length long, hann-windowed, right-padded to n_fft.
    """
    n_fft, hop, win = p.n_fft, p.hop_length, p.win_length
    length = y.shape[-1]
    n_frames = -(-length // hop)  # ceil
    full_len = (n_frames - 1) * hop + win
    pad_amt = max(0, full_len - length)
    y_padded = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad_amt)])

    frames = _frame(y_padded, win, hop, n_frames)  # [..., n_frames, win]
    frames = jnp.pad(frames * hann_window(win), [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win)])
    return _rfft(frames, n_fft)


def amp_to_db(x: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(p.min_amp, x))


def db_normalize(s: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    return jnp.clip((s - p.min_level_db) / -p.min_level_db, 0.0, 1.0)


def melspectrogram(y: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    """Normalized-dB mel spectrogram: [..., L] -> [..., n_frames, num_mel].

    Matches the reference librosa path (auxilaries/mel_extractor.py:31-35):
    |STFT| -> mel -> amp_to_db -> clip-normalize.  (No ref_level_db
    subtraction, exactly like the reference ``melspectrogram``.)
    """
    spec = jnp.abs(stft_center(y, p))  # [..., n_frames, F]
    basis = mel_filterbank(p.sample_rate, p.n_fft, p.num_mel, p.mel_fmin, p.mel_fmax)
    mel = spec @ basis.T  # [..., n_frames, num_mel]
    return db_normalize(amp_to_db(mel, p), p)


def melspec_from_spec(spec: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    """Apply the mel filterbank to a magnitude spectrogram [..., F]."""
    basis = mel_filterbank(p.sample_rate, p.n_fft, p.num_mel, p.mel_fmin, p.mel_fmax)
    return spec @ basis.T


def melspectrogram2(y: jnp.ndarray, p: MelParams = MEL_PARAMS) -> jnp.ndarray:
    """The reference's alternate "new" mel extractor (tf_melspectrogram2,
    auxilaries/mel_extractor.py:165-169, selected by USE_NEW_MEL_EXTRACTOR):
    pad-end STFT (tf.signal convention) instead of centered, then
    mel -> amp_to_db -> clip-normalize."""
    spec = jnp.abs(stft_pad_end(y, p))
    return db_normalize(amp_to_db(melspec_from_spec(spec, p), p), p)


def num_mel_frames(length: int, p: MelParams = MEL_PARAMS) -> int:
    """Frame count produced by :func:`melspectrogram` for a signal length."""
    return 1 + length // p.hop_length


def melspectrogram_np(y: np.ndarray, p: MelParams = MEL_PARAMS) -> np.ndarray:
    """Pure-numpy twin of :func:`melspectrogram` for host-side paths (eval
    file loading, init batches) where spinning up a device compile for a
    one-off mel is wasteful.  Same conventions, same output."""
    y = np.asarray(y, np.float32)
    n_fft, hop, win = p.n_fft, p.hop_length, p.win_length
    length = y.shape[-1]
    n_frames = 1 + length // hop

    pad = n_fft // 2
    y_padded = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    window = np.zeros(n_fft, dtype=np.float32)
    lpad = (n_fft - win) // 2
    window[lpad : lpad + win] = hann_window(win)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y_padded[..., idx] * window
    spec = np.abs(np.fft.rfft(frames, n=n_fft)).astype(np.float32)

    basis = mel_filterbank(p.sample_rate, p.n_fft, p.num_mel, p.mel_fmin, p.mel_fmax)
    mel = spec @ basis.T
    db = 20.0 * np.log10(np.maximum(p.min_amp, mel))
    return np.clip((db - p.min_level_db) / -p.min_level_db, 0.0, 1.0).astype(np.float32)


melspectrogram_jit = jax.jit(melspectrogram, static_argnums=())
