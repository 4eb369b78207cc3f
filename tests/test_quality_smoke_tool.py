"""CPU coverage for tools/quality_smoke.py plumbing: the corpus builders'
config dicts must load through the typed config layer, and the student-log
parser must produce windowed means."""

import importlib.util
import json
import os
import sys

import numpy as np

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "quality_smoke.py")
spec = importlib.util.spec_from_file_location("quality_smoke", _TOOL)
qs = importlib.util.module_from_spec(spec)
sys.modules["quality_smoke"] = qs
spec.loader.exec_module(qs)

from nsynth_wavenet_tpu import config as config_lib  # noqa: E402


def _load_cfg(tmp_path, d):
    p = os.path.join(tmp_path, "cfg.json")
    with open(p, "wt") as f:
        json.dump(d, f)
    return config_lib.load_config(p)


def test_smoke_configs_load(tmp_path):
    tmp = str(tmp_path)
    te = _load_cfg(tmp, qs.TEACHER_CFG)
    assert isinstance(te, config_lib.WavenetConfig)
    assert te.loss_type == "ce" and te.use_mu_law

    for cfg_dict, loss in ((qs.GAUSS_TEACHER_CFG, "gauss"), (qs.MOL_TEACHER_CFG, "mol")):
        c = _load_cfg(tmp, cfg_dict)
        assert isinstance(c, config_lib.WavenetConfig)
        assert c.loss_type == loss and not c.use_mu_law

    st = _load_cfg(tmp, qs.STUDENT_CFG)
    assert isinstance(st, config_lib.ParallelWavenetConfig)
    assert st.loss_type == "gauss"
    # the mol pairing overrides applied by main_student
    st_mol = _load_cfg(tmp, dict(qs.STUDENT_CFG, loss_type="logistic", num_samples=100))
    assert st_mol.loss_type == "logistic" and st_mol.num_samples == 100


def test_parse_student_log_windowed(tmp_path):
    run = str(tmp_path)
    lines = []
    # noisy decreasing series: head mean ~ (10, 1.0, 5.0), tail ~ (1, 0.1, 0.5)
    rng = np.random.default_rng(0)
    for i in range(40):
        base = 10.0 if i < 20 else 1.0
        lines.append(
            f"step {100 * (i + 1)} loss {base + rng.uniform(-.2, .2):.4f} "
            f"kl {base / 10 + rng.uniform(-.02, .02):.4f} "
            f"power {base / 2 + rng.uniform(-.1, .1):.4f} (50.0 steps/s)"
        )
    with open(os.path.join(run, "train.log"), "wt") as f:
        f.write("\n".join(lines))
    head, tail = qs.parse_student_log(run, window=10)
    assert abs(head[0] - 10.0) < 0.5 and abs(tail[0] - 1.0) < 0.5
    assert abs(head[1] - 1.0) < 0.1 and abs(tail[1] - 0.1) < 0.1
    assert abs(head[2] - 5.0) < 0.3 and abs(tail[2] - 0.5) < 0.3
    # no hpt field in these lines -> NaN means
    assert np.isnan(head[3]) and np.isnan(tail[3])

    # and with the mol pairing's hpt field present
    with open(os.path.join(run, "train.log"), "wt") as f:
        f.write("step 100 loss 11.0 kl 10.9 power 5.0 hpt 8.25 (50.0 steps/s)\n"
                "step 200 loss 10.0 kl 10.5 power 4.0 hpt 7.75 (50.0 steps/s)\n")
    head, tail = qs.parse_student_log(run, window=1)
    assert head[3] == 8.25 and tail[3] == 7.75


def test_real_corpus_plumbing(tmp_path):
    """main_real's corpus construction: the reference's real clip loads,
    the held-out tail is disjoint from the training segments, and the
    training segments cover the non-tail prefix."""
    import pytest

    if not os.path.exists(qs.REF_WAV):
        pytest.skip("reference test.wav not present")
    from nsynth_wavenet_tpu.data import dataset as data_lib

    wav = qs.load_real_wav()
    sr = 16000
    assert wav.ndim == 1 and len(wav) > 9 * sr
    assert np.isfinite(wav).all() and 0.3 < np.abs(wav).max() <= 1.0
    train = wav[:-sr]
    n_seg = 6
    seg = len(train) // n_seg
    data_lib.build_dataset_from_arrays(
        [train[i * seg : (i + 1) * seg] for i in range(n_seg)],
        [f"lj_{i}" for i in range(n_seg)],
        str(tmp_path),
    )
    ds = data_lib.Dataset(str(tmp_path))
    batch = ds.random_crop_batch(np.random.default_rng(0), 4, 3840)
    assert batch.shape == (4, 3840)
    assert np.isfinite(batch).all()


def test_mel_track_corr(tmp_path):
    """The shared tracking metric must score self-consistent audio as
    matched > mismatched, and write the clips when asked."""
    from nsynth_wavenet_tpu.ops import stft

    sr = 16000
    t = np.arange(sr) / sr
    wavs = np.stack(
        [0.4 * np.sin(2 * np.pi * f0 * t) for f0 in (150.0, 420.0, 1100.0)]
    ).astype(np.float32)
    mels = stft.melspectrogram_np(wavs)
    m, mm = qs.mel_track_corr(wavs, mels, sr, out_dir=str(tmp_path), wav_prefix="g")
    assert m > 0.95 and m > mm + 0.2
    for i in range(3):
        assert os.path.exists(os.path.join(str(tmp_path), f"g_{i}.wav"))


def test_mel_track_spectral_metrics():
    """The spectral metrics (RMS mel distance, MCD) must be ~0 for
    self-comparison, strictly ordered matched < mismatched, and the MCD
    must be invariant to a constant gain shift confined to coefficient 0
    (energy), which MCD excludes by construction."""
    from nsynth_wavenet_tpu.ops import stft

    sr = 16000
    t = np.arange(sr) / sr
    wavs = np.stack(
        [0.4 * np.sin(2 * np.pi * f0 * t) for f0 in (150.0, 420.0, 1100.0)]
    ).astype(np.float32)
    mels = stft.melspectrogram_np(wavs)
    mt = qs.mel_track_metrics(wavs, mels, sr)
    for metric in ("msd", "mcd"):
        matched, mismatched = mt[metric]
        assert matched < 0.25 * mismatched, (metric, matched, mismatched)
    # self-MCD is exactly 0; a flat dB offset moves only coefficient 0
    a = np.asarray(mels[0])
    assert qs._mcd(a, a) == 0.0
    assert qs._mcd(a, a + 0.07) < 1e-2  # fp noise only, vs tens of dB mismatched
