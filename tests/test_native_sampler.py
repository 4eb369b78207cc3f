"""Native C++ batch sampler (data/native/sampler.cpp) vs pure-numpy parity.

Role parity target: the reference's input gather runs in TF's C++ runtime
(TFRecordReader + queue kernels, auxilaries/reader.py:83-106); here the
native path must be a bit-identical drop-in for the numpy gather, including
the seeded RNG draw sequence (determinism is part of the loader contract,
SURVEY.md §5 hard part 6).
"""

import numpy as np
import pytest

from nsynth_wavenet_tpu.data import dataset as ds_lib
from nsynth_wavenet_tpu.data.native import native as native_mod


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_ds")
    rng = np.random.default_rng(0)
    # mixed lengths: shorter than, equal to, and longer than the crop
    waves = [rng.standard_normal(n).astype(np.float32) for n in (500, 1000, 3000, 9000)]
    ids = [f"u{i}" for i in range(len(waves))]
    ds_lib.build_dataset_from_arrays(waves, ids, str(d))
    return str(d)


def test_native_builds_and_loads():
    assert native_mod.load() is not None, "g++ is in this image; build must work"


def test_crop_batch_native_matches_numpy(built):
    crop = 1000
    a = ds_lib.Dataset(built, use_native=True)
    b = ds_lib.Dataset(built, use_native=False)
    assert a._native and not b._native
    for seed in range(3):
        out_a = a.random_crop_batch(np.random.default_rng(seed), 16, crop)
        out_b = b.random_crop_batch(np.random.default_rng(seed), 16, crop)
        np.testing.assert_array_equal(out_a, out_b)
    # short records are zero-padded past their end
    out = a.random_crop_batch(np.random.default_rng(0), 64, 2000)
    assert out.shape == (64, 2000)
    assert np.isfinite(out).all()


def test_crop_batch_deterministic_per_seed(built):
    a = ds_lib.Dataset(built, use_native=True)
    x1 = a.random_crop_batch(np.random.default_rng(7), 8, 640)
    x2 = a.random_crop_batch(np.random.default_rng(7), 8, 640)
    np.testing.assert_array_equal(x1, x2)


def test_crop_gather_threaded_matches_single(built):
    a = ds_lib.Dataset(built, use_native=True)
    rng = np.random.default_rng(3)
    idx = rng.integers(0, len(a), size=32).astype(np.int64)
    starts = np.zeros(32, np.int64)
    out1 = np.empty((32, 800), np.float32)
    out8 = np.empty((32, 800), np.float32)
    assert native_mod.crop_gather(
        a.data, a._offsets, a._lengths, idx, starts, 800, out1, n_threads=0
    )
    assert native_mod.crop_gather(
        a.data, a._offsets, a._lengths, idx, starts, 800, out8, n_threads=8
    )
    np.testing.assert_array_equal(out1, out8)


def test_init_batch_and_sequential_native_match_numpy(built):
    a = ds_lib.Dataset(built, use_native=True)
    b = ds_lib.Dataset(built, use_native=False)
    np.testing.assert_array_equal(
        a.get_init_batch(16, 1200, seed=5), b.get_init_batch(16, 1200, seed=5)
    )
    for xa, xb in zip(a.sequential_batches(3, 2000), b.sequential_batches(3, 2000)):
        np.testing.assert_array_equal(xa, xb)


def test_crop_gather_defensive_bad_index(built):
    a = ds_lib.Dataset(built, use_native=True)
    idx = np.array([len(a) + 5, -1], np.int64)  # out of range -> silence
    starts = np.zeros(2, np.int64)
    out = np.full((2, 100), 7.0, np.float32)
    assert native_mod.crop_gather(
        a.data, a._offsets, a._lengths, idx, starts, 100, out, n_threads=0
    )
    np.testing.assert_array_equal(out, np.zeros((2, 100), np.float32))
