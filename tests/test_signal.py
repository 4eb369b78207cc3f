"""Quantizer/companding round-trip tests (model: reference
tests/test_clip_quant_scale.py)."""

import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.ops import signal as sig


def test_mu_law_range_and_int_valued():
    x = np.linspace(-1.0, 1.0 - 1e-6, 4001).astype(np.float32)
    y = np.asarray(sig.mu_law(x))
    assert y.min() >= -128 and y.max() <= 127
    np.testing.assert_array_equal(y, np.floor(y))


def test_mu_law_matches_numpy_formula():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, 1000).astype(np.float32)
    mu = 255
    expected = np.floor(np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu) * 128)
    np.testing.assert_allclose(np.asarray(sig.mu_law(x)), expected, atol=1e-5)


def test_inv_mu_law_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.uniform(-0.99, 0.99, 2000).astype(np.float32)
    rec = np.asarray(sig.inv_mu_law(sig.mu_law(x)))
    # mu-law is 8-bit: reconstruction error bounded by companded bin width
    assert np.abs(rec - x).max() < 0.04
    # fine near zero
    small = np.abs(x) < 0.01
    assert np.abs(rec[small] - x[small]).max() < 1e-3


def test_inv_mu_law_zero_maps_to_zero():
    assert float(sig.inv_mu_law(jnp.array([0.0]))[0]) == 0.0


def test_cast_quantize_floor_semantics():
    x = np.array([-1.0, -0.5, -1e-9, 0.0, 1e-9, 0.5, 1.0 - 2 / 65536], np.float32)
    q = np.asarray(sig.cast_quantize(x, 2**16))
    expected = np.floor(x * 32768).astype(np.int32)
    np.testing.assert_array_equal(q, expected)
    back = np.asarray(sig.inv_cast_quantize(q, 2**16))
    assert np.abs(back - x).max() <= 1.0 / 32768


def test_encode_signal_mu_law():
    x = np.array([[-0.5, 0.0, 0.25, 0.9]], np.float32)
    enc = sig.encode_signal(x, use_mu_law=True, quant_chann=256)
    cate = np.asarray(enc["cate_targets"])
    assert cate.min() >= 0 and cate.max() < 256
    np.testing.assert_allclose(
        np.asarray(enc["wav_scaled"]), np.asarray(sig.mu_law(x)) / 128.0, atol=1e-6
    )
    np.testing.assert_allclose(enc["real_targets"], enc["wav_scaled"])


def test_encode_signal_raw16():
    x = np.array([[-0.5, 0.0, 0.25, 0.9]], np.float32)
    enc = sig.encode_signal(x, use_mu_law=False, quant_chann=2**16)
    np.testing.assert_allclose(np.asarray(enc["wav_scaled"]), x)
    cate = np.asarray(enc["cate_targets"])
    assert cate.min() >= 0 and cate.max() < 2**16
