"""Ops-layer tests: causal/dilated conv semantics, transposed-conv adjoint
property, weight-norm data-dependent init."""

import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.ops import conv


def _naive_causal_dilated(x, w, b, dilation):
    """y[t] = sum_k w[k] x[t - (fl-1-k)*d] — the reference's dilated causal
    conv written as a direct sum (masked.py:160-232 semantics)."""
    B, T, Cin = x.shape
    fl, _, Cout = w.shape
    y = np.zeros((B, T, Cout), np.float64)
    for t in range(T):
        for k in range(fl):
            src = t - (fl - 1 - k) * dilation
            if src >= 0:
                y[:, t] += x[:, src] @ w[k]
    return y + b


def test_conv1d_matches_naive_dilated():
    rng = np.random.RandomState(0)
    for dilation in (1, 2, 4):
        x = rng.randn(2, 16, 3).astype(np.float32)
        p = conv.conv1d_init(jax.random.PRNGKey(0), 3, 5, 3)
        y = np.asarray(conv.conv1d(p, x, dilation=dilation))
        want = _naive_causal_dilated(x, np.asarray(p["w"]), np.asarray(p["b"]), dilation)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


def test_conv1d_is_causal():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 4).astype(np.float32)
    p = conv.conv1d_init(jax.random.PRNGKey(1), 4, 4, 3)
    y0 = np.asarray(conv.conv1d(p, x, dilation=8))
    x2 = x.copy()
    x2[:, 40:, :] += 100.0  # perturb the future
    y1 = np.asarray(conv.conv1d(p, x2, dilation=8))
    np.testing.assert_allclose(y0[:, :40], y1[:, :40], rtol=1e-5, atol=1e-5)
    assert np.abs(y0[:, 40:] - y1[:, 40:]).max() > 1.0


def test_shift_right():
    x = jnp.arange(6.0).reshape(1, 6, 1)
    y = conv.shift_right(x)
    np.testing.assert_allclose(np.asarray(y)[0, :, 0], [0, 0, 1, 2, 3, 4])


def test_trans_conv1d_shape_and_adjoint():
    """trans_conv1d must be the adjoint of the stride-s SAME forward conv
    with the same kernel: <conv(y), x> == <y, trans_conv(x)>."""
    rng = np.random.RandomState(2)
    key = jax.random.PRNGKey(2)
    for fl, s in ((40, 10), (80, 20)):
        L = 8
        x = rng.randn(1, L, 3).astype(np.float32)  # low-rate input
        p = conv.conv1d_init(key, 3, 5, fl)
        p0 = {"w": p["w"], "b": jnp.zeros(5)}
        up = np.asarray(conv.trans_conv1d(p0, x, stride=s))
        assert up.shape == (1, L * s, 5)

        # forward: stride-s conv [1, L*s, 5] -> [1, L, 3].  The adjoint of our
        # trans conv is the strided conv with the kernel spatially flipped and
        # in/out swapped, TF-SAME padding split.
        y = rng.randn(1, L * s, 5).astype(np.float32)
        w_fwd = jnp.transpose(p0["w"][::-1], (0, 2, 1))  # [fl, 5, 3]
        pad_left = (fl - s) // 2
        down = jax.lax.conv_general_dilated(
            jnp.asarray(y),
            w_fwd,
            window_strides=(s,),
            padding=[(pad_left, fl - s - pad_left)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        lhs = float(jnp.sum(down * x))
        rhs = float(jnp.sum(jnp.asarray(y) * jnp.asarray(up)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_resize_conv1d_shape():
    x = jnp.ones((2, 8, 3))
    p = conv.conv1d_init(jax.random.PRNGKey(3), 3, 5, 40)
    y = conv.resize_conv1d(p, x, stride=10)
    assert y.shape == (2, 80, 5)


def test_weight_norm_effective_kernel():
    p = conv.conv1d_init(jax.random.PRNGKey(4), 6, 4, 3, use_weight_norm=True)
    w = np.asarray(conv.effective_kernel(p))
    norms = np.sqrt((w**2).sum(axis=(0, 1)))
    np.testing.assert_allclose(norms, np.asarray(p["g"]), rtol=1e-5)
    # at init, weight-norm kernel equals the raw init kernel
    np.testing.assert_allclose(w, np.asarray(p["v"]), rtol=1e-5, atol=1e-6)


def test_ddi_normalizes_output():
    rng = np.random.RandomState(5)
    x = (3.0 * rng.randn(4, 64, 8)).astype(np.float32)
    p = conv.conv1d_init(jax.random.PRNGKey(5), 8, 16, 3, use_weight_norm=True)
    y, new_p = conv.conv1d_ddi(p, x)
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1)), conv.WN_INIT_SCALE, rtol=1e-3)
    # the closed-form rescaled output must equal re-running with new params
    y_re = np.asarray(conv.conv1d(new_p, x))
    np.testing.assert_allclose(y, y_re, rtol=1e-3, atol=1e-4)


def test_ddi_trans_conv():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 8, 3).astype(np.float32)
    p = conv.conv1d_init(jax.random.PRNGKey(6), 3, 5, 40, use_weight_norm=True)
    y, new_p = conv.trans_conv1d_ddi(p, x, stride=10)
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1)), 1.0, rtol=1e-3)
    y_re = np.asarray(conv.trans_conv1d(new_p, x, stride=10))
    np.testing.assert_allclose(y, y_re, rtol=1e-3, atol=1e-4)


def test_bf16_conv_close_to_f32():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 32, 16).astype(np.float32)
    p = conv.conv1d_init(jax.random.PRNGKey(7), 16, 16, 3)
    y32 = np.asarray(conv.conv1d(p, x))
    y16 = np.asarray(conv.conv1d(p, x, dtype=jnp.bfloat16))
    assert y16.dtype == np.float32  # f32 accumulation
    np.testing.assert_allclose(y32, y16, rtol=0.05, atol=0.05)
