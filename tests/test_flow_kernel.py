"""Interpret-mode parity for the fused IAF flow-stack kernel prototype
(ops/flow_kernel.py) against the conv-op reference, across tile-boundary
dilation carries and multiple dilation cycles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nsynth_wavenet_tpu.ops import flow_kernel as fk


@pytest.mark.parametrize(
    "n_layers,num_stages,tile,L",
    [
        (4, 2, 64, 256),    # dilations 1,2,1,2 — several tiles
        (5, 5, 32, 128),    # dilation 16 = half the tile
        (6, 3, 16, 64),     # dilation 4, small tiles, 2 cycles
        (5, 5, 16, 96),     # dilation 16: 2d > tile (overlapping slide)
    ],
)
def test_flow_stack_matches_conv_reference(n_layers, num_stages, tile, L):
    B, W = 8, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, W).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.randn(B, L, n_layers * W).astype(np.float32) * 0.1)
    w_tap = jnp.asarray(rng.randn(n_layers, 3, W, W).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    w_res = jnp.asarray(rng.randn(n_layers, W // 2, W).astype(np.float32) * 0.1)
    b_res = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)

    want = np.asarray(
        fk.flow_stack_reference(x, cond, w_tap, b, w_res, b_res, num_stages)
    )
    for compact in (False, True):
        fn = fk.make_flow_stack_fn(n_layers, num_stages, W, B, L, tile=tile,
                                   interpret=True, compact=compact)
        got = np.asarray(fn(x, cond, w_tap, b, w_res, b_res))
        assert np.isfinite(got).all()
        # both paths run their matmuls in bf16 — tolerance covers
        # accumulation-order differences (+ bf16 carries when compact)
        np.testing.assert_allclose(got, want, atol=3e-2 if compact else 2e-2,
                                   rtol=0)
    # the match must be non-trivial (outputs differ from the input)
    assert np.abs(want - np.asarray(x)).max() > 0.1
