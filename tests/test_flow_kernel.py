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


def test_flow_stack_enc_mode_matches_stream_mode():
    """enc mode (in-kernel per-layer cond matmul, time-major interface)
    must match stream mode fed the equivalent precomputed cond — covers
    the round-4 serving configuration at the kernel level."""
    n_layers, num_stages, tile, L, B, W, DW = 4, 2, 32, 128, 8, 64, 128
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, L, W).astype(np.float32) * 0.3)
    enc = jnp.asarray(rng.randn(B, L, DW).astype(np.float32) * 0.2)
    w_cond = jnp.asarray(rng.randn(n_layers, DW, W).astype(np.float32) * 0.05)
    w_tap = jnp.asarray(rng.randn(n_layers, 3, W, W).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    w_res = jnp.asarray(rng.randn(n_layers, W // 2, W).astype(np.float32) * 0.1)
    b_res = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    cond = jnp.concatenate(
        [jnp.einsum("blc,cw->blw", enc, w_cond[i]) for i in range(n_layers)],
        axis=-1,
    )
    want = np.asarray(
        fk.make_flow_stack_fn(n_layers, num_stages, W, B, L, tile=tile,
                              interpret=True)(x, cond, w_tap, b, w_res, b_res)
    )
    for compact in (False, True):
        fn = fk.make_flow_stack_fn(
            n_layers, num_stages, W, B, L, tile=tile, interpret=True,
            compact=compact, cond_features=DW, time_major=True,
        )
        cdt = jnp.bfloat16 if compact else jnp.float32
        got = np.asarray(
            jnp.transpose(
                fn(
                    jnp.transpose(x, (1, 0, 2)),
                    jnp.transpose(enc, (1, 0, 2)).astype(cdt),
                    w_tap, b, w_res, b_res, w_cond,
                ),
                (1, 0, 2),
            )
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=3e-2 if compact else 1e-4,
                                   rtol=0)


def test_flow_stack_batch_tiling_matches_full_batch():
    """b_tile < batch must reproduce the untiled kernel exactly: each batch
    row streams its length tiles through freshly zeroed carries."""
    n_layers, num_stages, tile, L, B, W = 4, 2, 32, 128, 8, 64
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, L, W).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.randn(B, L, n_layers * W).astype(np.float32) * 0.1)
    w_tap = jnp.asarray(rng.randn(n_layers, 3, W, W).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    w_res = jnp.asarray(rng.randn(n_layers, W // 2, W).astype(np.float32) * 0.1)
    b_res = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    args = (x, cond, w_tap, b, w_res, b_res)
    full = np.asarray(
        fk.make_flow_stack_fn(n_layers, num_stages, W, B, L, tile=tile,
                              interpret=True)(*args)
    )
    for bt in (2, 4):
        tiled = np.asarray(
            fk.make_flow_stack_fn(n_layers, num_stages, W, B, L, tile=tile,
                                  b_tile=bt, interpret=True)(*args)
        )
        np.testing.assert_array_equal(tiled, full)


def _student(num_iaf_layers=(2, 4), num_stages=2, width=8, share=True,
             compute_dtype="float32"):
    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet

    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic",
        num_iaf_layers=num_iaf_layers,
        num_stages=num_stages,
        width=width,
        deconv_width=16,
        wave_length=1280,
        use_mu_law=False,
        upsample_act="leaky_relu",
        use_share_deconv=share,
        compute_dtype=compute_dtype,
    )
    pwn = ParallelWavenet(cfg)
    return pwn, pwn.init_params(jax.random.PRNGKey(0))


def _mel(batch=4, length=1280, seed=0):
    from nsynth_wavenet_tpu.ops import stft

    rng = np.random.RandomState(seed)
    t = np.arange(length) / 16000.0
    wav = 0.3 * np.sin(2 * np.pi * 180 * t)[None, :] + 0.02 * rng.randn(batch, length)
    return np.asarray(stft.melspectrogram(np.clip(wav, -0.99, 0.99).astype(np.float32)))


@pytest.mark.parametrize("share,compute_dtype", [
    (True, "float32"),
    (True, "bfloat16"),
    (False, "float32"),
])
def test_feed_forward_pallas_matches_xla(share, compute_dtype):
    """End-to-end parity of the integrated fused-Pallas student path
    (models/parallelgen.feed_forward_pallas) against feed_forward on the
    same base noise — flows with n_layers > num_stages exercise the
    chained-stack chunking, and per-flow deconv exercises the non-shared
    encoding path."""
    from nsynth_wavenet_tpu.models import parallelgen

    pwn, params = _student(share=share, compute_dtype=compute_dtype)
    mel = _mel()
    B = mel.shape[0]
    L = pwn.sample_length(mel.shape[1])
    x = pwn.base_noise(jax.random.PRNGKey(3), B, L)

    want, _ = pwn.feed_forward(params, {"mel": mel, "base_x": x})
    got = parallelgen.feed_forward_pallas(
        pwn, params, {"mel": mel, "base_x": x}, b_tile=2, interpret=True
    )
    # f32 still differs at accumulation-order level: the pallas path does
    # the cond projection as one fused matmul and the taps as 3 matmuls
    tol = 2e-2 if compute_dtype == "bfloat16" else 3e-4
    for k in ("x", "mean_tot", "scale_tot", "log_scale_tot"):
        a, b = np.asarray(got[k]), np.asarray(want[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=tol * scale, rtol=0, err_msg=k)
    # reconstruction identity on the pallas path's own outputs
    recon = np.asarray(got["rand_input"]) * np.asarray(got["scale_tot"]) + np.asarray(
        got["mean_tot"]
    )
    np.testing.assert_allclose(np.asarray(got["x"]), recon, rtol=1e-4, atol=1e-5)
    assert np.asarray(got["scale_tot"]).min() > 0


def test_opt_in_kernel_variants_match_default():
    """fuse_cond and layers_per_call are kept as opt-in flags after the
    round-5 perf A/Bs (both slower at the full shape — RESULTS.md round 5);
    their MATH must stay identical to the default path: layers_per_call is
    bit-identical (same ops, fewer calls), fuse_cond within bf16-concat
    tolerance."""
    from nsynth_wavenet_tpu.models import parallelgen

    pwn, params = _student(compute_dtype="float32")
    mel = _mel()
    B = mel.shape[0]
    L = pwn.sample_length(mel.shape[1])
    x = pwn.base_noise(jax.random.PRNGKey(3), B, L)
    inputs = {"mel": mel, "base_x": x}
    base = parallelgen.feed_forward_pallas(
        pwn, params, inputs, b_tile=2, interpret=True
    )
    lpc = parallelgen.feed_forward_pallas(
        pwn, params, inputs, b_tile=2, interpret=True,
        layers_per_call=max(pwn.cfg.num_iaf_layers),
    )
    fc = parallelgen.feed_forward_pallas(
        pwn, params, inputs, b_tile=2, interpret=True, fuse_cond=True
    )
    for k in ("x", "mean_tot", "scale_tot", "log_scale_tot"):
        np.testing.assert_array_equal(
            np.asarray(base[k]), np.asarray(lpc[k]), err_msg=f"lpc:{k}"
        )
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(fc[k]), atol=5e-4, rtol=0,
            err_msg=f"fuse_cond:{k}",
        )


def test_synthesize_pallas_matches_xla_audio():
    """synthesize vs synthesize_pallas agree to one quantization bin on the
    same rng (the f32 composition is bit-close; clip_quant rounding can
    flip a boundary bin)."""
    from nsynth_wavenet_tpu.models import parallelgen

    pwn, params = _student(compute_dtype="float32")
    mel = _mel()
    rng = jax.random.PRNGKey(11)
    a = np.asarray(parallelgen.synthesize(pwn, params, mel, rng))
    b = np.asarray(
        parallelgen.synthesize_pallas(pwn, params, mel, rng, interpret=True)
    )
    assert a.shape == b.shape
    bin_w = 2.0 / pwn.cfg.quant_chann
    assert np.abs(a - b).max() <= bin_w + 1e-6


def test_flow_stack_streaming_matches_oneshot_bitwise():
    """Chained streaming chunks (carries in/out) must be BITWISE equal to
    the one-shot kernel: chunk boundaries land on tile boundaries, so the
    per-tile math is identical and only the carry transport differs."""
    n_layers, num_stages, tile, L, B, W, DW = 5, 5, 16, 128, 8, 64, 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, L, W).astype(np.float32) * 0.3)
    enc = jnp.asarray(rng.randn(B, L, DW).astype(np.float32) * 0.2)
    w_cond = jnp.asarray(rng.randn(n_layers, DW, W).astype(np.float32) * 0.05)
    w_tap = jnp.asarray(rng.randn(n_layers, 3, W, W).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    w_res = jnp.asarray(rng.randn(n_layers, W // 2, W).astype(np.float32) * 0.1)
    b_res = jnp.asarray(rng.randn(n_layers, W).astype(np.float32) * 0.05)
    xt, et = jnp.transpose(x, (1, 0, 2)), jnp.transpose(enc, (1, 0, 2))
    kw = dict(tile=tile, interpret=True, cond_features=DW, time_major=True)
    want = np.asarray(
        fk.make_flow_stack_fn(n_layers, num_stages, W, B, L, **kw)(
            xt, et, w_tap, b, w_res, b_res, w_cond
        )
    )
    C = 32
    sfn = fk.make_flow_stack_fn(
        n_layers, num_stages, W, B, C, streaming=True, **kw
    )
    state = jnp.zeros((sfn.state_rows, B, W), jnp.float32)
    outs = []
    for ci in range(L // C):
        o, state = sfn(xt[ci * C : (ci + 1) * C], et[ci * C : (ci + 1) * C],
                       w_tap, b, w_res, b_res, w_cond, state)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs, 0), want)
