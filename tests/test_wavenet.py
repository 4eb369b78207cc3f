"""Teacher WaveNet tests (model: reference tests/test_wavenet.py — untrained
CE loss corresponds to ~uniform probability over quant_chann)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft

SMALL = dict(
    num_layers=6,
    num_stages=3,
    width=32,
    skip_width=16,
    deconv_width=32,
    wave_length=1280,
    compute_dtype="float32",
)


def _batch(batch_size=2, length=1280, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(length) / 16000.0
    wav = 0.4 * np.sin(2 * np.pi * 220 * t)[None, :] + 0.05 * rng.randn(batch_size, length)
    wav = wav.astype(np.float32)
    mel = np.asarray(stft.melspectrogram(wav))
    return wav, mel


def test_untrained_ce_loss_is_uniform():
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    wav, mel = _batch()
    loss = float(model.forward_loss(params, wav, mel)["loss"])
    # untrained logits ~ 0 -> loss ~ log(quant_chann) = log(256)
    assert abs(loss - np.log(256)) < 0.1, loss


@pytest.mark.parametrize("loss_type", ["mol", "gauss"])
def test_untrained_real_losses_finite(loss_type):
    cfg = config_lib.WavenetConfig(
        use_mu_law=False, loss_type=loss_type, double_gate_width=False, **SMALL
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    wav, mel = _batch()
    loss = float(model.forward_loss(params, wav, mel)["loss"])
    assert np.isfinite(loss)


def test_feed_forward_shapes():
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    wav, mel = _batch()
    enc = model.encode_signal({"wav": wav})
    ff, _ = model.feed_forward(params, {"wav_scaled": enc["wav_scaled"], "mel": mel})
    assert ff["out_params"].shape == (2, 1280, 256)
    # deconv output: mel frames (7) * frame_shift (200)
    assert ff["encoding"].shape == (2, 1400, 32)


def test_gradients_no_nan():
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    wav, mel = _batch()

    def loss_fn(p):
        return model.forward_loss(p, wav, mel)["loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    last = cfg.num_layers - 1
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g)))
        # every parameter receives gradient signal except the last layer's
        # res conv, whose output l is structurally unused after the loop
        # (same in the reference: wavenet.py:269-271 followed by :280)
        path_str = jax.tree_util.keystr(path)
        if f"[{last}]" in path_str and "res" in path_str:
            continue
        assert float(jnp.abs(g).max()) > 0, path_str


def test_causality_of_out_params():
    """out_params[t] must not depend on wav[t:] (shift_right + causal convs)."""
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(4))
    wav, mel = _batch(batch_size=1)

    enc = model.encode_signal({"wav": wav})
    ff0, _ = model.feed_forward(params, {"wav_scaled": enc["wav_scaled"], "mel": mel})
    t0 = 700
    wav2 = wav.copy()
    wav2[:, t0:] = 0.9  # change the future
    enc2 = model.encode_signal({"wav": wav2})
    ff1, _ = model.feed_forward(params, {"wav_scaled": enc2["wav_scaled"], "mel": mel})
    # identical mel conditioning, so outputs up to and including t0 match
    got = np.asarray(ff0["out_params"][:, : t0 + 1])
    want = np.asarray(ff1["out_params"][:, : t0 + 1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.abs(
        np.asarray(ff0["out_params"][:, t0 + 1 :]) - np.asarray(ff1["out_params"][:, t0 + 1 :])
    ).max() > 1e-4


def test_data_dependent_init_normalizes():
    cfg = config_lib.WavenetConfig(
        use_mu_law=False,
        loss_type="gauss",
        use_weight_norm=True,
        double_gate_width=False,
        **SMALL,
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    wav, mel = _batch(batch_size=4)
    ff, new_params = model.data_dep_init(params, wav, mel)
    out = np.asarray(ff["out_params"])
    # out2 is the last ddi'd layer: its output must be ~N(0, 1) per channel
    np.testing.assert_allclose(out.mean(axis=(0, 1)), 0.0, atol=1e-3)
    np.testing.assert_allclose(out.std(axis=(0, 1)), 1.0, rtol=1e-2)
    # re-running the plain forward with the rescaled params reproduces it
    enc = model.encode_signal({"wav": wav})
    ff2, _ = model.feed_forward(new_params, {"wav_scaled": enc["wav_scaled"], "mel": mel})
    np.testing.assert_allclose(out, np.asarray(ff2["out_params"]), rtol=1e-3, atol=1e-3)


def test_dropout_variants_run():
    for flag in ("dropout_inputs", "dropout_all"):
        cfg = config_lib.WavenetConfig(
            use_mu_law=False, loss_type="gauss", double_gate_width=False, **SMALL, **{flag: True}
        )
        model = Wavenet(cfg)
        params = model.init_params(jax.random.PRNGKey(6))
        wav, mel = _batch()
        l1 = float(
            model.forward_loss(params, wav, mel, dropout_rng=jax.random.PRNGKey(1))["loss"]
        )
        l2 = float(model.forward_loss(params, wav, mel)["loss"])  # no rng -> no dropout
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l1 != l2
        # as a frozen teacher, dropout must be disabled even with an rng
        tcfg = config_lib.WavenetConfig(
            use_mu_law=False,
            loss_type="gauss",
            double_gate_width=False,
            use_as_teacher=True,
            **SMALL,
            **{flag: True},
        )
        tmodel = Wavenet(tcfg)
        l3 = float(
            tmodel.forward_loss(params, wav, mel, dropout_rng=jax.random.PRNGKey(1))["loss"]
        )
        np.testing.assert_allclose(l3, l2, rtol=1e-5)


@pytest.mark.parametrize("use_resize_conv", [False, True])
def test_bucketed_deconv_matches_unpadded(use_resize_conv):
    """apply_deconv_stack_any_length on a zero-padded mel must equal the
    plain stack exactly on the real prefix and be zero beyond (this is what
    makes streaming generation compile once per bucket, not per length)."""
    from nsynth_wavenet_tpu.models.wavenet import (
        apply_deconv_stack, apply_deconv_stack_any_length, init_deconv_stack,
    )

    cfg = config_lib.WavenetConfig(
        use_resize_conv=use_resize_conv, upsample_act="leaky_relu", **SMALL
    )
    params = init_deconv_stack(
        jax.random.PRNGKey(3), cfg.deconv_config, 80, cfg.deconv_width, True
    )
    _, mel = _batch()
    T = mel.shape[1]
    up = cfg.frame_shift

    ref, _ = apply_deconv_stack(
        params, mel,
        deconv_config=cfg.deconv_config, upsample_act=cfg.upsample_act,
        use_resize_conv=use_resize_conv,
    )
    mel_pad = jnp.pad(jnp.asarray(mel), ((0, 0), (0, 13), (0, 0)))
    out = apply_deconv_stack_any_length(
        params, mel_pad, jnp.int32(T),
        deconv_config=cfg.deconv_config, upsample_act=cfg.upsample_act,
        use_resize_conv=use_resize_conv,
    )
    # equality is mathematical, not bit-exact: XLA schedules the padded-shape
    # conv differently, giving float-rounding-level differences (~1e-7)
    np.testing.assert_allclose(
        np.asarray(out[:, : T * up]), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    assert np.all(np.asarray(out[:, T * up :]) == 0.0)


def test_bf16_trunk_grads_finite_and_close_to_f32():
    """compute_dtype=bfloat16 keeps the residual trunk in bf16 end-to-end
    (ops/conv.py out_dtype); grads must stay f32, finite, and directionally
    consistent with the f32 model (cosine > 0.9 per leaf)."""
    wav, mel = _batch()
    grads = {}
    for cd in ("float32", "bfloat16"):
        cfg = config_lib.WavenetConfig(
            use_mu_law=True, loss_type="ce", **{**SMALL, "compute_dtype": cd}
        )
        model = Wavenet(cfg)
        params = model.init_params(jax.random.PRNGKey(3))

        def loss_fn(p):
            return model.forward_loss(p, wav, mel)["loss"]

        grads[cd] = jax.grad(loss_fn)(params)

    f32 = jax.tree_util.tree_leaves(grads["float32"])
    bf = jax.tree_util.tree_leaves(grads["bfloat16"])
    for a, b in zip(f32, bf):
        assert b.dtype == jnp.float32  # master grads stay f32
        assert np.all(np.isfinite(np.asarray(b)))
        na, nb = float(jnp.linalg.norm(a)), float(jnp.linalg.norm(b))
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(jnp.vdot(a, b) / (na * nb + 1e-30))
        assert cos > 0.9, (a.shape, cos)
