"""IAF student tests (model: reference tests/test_parallel_wavenet.py —
algebraic reconstruction, positive scales, NaN-free gradients), plus the
teacher-deconv transplant contract (reference tests/test_load_teacher.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models import parallelgen
from nsynth_wavenet_tpu.models.parallel_wavenet import (
    ParallelWavenet,
    transplant_teacher_deconv,
)
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.training import train_lib

TE_SMALL = dict(
    num_layers=4,
    num_stages=2,
    width=16,
    skip_width=8,
    deconv_width=16,
    wave_length=1280,
    double_gate_width=False,
    use_mu_law=False,
    upsample_act="leaky_relu",
    compute_dtype="float32",
)
ST_SMALL = dict(
    num_iaf_layers=(2, 2),
    num_stages=2,
    width=8,
    deconv_width=16,
    wave_length=1280,
    use_mu_law=False,
    upsample_act="leaky_relu",
    num_samples=10,
    compute_dtype="float32",
)


def _teacher(loss_type="mol"):
    cfg = config_lib.WavenetConfig(loss_type=loss_type, use_as_teacher=True, **TE_SMALL)
    model = Wavenet(cfg)
    return model, model.init_params(jax.random.PRNGKey(10))


def _wav_mel(batch=2, length=1280, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(length) / 16000.0
    wav = 0.3 * np.sin(2 * np.pi * 180 * t)[None, :] + 0.02 * rng.randn(batch, length)
    wav = np.clip(wav, -0.99, 0.99).astype(np.float32)
    return wav, np.asarray(stft.melspectrogram(wav))


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_reconstruction_and_scale(compute_dtype):
    """x == rand_input * scale_tot + mean_tot, scale > 0 (reference
    tests/test_parallel_wavenet.py:57-64).  Holds in bf16-carrier mode too:
    the flow composition algebra runs on the f32 head outputs."""
    te_model, _ = _teacher()
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic", **{**ST_SMALL, "compute_dtype": compute_dtype}
    )
    pwn = ParallelWavenet(cfg, te_model)
    params = pwn.init_params(jax.random.PRNGKey(0))
    _, mel = _wav_mel()
    ff, _ = pwn.feed_forward(params, {"mel": mel}, jax.random.PRNGKey(1))
    x = np.asarray(ff["x"])
    recon = np.asarray(ff["rand_input"]) * np.asarray(ff["scale_tot"]) + np.asarray(
        ff["mean_tot"]
    )
    np.testing.assert_allclose(x, recon, rtol=1e-4, atol=1e-5)
    assert np.asarray(ff["scale_tot"]).min() > 0
    # length snapped to a multiple of max_dilation
    assert x.shape == (2, pwn.sample_length(mel.shape[1]))
    # manual final init: per-flow scale ~ softplus(-0.3) = 0.554, so
    # scale_tot ~ 0.554^num_flows — the ~0.05 design constant matching
    # LJSpeech amplitude statistics (reference tests/test_scale.py:38-58,
    # Readme.md:116-119; here 2 flows -> ~0.31)
    expected = float(jax.nn.softplus(-0.3)) ** pwn.num_flows
    got = float(np.asarray(ff["scale_tot"]).mean())
    assert 0.3 * expected < got < 3.0 * expected, (got, expected)


def test_manual_final_bias_value():
    cfg = config_lib.ParallelWavenetConfig(loss_type="logistic", **ST_SMALL)
    pwn = ParallelWavenet(cfg)
    params = pwn.init_params(jax.random.PRNGKey(0))
    for f in params["flows"]:
        np.testing.assert_allclose(np.asarray(f["out2_scale"]["b"]), -0.3)
        np.testing.assert_allclose(np.asarray(f["out2_mean"]["b"]), 0.0)


def test_logistic_distillation_loss_and_grads():
    te_model, te_params = _teacher("mol")
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic",
        power_loss_factor=1.0,
        contrastive_loss_factor=0.3,
        use_share_deconv=True,
        **ST_SMALL,
    )
    pwn = ParallelWavenet(cfg, te_model)
    params = pwn.init_params(jax.random.PRNGKey(0))
    wav, mel = _wav_mel()
    _, mel_rand = _wav_mel(seed=5)

    def loss_fn(p):
        ff, _ = pwn.feed_forward(p, {"mel": mel}, jax.random.PRNGKey(1))
        ff.update({"mel": mel, "wav": wav, "mel_rand": mel_rand})
        return pwn.calculate_loss(te_params, ff, jax.random.PRNGKey(2))["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.all(np.isfinite(np.asarray(g))), jax.tree_util.keystr(path)


def test_fused_kl_contrastive_matches_separate():
    """kl_and_contrastive_fused (one stacked 2B teacher pass) must equal the
    two independent kl_loss_logistic runs it replaces, given the same rngs."""
    te_model, te_params = _teacher("mol")
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic",
        power_loss_factor=0.0,
        contrastive_loss_factor=0.3,
        use_share_deconv=True,
        **ST_SMALL,
    )
    pwn = ParallelWavenet(cfg, te_model)
    params = pwn.init_params(jax.random.PRNGKey(0))
    wav, mel = _wav_mel()
    _, mel_rand = _wav_mel(seed=5)

    ff, _ = pwn.feed_forward(params, {"mel": mel}, jax.random.PRNGKey(1))
    ff.update({"mel": mel, "wav": wav, "mel_rand": mel_rand})
    rng_kl, rng_cl = jax.random.split(jax.random.PRNGKey(2))

    fused = pwn.kl_and_contrastive_fused(te_params, ff, rng_kl, rng_cl, cfg.num_samples)
    kl = pwn.kl_loss_logistic(te_params, ff, rng_kl, cfg.num_samples)
    cl = pwn.contrastive_loss(te_params, ff, rng_cl, cfg.num_samples)

    np.testing.assert_allclose(float(fused["kl_loss"]), float(kl["kl_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(fused["H_Ps_Pt"]), float(kl["H_Ps_Pt"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(fused["contrastive_loss"]), float(cl["contrastive_loss"]), rtol=1e-5
    )


def test_gauss_distillation_loss_and_grads():
    te_model, te_params = _teacher("gauss")
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="gauss", power_loss_factor=1.0, **ST_SMALL
    )
    pwn = ParallelWavenet(cfg, te_model)
    params = pwn.init_params(jax.random.PRNGKey(0))
    wav, mel = _wav_mel()

    def loss_fn(p):
        ff, _ = pwn.feed_forward(p, {"mel": mel}, jax.random.PRNGKey(1))
        ff.update({"mel": mel, "wav": wav})
        return pwn.calculate_loss(te_params, ff, jax.random.PRNGKey(2))["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_kl_sigma_floor_stabilizes_sharp_teacher():
    """kl_sigma_floor=0 must reproduce the reference-exact KL; a floor
    must (a) leave the KL unchanged when the teacher's sigma is above it
    and (b) strictly reduce the KL blow-up against an artificially sharp
    teacher (the 1/(2 var_p) mean term and the (dlogsigma)^2 regularizer
    are what collapse the student — RESULTS.md round 5)."""
    te_model, te_params = _teacher("gauss")
    base = dict(loss_type="gauss", **ST_SMALL)
    pwn0 = ParallelWavenet(
        config_lib.ParallelWavenetConfig(**base), te_model
    )
    pwnf = ParallelWavenet(
        config_lib.ParallelWavenetConfig(kl_sigma_floor=0.02, **base), te_model
    )
    params = pwn0.init_params(jax.random.PRNGKey(0))
    wav, mel = _wav_mel()
    ff, _ = pwn0.feed_forward(params, {"mel": mel}, jax.random.PRNGKey(1))
    ff.update({"mel": mel, "wav": wav})

    kl0 = float(pwn0.kl_loss_gauss(te_params, ff)["kl_loss"])
    klf = float(pwnf.kl_loss_gauss(te_params, ff)["kl_loss"])
    assert np.isfinite(kl0) and np.isfinite(klf)

    # sharpen the teacher artificially: shift its log-scale head bias far
    # negative so sigma_p collapses; the floored KL must stay bounded while
    # the reference-exact KL blows up
    import copy

    sharp = copy.deepcopy(jax.device_get(te_params))
    sharp["out2"]["b"] = np.asarray(sharp["out2"]["b"]).copy()
    sharp["out2"]["b"][1] = -12.0  # log-scale bias -> sigma_p ~ e^-12
    kl0_sharp = float(pwn0.kl_loss_gauss(sharp, ff)["kl_loss"])
    klf_sharp = float(pwnf.kl_loss_gauss(sharp, ff)["kl_loss"])
    assert klf_sharp < kl0_sharp * 1e-2, (kl0_sharp, klf_sharp)
    assert np.isfinite(klf_sharp)


def test_transplant_teacher_deconv():
    te_model, te_params = _teacher("mol")
    for share in (False, True):
        cfg = config_lib.ParallelWavenetConfig(
            loss_type="logistic", use_share_deconv=share, **ST_SMALL
        )
        pwn = ParallelWavenet(cfg, te_model)
        params = pwn.init_params(jax.random.PRNGKey(0))
        new = transplant_teacher_deconv(params, te_params)
        targets = [new["deconv_share"]] if share else [f["deconv"] for f in new["flows"]]
        for tgt in targets:
            for name in ("up_1", "up_2"):
                np.testing.assert_array_equal(
                    np.asarray(tgt[name]["w"]), np.asarray(te_params["deconv"][name]["w"])
                )


def test_student_train_step_and_frozen_deconv():
    te_model, te_params = _teacher("mol")
    cfg = config_lib.ParallelWavenetConfig(
        loss_type="logistic",
        power_loss_factor=1.0,
        use_teacher_deconv=True,
        **ST_SMALL,
    )
    pwn = ParallelWavenet(cfg, te_model)
    params = pwn.init_params(jax.random.PRNGKey(0))
    params = transplant_teacher_deconv(params, te_params)
    optimizer = train_lib.make_student_optimizer(cfg, params)
    state = train_lib.make_train_state(params, optimizer)
    wav, _ = _wav_mel()
    step_fn = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, optimizer))
    state2, metrics = step_fn(state, wav, wav, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "kl_loss" in metrics and "power_loss" in metrics
    # frozen teacher deconv unchanged by the update
    np.testing.assert_array_equal(
        np.asarray(state2["params"]["deconv_share"]["up_1"]["w"]),
        np.asarray(te_params["deconv"]["up_1"]["w"]),
    )
    # trainable flow weights did change
    before = np.asarray(state["params"]["flows"][0]["start_conv"]["w"])
    after = np.asarray(state2["params"]["flows"][0]["start_conv"]["w"])
    assert np.abs(before - after).max() > 0


def test_parallelgen_synthesize():
    cfg = config_lib.ParallelWavenetConfig(loss_type="logistic", **ST_SMALL)
    pwn = ParallelWavenet(cfg)  # generation needs no teacher
    params = pwn.init_params(jax.random.PRNGKey(0))
    _, mel = _wav_mel()
    audio = np.asarray(parallelgen.synthesize(pwn, params, mel, jax.random.PRNGKey(3)))
    assert audio.shape == (2, pwn.sample_length(mel.shape[1]))
    assert np.abs(audio).max() <= 1.0
    assert np.isfinite(audio).all()


def test_bf16_trunk_grad_direction_matches_f32():
    """Student bf16 flow-trunk (out_dtype=bf16 carriers, f32 mean/scale
    heads) must produce gradients consistent with the f32 model — same
    criterion as the teacher's bf16-trunk test (tests/test_wavenet.py)."""
    te_model, te_params = _teacher("mol")  # teacher f32 in both runs
    wav, mel = _wav_mel()
    _, mel_rand = _wav_mel(seed=5)
    grads = {}
    for cd in ("float32", "bfloat16"):
        cfg = config_lib.ParallelWavenetConfig(
            loss_type="logistic",
            power_loss_factor=1.0,
            contrastive_loss_factor=0.3,
            use_share_deconv=True,
            **{**ST_SMALL, "compute_dtype": cd},
        )
        pwn = ParallelWavenet(cfg, te_model)
        params = pwn.init_params(jax.random.PRNGKey(0))

        def loss_fn(p):
            ff, _ = pwn.feed_forward(p, {"mel": mel}, jax.random.PRNGKey(1))
            ff.update({"mel": mel, "wav": wav, "mel_rand": mel_rand})
            return pwn.calculate_loss(te_params, ff, jax.random.PRNGKey(2))["loss"]

        grads[cd] = jax.grad(loss_fn)(params)

    f32 = jax.tree_util.tree_leaves(grads["float32"])
    bf = jax.tree_util.tree_leaves(grads["bfloat16"])
    assert len(f32) == len(bf)
    for a, b in zip(f32, bf):
        assert b.dtype == jnp.float32  # master grads stay f32
        assert np.all(np.isfinite(np.asarray(b)))
        na, nb = float(jnp.linalg.norm(a)), float(jnp.linalg.norm(b))
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(jnp.vdot(a, b) / (na * nb + 1e-30))
        assert cos > 0.9, (a.shape, cos)
