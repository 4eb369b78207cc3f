"""The five supported reference configurations (BASELINE.json correctness
gate): load each real config JSON unchanged and run its full-size model
forward + loss (+ generation path construction) on short sequences.

Full-size widths/layers, reduced time length — this exercises exactly the
production code paths (head widths, gate doubling, deconv sharing, KL mode
pairing) without full-length compute."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.parallel_wavenet import (
    ParallelWavenet,
    transplant_teacher_deconv,
)
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
WAV_LEN = 1024  # multiple of max_dilation 512; mel frames 6 -> enc 1200


def _wav_mel(batch=1, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(WAV_LEN) / 16000.0
    wav = np.clip(
        0.4 * np.sin(2 * np.pi * 210 * t)[None] + 0.02 * rng.randn(batch, WAV_LEN),
        -0.99,
        0.99,
    ).astype(np.float32)
    return wav, stft.melspectrogram_np(wav)


@pytest.mark.parametrize("name", ["wavenet_ce", "wavenet_mol", "wavenet_gauss"])
def test_teacher_config(name):
    cfg = config_lib.load_config(
        os.path.join(CONFIG_DIR, f"{name}.json"), compute_dtype="float32"
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    wav, mel = _wav_mel()
    loss = float(model.forward_loss(params, wav, mel)["loss"])
    assert np.isfinite(loss)
    if cfg.loss_type == "ce":
        # at full width the random-init logits are not negligible, so the
        # untrained loss sits near (not at) uniform (reference test_wavenet
        # eyeballs the same ~1/quant_chann correspondence)
        assert abs(loss - np.log(cfg.quant_chann)) < 1.0
    # head width contract (reference wavenet.py:121-129)
    enc = model.encode_signal({"wav": wav})
    ff, _ = model.feed_forward(params, {"wav_scaled": enc["wav_scaled"], "mel": mel})
    assert ff["out_params"].shape == (1, WAV_LEN, cfg.out_width)


@pytest.mark.parametrize(
    "name,teacher_name",
    [("parallel_wavenet", "wavenet_mol"), ("parallel_wavenet_gauss", "wavenet_gauss")],
)
def test_student_config(name, teacher_name):
    te_cfg = config_lib.load_config(
        os.path.join(CONFIG_DIR, f"{teacher_name}.json"),
        compute_dtype="float32",
        use_as_teacher=True,
    )
    teacher = Wavenet(te_cfg)
    te_params = teacher.init_params(jax.random.PRNGKey(1))

    st_cfg = config_lib.load_config(
        os.path.join(CONFIG_DIR, f"{name}.json"), compute_dtype="float32", num_samples=3
    )
    pwn = ParallelWavenet(st_cfg, teacher)
    params = transplant_teacher_deconv(pwn.init_params(jax.random.PRNGKey(0)), te_params)

    wav, mel = _wav_mel()
    ff, _ = pwn.feed_forward(params, {"mel": mel}, jax.random.PRNGKey(2))
    assert ff["x"].shape == (1, pwn.sample_length(mel.shape[1]))
    # full loss assembly: KL (+ power) (+ contrastive per config)
    ff.update({"mel": mel, "wav": wav, "mel_rand": mel})
    ld = pwn.calculate_loss(te_params, ff, jax.random.PRNGKey(3))
    assert np.isfinite(float(ld["loss"]))
    assert "kl_loss" in ld
    if st_cfg.power_loss_factor > 0:
        assert "power_loss" in ld
    if st_cfg.loss_type == "logistic" and st_cfg.contrastive_loss_factor > 0:
        assert "contrastive_loss" in ld
    # reconstruction identity holds at full size too
    recon = np.asarray(ff["rand_input"]) * np.asarray(ff["scale_tot"]) + np.asarray(
        ff["mean_tot"]
    )
    np.testing.assert_allclose(np.asarray(ff["x"]), recon, rtol=1e-4, atol=1e-4)


def test_config_slug_full_reference_encoding():
    """Run-slug parity with reference auxilaries/config_str.py:9-107 for all
    five contract configs (flag defaults: MANUAL_FINAL_INIT=True is encoded
    only under weight norm; USE_LOG_SCALE/CLIP/NORM_FEAT/USE_MEL/USE_L1 all
    default False, SPEC_ENHANCE_FACTOR=1 -> ABS, USE_PRIORITY_FREQ=True ->
    PFS).  Expected strings were derived by hand-executing the reference's
    get_config_srt over each json; framework extras (pl/cl factors) follow
    the reference-encoded segment."""
    import nsynth_wavenet_tpu.config as config_lib

    want = {
        "wavenet_ce.json": "ns_wn-MU-n_WN-TS-tanh-n_DO-CE",
        "wavenet_mol.json": "ns_wn-n_MU-n_WN-TS-leaky_relu-DIN-MOL",
        "wavenet_gauss.json": "ns_wn-n_MU-n_WN-TS-leaky_relu-n_DO-GAUSS",
        "parallel_wavenet.json": (
            "ns_pwn-n_MU-n_WN-TS-leaky_relu-n_LOGS-n_CLIP-ABS-n_MEL-L2-PFS"
            "-SHA_DC-LOGISTIC-pl1-cl0.3"
        ),
        "parallel_wavenet_gauss.json": (
            "ns_pwn-n_MU-n_WN-TS-leaky_relu-n_LOGS-n_CLIP-ABS-n_MEL-L2-PFS"
            "-SEP_DC-GAUSS-pl1"
        ),
    }
    base = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name, expect in want.items():
        cfg = config_lib.load_config(os.path.join(base, name))
        assert config_lib.config_slug(cfg, "unused") == expect, name
    # weight-norm + manual-final-init and exp-tag encodings
    cfg = config_lib.load_config(
        os.path.join(base, "parallel_wavenet.json"), use_weight_norm=True
    )
    slug = config_lib.config_slug(cfg, "unused", exp_tag="exp1")
    assert slug.startswith("ns_pwn_exp1-n_MU-WN_DDI_mfinit-")
