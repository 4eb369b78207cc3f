"""Fastgen tests (model: reference tests/test_fastgen.py, which exercised one
queue step; here we verify full equivalence of the scan/ring-buffer step
network against the training-time forward under teacher forcing — a much
stronger check than the reference's smoke test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.fastgen import Fastgen
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


def _wav_mel(batch_size=2, length=1280, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(length) / 16000.0
    wav = 0.4 * np.sin(2 * np.pi * 220 * t)[None, :] + 0.05 * rng.randn(batch_size, length)
    wav = np.clip(wav, -0.99, 0.99).astype(np.float32)
    mel = np.asarray(stft.melspectrogram(wav))
    return wav, mel


@pytest.mark.parametrize(
    "loss_type,use_mu_law,double_gate",
    [("ce", True, True), ("mol", False, False), ("gauss", False, False)],
)
@pytest.mark.parametrize("precompute_cond", [True, False])
def test_teacher_forced_step_matches_feed_forward(
    loss_type, use_mu_law, double_gate, precompute_cond
):
    """Ring-buffer step network == training feed_forward, all three heads,
    both conditioning modes (precomputed vs per-step stacked matmul)."""
    cfg = config_lib.WavenetConfig(
        use_mu_law=use_mu_law,
        loss_type=loss_type,
        double_gate_width=double_gate,
        **SMALL,
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    wav, mel = _wav_mel()
    L = wav.shape[1]

    enc = model.encode_signal({"wav": wav})
    ff, _ = model.feed_forward(params, {"wav_scaled": enc["wav_scaled"], "mel": mel})
    want = np.asarray(ff["out_params"])  # [B, L, out_width]

    fg = Fastgen(model)
    enc_len = ff["encoding"].shape[1]
    offset = (enc_len - L) // 2  # same center trim as _condition
    _, got = fg.generate(
        params,
        mel,
        jax.random.PRNGKey(1),
        length=L,
        teacher_force=jnp.asarray(wav),
        cond_offset=offset,
        collect_out_params=True,
        precompute_cond=precompute_cond,
    )
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_generate_shape_range_determinism():
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    _, mel = _wav_mel()
    fg = Fastgen(model)
    audio = np.asarray(fg.generate(params, mel, jax.random.PRNGKey(7), length=400))
    assert audio.shape == (2, 400)
    assert np.abs(audio).max() <= 1.0
    audio2 = np.asarray(fg.generate(params, mel, jax.random.PRNGKey(7), length=400))
    np.testing.assert_array_equal(audio, audio2)  # same key -> same audio
    audio3 = np.asarray(fg.generate(params, mel, jax.random.PRNGKey(8), length=400))
    assert np.abs(audio - audio3).max() > 0


def test_streaming_equals_full_generation():
    """Chunked generation with carried state must be bit-identical to one
    long scan (same ring-buffer phases, same PRNG chain)."""
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    _, mel = _wav_mel(length=1280)  # enc len 1400
    fg = Fastgen(model)
    full = np.asarray(
        fg.generate(params, mel, jax.random.PRNGKey(5), length=1200, precompute_cond=False)
    )
    streamed = np.asarray(
        fg.generate_streaming(params, mel, jax.random.PRNGKey(5), length=1200, chunk=256)
    )
    assert streamed.shape == full.shape == (2, 1200)
    np.testing.assert_array_equal(streamed, full)


def test_generate_default_length_is_encoding_length():
    cfg = config_lib.WavenetConfig(use_mu_law=True, loss_type="ce", **SMALL)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    _, mel = _wav_mel(length=800)  # 5 frames -> enc 1000
    fg = Fastgen(model)
    audio = np.asarray(fg.generate(params, mel, jax.random.PRNGKey(0)))
    assert audio.shape == (2, 1000)
