"""Fast golden regression gate (round-2, VERDICT "Next #6").

A committed trained checkpoint (tests/golden/tiny_ce, written by
tools/make_golden_ckpt.py — CE teacher, width 128, trained on the
pseudo-speech corpus) turns sampler/feature regressions into second-scale
pytest failures instead of a 30k-step quality smoke:

  * XLA free-run from held-out conditioning must track its mel (matched
    correlation near the committed value and above mismatched);
  * the Pallas kernel (interpret mode) must match the XLA path
    teacher-forced ON TRAINED WEIGHTS — random-weight parity can miss
    errors that only matter once the distribution is peaked.

The TPU twin of this gate (free-running both REAL Pallas paths) lives in
benchmarks/tpu_kernel_parity.py::check_golden_freerun.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tools.make_golden_ckpt import GOLDEN_DIR, eval_mels, load_golden

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "meta.json")),
    reason="golden checkpoint not generated yet (tools/make_golden_ckpt.py)",
)


@pytest.fixture(scope="module")
def golden():
    model, params, meta = load_golden()
    return model, params, meta


def test_golden_freerun_tracks_conditioning(golden):
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from tools.quality_smoke import mel_track_corr

    model, params, meta = golden
    n_gen = 8000  # 0.5 s x 2 utts keeps the CPU scan under a minute
    mels, _ = eval_mels(n=2)
    mels = mels[:, : 1 + n_gen // 200]
    fg = Fastgen(model)
    audio = np.asarray(
        jax.jit(lambda p, m: fg.generate(p, m, jax.random.PRNGKey(7)))(params, mels)
    )
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0
    m_corr, mm_corr = mel_track_corr(audio, mels, n_gen)
    # thresholds relative to the committed TPU measurement (12000 samples,
    # 4 utts); the shorter CPU run sits close but not identical
    assert m_corr > mm_corr + 0.05, (m_corr, mm_corr)
    assert m_corr > meta["matched_corr"] - 0.2, (m_corr, meta["matched_corr"])


def test_golden_pallas_teacher_forced_parity(golden):
    """Trained-weight parity: kernel out_params vs the XLA scan path,
    teacher-forced over a short segment (interpret mode).  Random-weight
    parity (tests/test_fastgen_kernel.py) can miss errors that only matter
    once the output distribution is peaked."""
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.ops import fastgen_kernel as fk
    from nsynth_wavenet_tpu.ops import stft

    model, params, meta = golden
    cfg = model.cfg
    L, B, crop = 64, 2, 1280
    _, wav_full = eval_mels(n=B)
    wav = wav_full[:, :crop]
    mel = stft.melspectrogram_np(wav)
    fg = Fastgen(model)
    enc, _ = model.deconv_stack(params, jnp.asarray(mel))
    off = (enc.shape[1] - crop) // 2

    _, want = fg.generate(
        params, mel, jax.random.PRNGKey(1), length=L,
        teacher_force=jnp.asarray(wav), cond_offset=off, collect_out_params=True,
    )
    want = np.asarray(want)

    kw = fk.build_kernel_weights(cfg, params)
    kw.pop("out_pad_seg"), kw.pop("out_pad")
    gen = fk.make_generate_fn(
        cfg, B, L, teacher_forced=True, collect_out_params=True, greedy=True,
        interpret=True,
    )
    enc_t = jnp.transpose(enc, (1, 0, 2))[off : off + L]
    _, outp = gen(kw, enc_t, 123, tf=jnp.transpose(jnp.asarray(wav[:, :L])))
    got = np.asarray(outp)[:, :, : cfg.out_width]
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=5e-3 * scale, rtol=0)
