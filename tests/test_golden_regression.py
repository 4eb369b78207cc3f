"""Fast golden regression gate (round-2 VERDICT "Next #6", round-3 #3:
one committed checkpoint per output head).

Committed trained checkpoints (tests/golden/tiny_{ce,mol,gauss}, written by
tools/make_golden_ckpt.py — width-128 teachers trained on the pseudo-speech
corpus) turn sampler/feature regressions into second-scale pytest failures
instead of a 30k-step quality smoke:

  * XLA free-run from held-out conditioning must track its mel (matched
    correlation near the committed value and above mismatched) — this
    exercises each head's SAMPLER (CE categorical, MoL gumbel-select +
    logistic, Gauss), the class of bug random-weight parity misses;
  * the Pallas kernel (interpret mode) must match the XLA path
    teacher-forced ON TRAINED WEIGHTS — random-weight parity can miss
    errors that only matter once the distribution is peaked.

The TPU twin of this gate (free-running both REAL Pallas paths) lives in
benchmarks/tpu_kernel_parity.py::check_golden_freerun.  Reference analog:
the per-config committed generations tests/pred_data-* (Readme.md:93-107).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tools.make_golden_ckpt import available_heads, eval_mels, load_golden

HEADS = available_heads()

pytestmark = pytest.mark.skipif(
    not HEADS, reason="no golden checkpoints generated yet (tools/make_golden_ckpt.py)"
)

_cache = {}


def golden(head):
    if head not in _cache:
        _cache[head] = load_golden(head)
    return _cache[head]


@pytest.mark.parametrize("head", HEADS)
def test_golden_freerun_tracks_conditioning(head):
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from tools.quality_smoke import mel_track_metrics

    model, params, meta = golden(head)
    n_gen = 8000  # 0.5 s x 2 utts keeps the CPU scan under a minute
    mels, _ = eval_mels(n=2)
    mels = mels[:, : 1 + n_gen // 200]
    fg = Fastgen(model)
    audio = np.asarray(
        jax.jit(lambda p, m: fg.generate(p, m, jax.random.PRNGKey(7)))(params, mels)
    )
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0
    mt = mel_track_metrics(audio, mels, n_gen)
    m_corr, mm_corr = mt["corr"]
    # thresholds relative to the committed TPU measurement (12000 samples,
    # 4 utts); the shorter CPU run sits close but not identical
    assert m_corr > mm_corr + 0.05, (m_corr, mm_corr)
    assert m_corr > meta["matched_corr"] - 0.2, (m_corr, meta["matched_corr"])
    # spectral gate (round-5): matched must be spectrally closer too
    assert mt["mcd"][0] < mt["mcd"][1], mt["mcd"]


@pytest.mark.parametrize("head", HEADS)
def test_golden_pallas_teacher_forced_parity(head):
    """Trained-weight parity: kernel out_params vs the XLA scan path,
    teacher-forced over a short segment (interpret mode).  Random-weight
    parity (tests/test_fastgen_kernel.py) can miss errors that only matter
    once the output distribution is peaked."""
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.ops import fastgen_kernel as fk
    from nsynth_wavenet_tpu.ops import stft

    model, params, meta = golden(head)
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
    outp = np.asarray(outp)
    if cfg.loss_type == "mol":
        # kernel MoL head layout: [logits|pad][means|pad][scales|pad], each
        # segment 128-lane aligned (fastgen_kernel.build_kernel_weights)
        seg = outp.shape[-1] // 3
        nr = cfg.mol_mix
        got = np.concatenate(
            [outp[..., s * seg : s * seg + nr] for s in range(3)], axis=-1
        )
    else:
        got = outp[:, :, : cfg.out_width]
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=5e-3 * scale, rtol=0)


# -- student golden (tests/golden/tiny_student, make_golden_ckpt --student) --


def _student_golden():
    from tools.make_golden_ckpt import student_available

    if not student_available():
        pytest.skip("no student golden committed (make_golden_ckpt --student)")
    if "student" not in _cache:
        _cache["student"] = load_golden("student")
    return _cache["student"]


def test_golden_student_oneshot_tracks_conditioning():
    """One-shot XLA synthesis from the committed trained student must track
    held-out conditioning mels — the whole IAF flow composition + sampler
    on trained weights (the student twin of the teacher free-run gate)."""
    from nsynth_wavenet_tpu.models import parallelgen
    from tools.quality_smoke import mel_track_metrics

    pwn, params, meta = _student_golden()
    mels, _ = eval_mels(n=4)
    audio = np.asarray(jax.jit(
        lambda p, m: parallelgen.synthesize(pwn, p, m, jax.random.PRNGKey(7))
    )(params, jnp.asarray(mels)))
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0
    mt = mel_track_metrics(audio, mels, meta["gen_samples"])
    m_corr, mm_corr = mt["corr"]
    assert m_corr > mm_corr + 0.05
    assert m_corr > meta["matched_corr"] - 0.15, (m_corr, meta["matched_corr"])
    assert mt["mcd"][0] < mt["mcd"][1], mt["mcd"]


def test_golden_student_pallas_and_streaming_match_xla():
    """The fused-Pallas one-shot path and the streaming path (pinned base
    noise) must track like the XLA path ON TRAINED WEIGHTS — trained flows
    have peaked scales where random-weight parity can miss real error."""
    from nsynth_wavenet_tpu.models import parallelgen

    pwn, params, meta = _student_golden()
    mels, _ = eval_mels(n=8)
    mels = jnp.asarray(mels)
    L = pwn.sample_length(mels.shape[1])
    x = pwn.base_noise(jax.random.PRNGKey(7), mels.shape[0], L)

    ff, _ = pwn.feed_forward(params, {"mel": mels, "base_x": x})
    xla = np.asarray(pwn._clip_quant_scale(ff["x"]))
    pal = np.asarray(pwn._clip_quant_scale(parallelgen.feed_forward_pallas(
        pwn, params, {"mel": mels, "base_x": x}, interpret=True)["x"]))
    assert np.corrcoef(xla.ravel(), pal.ravel())[0, 1] > 0.999

    st = parallelgen.StudentStreamer(pwn, chunk=1024, tile=256,
                                     interpret=True)
    strm = st.synthesize(params, mels, base_x=np.asarray(x))
    assert np.corrcoef(pal.ravel(), strm.ravel())[0, 1] > 0.999
