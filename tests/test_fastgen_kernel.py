"""Pallas fused-generation kernel tests (interpret mode on CPU).

The kernel must reproduce the XLA lax.scan path's out_params under teacher
forcing — that exercises the full recurrent machinery (ring-buffer DMA,
weight streaming layout, cond fusion, tap history) without sampling
divergence.  Measured TPU numbers live in bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.fastgen import Fastgen
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import fastgen_kernel as fk
from nsynth_wavenet_tpu.ops import stft

# lane-aligned tiny config (the kernel requires multiples of 128)
SMALL = dict(
    num_layers=4,
    num_stages=2,
    width=128,
    skip_width=128,
    deconv_width=128,
    wave_length=1280,
    compute_dtype="float32",
)
B, L = 8, 96


def _setup(loss_type, use_mu_law, seed=0, double_gate=False):
    cfg = config_lib.WavenetConfig(
        loss_type=loss_type,
        use_mu_law=use_mu_law,
        double_gate_width=double_gate,
        upsample_act="leaky_relu",
        **SMALL,
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    t = np.arange(1280) / 16000.0
    wav = 0.4 * np.sin(2 * np.pi * 220 * t)[None] + 0.05 * rng.randn(B, 1280)
    wav = np.clip(wav, -0.99, 0.99).astype(np.float32)
    mel = stft.melspectrogram_np(wav)
    return cfg, model, params, wav, mel


@pytest.mark.parametrize(
    "loss_type,use_mu_law,double_gate",
    [("mol", False, False), ("gauss", False, False), ("ce", True, False),
     ("ce", True, True)],  # double gate = the reference wavenet_ce default
)
def test_kernel_matches_xla_teacher_forced(loss_type, use_mu_law, double_gate):
    cfg, model, params, wav, mel = _setup(loss_type, use_mu_law, double_gate=double_gate)
    fg = Fastgen(model)
    enc, _ = model.deconv_stack(params, jnp.asarray(mel))
    off = (enc.shape[1] - 1280) // 2

    _, want = fg.generate(
        params,
        mel,
        jax.random.PRNGKey(1),
        length=L,
        teacher_force=jnp.asarray(wav),
        cond_offset=off,
        collect_out_params=True,
    )
    want = np.asarray(want)  # [B, L, out_width]

    kw = fk.build_kernel_weights(cfg, params)
    seg = kw.pop("out_pad_seg")
    kw.pop("out_pad")
    gen = fk.make_generate_fn(
        cfg, B, L, teacher_forced=True, collect_out_params=True, greedy=True,
        interpret=True,
    )
    enc_t = jnp.transpose(enc, (1, 0, 2))[off : off + L]
    _, outp = gen(kw, enc_t, 123, tf=jnp.transpose(jnp.asarray(wav[:, :L])))
    outp = np.asarray(outp)

    if loss_type == "mol":
        nr = cfg.mol_mix
        got = np.concatenate(
            [outp[:, :, s * seg : s * seg + nr] for s in range(3)], axis=-1
        )
    else:
        got = outp[:, :, : cfg.out_width]
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=5e-3 * scale, rtol=0)


def test_kernel_int8_close_to_bf16():
    """int8 per-channel weights must stay close to bf16 in out_params."""
    cfg, model, params, wav, mel = _setup("mol", False)
    enc, _ = model.deconv_stack(params, jnp.asarray(mel))
    off = (enc.shape[1] - 1280) // 2
    enc_t = jnp.transpose(enc, (1, 0, 2))[off : off + L]
    tf = jnp.transpose(jnp.asarray(wav[:, :L]))

    outs = {}
    for wd in (jnp.bfloat16, jnp.int8):
        kw = fk.build_kernel_weights(cfg, params, weight_dtype=wd)
        kw.pop("out_pad"), kw.pop("out_pad_seg")
        gen = fk.make_generate_fn(
            cfg, B, L, weight_dtype=wd, teacher_forced=True,
            collect_out_params=True, greedy=True, interpret=True,
        )
        _, outp = gen(kw, enc_t, 123, tf=tf)
        outs[wd] = np.asarray(outp)
    err = np.abs(outs[jnp.int8] - outs[jnp.bfloat16])
    scale = np.abs(outs[jnp.bfloat16]).max()
    assert err.max() < 0.05 * scale, (err.max(), scale)


def test_kernel_int8_static_scale_close_to_bf16():
    """W8A8 with calibrated static per-layer activation scales
    (act_scale='static': one merged int8 matmul per layer, no per-row
    abs-max pass) must stay close to bf16 under teacher forcing when
    calibrated on the same audio it generates."""
    cfg, model, params, wav, mel = _setup("mol", False)
    fg = Fastgen(model)
    enc, _ = model.deconv_stack(params, jnp.asarray(mel))
    off = (enc.shape[1] - 1280) // 2
    enc_t = jnp.transpose(enc, (1, 0, 2))[off : off + L]
    tf = jnp.transpose(jnp.asarray(wav[:, :L]))
    amax = fg.calibrate_act_amax(params, jnp.asarray(wav), jnp.asarray(mel))
    assert amax.shape == (cfg.num_layers,) and bool(jnp.all(amax > 0))

    outs = {}
    for name, wd, am in (("bf16", jnp.bfloat16, None), ("static", jnp.int8, amax)):
        kw = fk.build_kernel_weights(cfg, params, weight_dtype=wd, act_amax=am)
        kw.pop("out_pad"), kw.pop("out_pad_seg")
        gen = fk.make_generate_fn(
            cfg, B, L, weight_dtype=wd, teacher_forced=True,
            act_scale="static" if am is not None else "row",
            collect_out_params=True, greedy=True, interpret=True,
        )
        _, outp = gen(kw, enc_t, 123, tf=tf)
        outs[name] = np.asarray(outp)
    err = np.abs(outs["static"] - outs["bf16"])
    scale = np.abs(outs["bf16"]).max()
    assert err.max() < 0.05 * scale, (err.max(), scale)


def test_kernel_gate_static_close_to_dynamic():
    """Fixed 1/127 gate scale (gate bounded in (-1, 1)) must stay close to
    the per-row dynamic gate quantization in out_params."""
    cfg, model, params, wav, mel = _setup("mol", False)
    fg = Fastgen(model)
    enc, _ = model.deconv_stack(params, jnp.asarray(mel))
    off = (enc.shape[1] - 1280) // 2
    enc_t = jnp.transpose(enc, (1, 0, 2))[off : off + L]
    tf = jnp.transpose(jnp.asarray(wav[:, :L]))
    amax = fg.calibrate_act_amax(params, jnp.asarray(wav), jnp.asarray(mel))

    outs = {}
    for gs in (False, True):
        kw = fk.build_kernel_weights(
            cfg, params, weight_dtype=jnp.int8, act_amax=amax,
            gate_static=gs,
        )
        kw.pop("out_pad"), kw.pop("out_pad_seg")
        gen = fk.make_generate_fn(
            cfg, B, L, weight_dtype=jnp.int8, act_scale="static",
            gate_scale="static" if gs else "row",
            teacher_forced=True, collect_out_params=True, greedy=True,
            interpret=True,
        )
        _, outp = gen(kw, enc_t, 123, tf=tf)
        outs[gs] = np.asarray(outp)
    err = np.abs(outs[True] - outs[False])
    scale = np.abs(outs[False]).max()
    assert err.max() < 0.05 * scale, (err.max(), scale)


def test_pallas_streaming_equals_full_int8_static():
    """Streaming bit-identity for the static-scale W8A8 variant (ring rows
    carry bare int8 payloads, scales ride in SMEM)."""
    cfg, model, params, wav, mel = _setup("mol", False)
    fg = Fastgen(model)
    amax = fg.calibrate_act_amax(params, jnp.asarray(wav), jnp.asarray(mel))
    kw = dict(
        seed=3, length=96, greedy=True, interpret=True,
        weight_dtype=jnp.int8, act_amax=amax,
    )
    full = np.asarray(fg.generate_pallas(params, mel, **kw))
    chunked = np.asarray(
        fg.generate_pallas(params, mel, chunk=32, mel_bucket=None, **kw)
    )
    np.testing.assert_array_equal(full, chunked)


def test_pallas_streaming_equals_full():
    """Chunked pallas generation (state carried through lbuf/xh/t0) must be
    bit-identical to the single-kernel run in greedy mode."""
    cfg, model, params, wav, mel = _setup("mol", False)
    fg = Fastgen(model)
    full = np.asarray(
        fg.generate_pallas(params, mel, seed=3, length=96, greedy=True, interpret=True)
    )
    chunked = np.asarray(
        fg.generate_pallas(
            params, mel, seed=3, length=96, greedy=True, interpret=True, chunk=32,
            mel_bucket=None,
        )
    )
    np.testing.assert_array_equal(full, chunked)
    # bucketed-deconv streaming: mathematically the same encoding, float
    # rounding differs (~1e-7) -> greedy audio agrees to tolerance
    bucketed = np.asarray(
        fg.generate_pallas(
            params, mel, seed=3, length=96, greedy=True, interpret=True, chunk=32,
        )
    )
    np.testing.assert_allclose(bucketed, full, atol=1e-3)


def test_pallas_streaming_equals_full_int8():
    """Same bit-identity for the W8A8 path: its streaming state carries the
    ring rows PRE-QUANTIZED (int8 payload + log8 exponent lanes), so chunk
    boundaries must reproduce exactly what the single-kernel run computes."""
    cfg, model, params, wav, mel = _setup("mol", False)
    fg = Fastgen(model)
    kw = dict(seed=3, length=96, greedy=True, interpret=True, weight_dtype=jnp.int8)
    full = np.asarray(fg.generate_pallas(params, mel, **kw))
    chunked = np.asarray(
        fg.generate_pallas(params, mel, chunk=32, mel_bucket=None, **kw)
    )
    np.testing.assert_array_equal(full, chunked)


def test_generate_pallas_entrypoint():
    cfg, model, params, wav, mel = _setup("mol", False)
    fg = Fastgen(model)
    audio = np.asarray(
        fg.generate_pallas(params, mel, seed=7, length=L, greedy=True, interpret=True)
    )
    assert audio.shape == (B, L)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0


def test_uniform_from_bits_handles_signed_int32():
    """pltpu.prng_random_bits returns SIGNED int32 on TPU; the uniform
    helper must use a logical shift.  An arithmetic `>> 8` sign-extends
    negative draws (half of all of them) onto the 1e-5 clip floor and caps
    the rest below 0.5 — the regression that silently broke free-running
    sampling while teacher-forced parity stayed perfect."""
    rng = np.random.RandomState(0)
    bits = jnp.asarray(
        rng.randint(-(2**31), 2**31, size=(4096,), dtype=np.int64).astype(np.int32)
    )
    u = np.asarray(fk._uniform_from_bits(bits))
    assert u.min() >= 1e-5 and u.max() <= 1 - 1e-5
    assert (u <= 1e-5).mean() < 1e-2          # no negative-bits pileup at the floor
    assert u.max() > 0.99                     # upper half of [0,1) is reachable
    assert abs(u.mean() - 0.5) < 0.02


def test_quant_log8_roundtrip():
    """The ring-buffer quantizer must reconstruct x ~= q * 2^(e/8) within
    one int8 step at the coarsened scale, keep |q| <= 127 by construction
    (e is CEILed), and behave across wildly different row magnitudes."""
    rng = np.random.RandomState(1)
    x = np.concatenate(
        [
            rng.randn(3, 256).astype(np.float32) * s
            for s in (1e-4, 1.0, 30.0)
        ]
    )
    q, e, r = (np.asarray(a) for a in fk._quant_log8(jnp.asarray(x)))
    assert q.dtype == np.int8 and e.dtype == np.int8
    assert np.abs(q).max() <= 127
    # 1-ULP exp2 difference between XLA and numpy is fine: the read side
    # recomputes r from the int8 exponent anyway, so only e is canonical
    np.testing.assert_allclose(r, np.exp2(e.astype(np.float32) * 0.125), rtol=1e-6)
    # ceil(8*log2(amax/127)) guarantees r >= amax/127: scale granularity is
    # at most 2^(1/8) coarser, so |x - q*r| <= r/2 <= amax * 2^(1/8) / 254
    amax = np.abs(x).max(axis=-1, keepdims=True)
    assert (np.abs(x - q * r) < r / 2 * 1.001 + 1e-9).all()
    assert (r >= amax / 127 - 1e-12).all()


def test_kernel_int8_rs_bf16_close_to_bf16():
    """W8A8 with bf16-streamed res/skip matrices (rs_dtype=bf16: the gate
    feeds the MXU unquantized) must stay at least as close to the bf16
    reference as the all-int8 variant."""
    cfg, model, params, wav, mel = _setup("mol", False)
    enc, _ = model.deconv_stack(params, jnp.asarray(mel))
    off = (enc.shape[1] - 1280) // 2
    enc_t = jnp.transpose(enc, (1, 0, 2))[off : off + L]
    tf = jnp.transpose(jnp.asarray(wav[:, :L]))

    outs = {}
    for name, wd, rsd in (
        ("bf16", jnp.bfloat16, None),
        ("int8", jnp.int8, None),
        ("int8_rsbf16", jnp.int8, jnp.bfloat16),
    ):
        kw = fk.build_kernel_weights(cfg, params, weight_dtype=wd, rs_dtype=rsd)
        kw.pop("out_pad"), kw.pop("out_pad_seg")
        gen = fk.make_generate_fn(
            cfg, B, L, weight_dtype=wd, rs_dtype=rsd, teacher_forced=True,
            collect_out_params=True, greedy=True, interpret=True,
        )
        _, outp = gen(kw, enc_t, 123, tf=tf)
        outs[name] = np.asarray(outp)
    scale = np.abs(outs["bf16"]).max()
    err_rs = np.abs(outs["int8_rsbf16"] - outs["bf16"]).max()
    err_i8 = np.abs(outs["int8"] - outs["bf16"]).max()
    assert err_rs < 0.05 * scale, (err_rs, scale)
    assert err_rs <= err_i8 * 1.5 + 1e-6, (err_rs, err_i8)

