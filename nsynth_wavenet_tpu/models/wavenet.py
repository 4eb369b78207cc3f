"""Teacher WaveNet: mel-upsampling deconv stack + gated dilated-conv stack
with residual/skip paths and CE / MoL / single-Gaussian output heads.

Functional re-design of reference wavenet/wavenet.py:94-315 (class Wavenet):
parameters live in an explicit pytree, every apply function is pure, and the
data-dependent weight-norm init is a pure pass returning rescaled params
instead of in-graph variable assignment.  Topology and numerics follow
SURVEY.md §2.3 exactly:

  * signal encoding (mu-law 256-way or raw 16-bit), wavenet.py:157-178
  * shift_right -> conv_start -> skip_start, wavenet.py:225-239
  * per layer i: dilation 2^(i % num_stages), dilated conv to gate_width,
    1x1 mel conditioning added with center trim, sigmoid*tanh gate,
    1x1 residual and skip, wavenet.py:244-278
  * output head relu -> out1 + mel cond -> relu -> out2, wavenet.py:280-288
  * deconv mel upsampler (two transposed/resize convs, x200), wavenet.py:46-73
"""

from typing import Optional

import jax
import jax.numpy as jnp

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.ops import conv as conv_ops
from nsynth_wavenet_tpu.ops import distributions as dist
from nsynth_wavenet_tpu.ops import signal as sig
from nsynth_wavenet_tpu.ops import stft as stft_ops
from nsynth_wavenet_tpu.utils import logging_utils


def condition_add(x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
    """Add upsampled conditioning to x, center-trimming cond to x's length
    (reference wavenet/wavenet.py:76-85)."""
    x_len, cond_len = x.shape[1], cond.shape[1]
    assert cond_len >= x_len, (cond_len, x_len)
    left = (cond_len - x_len) // 2
    return x + jax.lax.dynamic_slice_in_dim(cond, left, x_len, axis=1)


def _dropout(rng, x, rate):
    """Inverted dropout with masks from XLA's RngBitGenerator ('rbg' impl)
    instead of counter-based threefry: measured 2.5x faster mask
    generation (0.46 vs 1.15 ms per teacher dropout_inputs mask pair,
    device-chained interleaved A/B) — a small but free win.  Dropout needs
    Bernoulli statistics, not cross-backend mask reproducibility — the
    reference's TF dropout is likewise backend-seeded (wavenet.py:229-239).
    The caller-supplied threefry key still determines the stream (folded
    into the rbg key), so runs remain seeded."""
    keep = 1.0 - rate
    if jnp.issubdtype(rng.dtype, jnp.unsignedinteger):  # raw PRNGKey array
        data = rng
    else:  # typed key
        data = jax.random.key_data(rng)
    data = data.ravel().astype(jnp.uint32)
    rbg_key = jax.random.wrap_key_data(
        jnp.concatenate([data, data])[:4], impl="rbg"
    )
    mask = jax.random.bernoulli(rbg_key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Deconv (mel upsampling) stack — shared by teacher and student
# ---------------------------------------------------------------------------


def init_deconv_stack(key, deconv_config, num_mel, deconv_width, use_weight_norm):
    params = {}
    in_ch = num_mel
    keys = jax.random.split(key, len(deconv_config))
    for i, (fl, _) in enumerate(deconv_config):
        params[f"up_{i + 1}"] = conv_ops.conv1d_init(
            keys[i], in_ch, deconv_width, fl, use_weight_norm=use_weight_norm
        )
        in_ch = deconv_width
    return params


def apply_deconv_stack(
    params,
    mel,
    *,
    deconv_config,
    upsample_act: str,
    use_resize_conv: bool,
    init: bool = False,
    dtype=None,
    out_dtype=None,
    detail=None,
    detail_prefix: str = "",
):
    """mel [B, T, num_mel] -> encoding [B, T * frame_shift, deconv_width].

    Returns (encoding, new_params); new_params differs only when init=True
    (data-dependent init of weight-normed layers, pre-activation moments).

    detail: optional dict — when given (DETAIL_LOG, reference
    wavenet.py:68-71), each upsampling layer's post-activation stream gets
    an on-device histogram summary under 'hist/{prefix}mel_en_{i}' (with
    tanh upsampling the spike should sit at 0, per the reference's note).
    """
    act = conv_ops.get_upsample_act(upsample_act)
    new_params = dict(params)
    h = mel
    for i, (_, stride) in enumerate(deconv_config):
        name = f"up_{i + 1}"
        p = params[name]
        if init:
            if use_resize_conv:
                h, p_new = conv_ops.resize_conv1d_ddi(p, h, stride=stride)
            else:
                h, p_new = conv_ops.trans_conv1d_ddi(p, h, stride=stride)
            new_params[name] = p_new
        else:
            if use_resize_conv:
                h = conv_ops.resize_conv1d(p, h, stride=stride, dtype=dtype,
                                           out_dtype=out_dtype)
            else:
                h = conv_ops.trans_conv1d(p, h, stride=stride, dtype=dtype,
                                          out_dtype=out_dtype)
        h = act(h)
        if detail is not None:
            detail[f"hist/{detail_prefix}mel_en_{i}"] = (
                logging_utils.device_histogram(h)
            )
    return h, new_params


def apply_deconv_stack_any_length(
    params,
    mel,
    num_frames,
    *,
    deconv_config,
    upsample_act: str,
    use_resize_conv: bool,
    dtype=None,
):
    """Length-agnostic deconv stack: ``mel`` [B, T_pad, C] is padded to a
    fixed bucket length and ``num_frames`` (a traced int32 scalar) marks the
    real prefix.  Returns encoding [B, T_pad * prod(strides), deconv_width]
    whose first ``num_frames * prod(strides)`` positions equal
    ``apply_deconv_stack`` on the unpadded mel (mathematically exact; XLA's
    shape-dependent scheduling leaves float-rounding-level differences
    ~1e-7), and zero beyond.

    Why exact: both upsampling convs are linear in their input, so zeroed
    padding frames contribute nothing, and masking each activation's padded
    tail to zero reproduces precisely the implicit zero edge-padding the
    unpadded run would have seen (trans conv pads ``stride-1+fwd_pad_left``
    zeros on the right; resize conv's SAME pad likewise).  This removes the
    per-mel-length recompile of the streaming paths: one compile per
    (batch, bucket) serves every real length <= bucket.
    """
    act = conv_ops.get_upsample_act(upsample_act)
    h = mel
    real = num_frames
    for i, (_, stride) in enumerate(deconv_config):
        # zero the padded tail so it cannot leak into real outputs
        idx = jnp.arange(h.shape[1])
        h = jnp.where(idx[None, :, None] < real, h, 0.0)
        p = params[f"up_{i + 1}"]
        if use_resize_conv:
            h = conv_ops.resize_conv1d(p, h, stride=stride, dtype=dtype)
        else:
            h = conv_ops.trans_conv1d(p, h, stride=stride, dtype=dtype)
        h = act(h)
        real = real * stride
    idx = jnp.arange(h.shape[1])
    return jnp.where(idx[None, :, None] < real, h, 0.0)


class Wavenet:
    """Stateless model object: holds only the (hashable, frozen) config.

    All methods are pure functions of (params, inputs) and safe to close
    over inside jit.
    """

    def __init__(self, cfg: config_lib.WavenetConfig):
        self.cfg = cfg
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    # -- parameters --------------------------------------------------------

    def init_params(self, key, num_mel: int = stft_ops.MEL_PARAMS.num_mel):
        cfg = self.cfg
        wn = cfg.use_weight_norm
        k_deconv, k_start, k_skip, k_out1, k_cond_out1, k_out2, k_layers = jax.random.split(key, 7)
        params = {
            "deconv": init_deconv_stack(
                k_deconv, cfg.deconv_config, num_mel, cfg.deconv_width, wn
            ),
            "conv_start": conv_ops.conv1d_init(
                k_start, 1, cfg.width, cfg.filter_length, use_weight_norm=wn
            ),
            "skip_start": conv_ops.conv1d_init(
                k_skip, cfg.width, cfg.skip_width, 1, use_weight_norm=wn
            ),
            "out1": conv_ops.conv1d_init(
                k_out1, cfg.skip_width, cfg.skip_width, 1, use_weight_norm=wn
            ),
            "mel_cond_out1": conv_ops.conv1d_init(
                k_cond_out1, cfg.deconv_width, cfg.skip_width, 1, use_weight_norm=wn
            ),
            "out2": conv_ops.conv1d_init(
                k_out2, cfg.skip_width, cfg.out_width, 1, use_weight_norm=wn
            ),
            "layers": [],
        }
        for i in range(cfg.num_layers):
            kd, kc, kr, ks, k_layers = jax.random.split(k_layers, 5)
            params["layers"].append(
                {
                    "dilated": conv_ops.conv1d_init(
                        kd, cfg.width, cfg.gate_width, cfg.filter_length, use_weight_norm=wn
                    ),
                    "mel_cond": conv_ops.conv1d_init(
                        kc, cfg.deconv_width, cfg.gate_width, 1, use_weight_norm=wn
                    ),
                    "res": conv_ops.conv1d_init(
                        kr, cfg.gate_width // 2, cfg.width, 1, use_weight_norm=wn
                    ),
                    "skip": conv_ops.conv1d_init(
                        ks, cfg.gate_width // 2, cfg.skip_width, 1, use_weight_norm=wn
                    ),
                }
            )
        return params

    # -- forward -----------------------------------------------------------

    def encode_signal(self, inputs):
        """See ops.signal.encode_signal (reference wavenet.py:157-178)."""
        return sig.encode_signal(
            inputs["wav"], use_mu_law=self.cfg.use_mu_law, quant_chann=self.cfg.quant_chann
        )

    def deconv_stack(self, params, mel, init: bool = False, detail=None):
        enc, new_deconv = apply_deconv_stack(
            params["deconv"],
            mel,
            deconv_config=self.cfg.deconv_config,
            upsample_act=self.cfg.upsample_act,
            use_resize_conv=self.cfg.use_resize_conv,
            init=init,
            dtype=None if init else self.dtype,
            out_dtype=None if init else self.dtype,
            detail=detail,
        )
        return enc, new_deconv

    def feed_forward(
        self,
        params,
        inputs,
        *,
        init: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ):
        """inputs: {'wav_scaled': [B, L], 'mel': [B, T, num_mel]}.

        Returns ({'encoding', 'out_params'}, new_params).  new_params only
        differs from params when init=True (data-dependent init pass).
        Dropout (dropout_inputs rate .5 / dropout_all rate .05) is applied
        only when a dropout_rng is provided and the model is not acting as a
        frozen distillation teacher (reference wavenet.py:204-206, 229-239).
        """
        cfg = self.cfg
        dtype = None if init else self.dtype
        new_params = {k: v for k, v in params.items()}
        new_params["layers"] = list(params["layers"])

        use_dropout = (
            (cfg.dropout_inputs or cfg.dropout_all)
            and not cfg.use_as_teacher
            and dropout_rng is not None
        )
        rate = cfg.resolved_dropout_rate
        drop_keys = iter(
            jax.random.split(dropout_rng, 2 + cfg.num_layers) if use_dropout else []
        )

        def apply(p, x, *, dilation=1, causal=True):
            if init:
                assert cfg.use_weight_norm, "data-dependent init requires weight norm"
                return conv_ops.conv1d_ddi(p, x, dilation=dilation, causal=causal)
            # out_dtype=dtype keeps the whole residual trunk in bf16: the
            # training step is HBM-bound on activation traffic, not FLOPs
            # (benchmarks/profile_teacher.py); master params/grads stay f32
            return conv_ops.conv1d(
                p, x, dilation=dilation, causal=causal, dtype=dtype, out_dtype=dtype
            ), p

        detail = {} if (cfg.detail_log and not init) else None
        mel_en, new_params["deconv"] = self.deconv_stack(
            params, inputs["mel"], init=init, detail=detail
        )

        x_scaled = inputs["wav_scaled"][..., None]  # [B, L, 1]
        l = conv_ops.shift_right(x_scaled)
        l, new_params["conv_start"] = apply(params["conv_start"], l)
        if use_dropout and cfg.dropout_all:
            l = _dropout(next(drop_keys), l, rate)

        s, new_params["skip_start"] = apply(params["skip_start"], l)
        if use_dropout and cfg.dropout_inputs:
            l = _dropout(next(drop_keys), l, rate)
            s = _dropout(next(drop_keys), s, rate)

        m = cfg.gate_width // 2

        def layer_body(lp, l, mel_en, dilation):
            """One gated residual layer -> (res_delta, skip_delta); pure in
            (lp, l, mel_en) so it can be rematerialized wholesale."""
            d = conv_ops.conv1d(
                lp["dilated"], l, dilation=dilation, causal=True, dtype=dtype,
                out_dtype=dtype,
            )
            c = conv_ops.conv1d(lp["mel_cond"], mel_en, dtype=dtype, out_dtype=dtype)
            d = condition_add(d, c)
            d = jax.nn.sigmoid(d[:, :, :m]) * jnp.tanh(d[:, :, m:])
            r = conv_ops.conv1d(lp["res"], d, dtype=dtype, out_dtype=dtype)
            sk = conv_ops.conv1d(lp["skip"], d, dtype=dtype, out_dtype=dtype)
            return r, sk

        if cfg.remat and not init:
            # recompute each layer's gate/residual activations in the
            # backward pass instead of storing num_layers x [B, L, gate_width]
            layer_body = jax.checkpoint(layer_body, static_argnums=(3,))

        for i in range(cfg.num_layers):
            dilation = 2 ** (i % cfg.num_stages)
            lp = dict(params["layers"][i])
            if init:
                d, lp["dilated"] = apply(lp["dilated"], l, dilation=dilation)
                c, lp["mel_cond"] = apply(lp["mel_cond"], mel_en)
                d = condition_add(d, c)
                d = jax.nn.sigmoid(d[:, :, :m]) * jnp.tanh(d[:, :, m:])
                r, lp["res"] = apply(lp["res"], d)
                sk, lp["skip"] = apply(lp["skip"], d)
            else:
                r, sk = layer_body(lp, l, mel_en, dilation)
            l = l + r
            s = s + sk
            if use_dropout and cfg.dropout_all:
                l = _dropout(next(drop_keys), l, rate)
            new_params["layers"][i] = lp

        s = jax.nn.relu(s)
        s, new_params["out1"] = apply(params["out1"], s)
        c, new_params["mel_cond_out1"] = apply(params["mel_cond_out1"], mel_en)
        s = condition_add(s, c)
        s = jax.nn.relu(s)
        out, new_params["out2"] = apply(params["out2"], s)

        # distribution heads (CE log-softmax, MoL CDF deltas over 2^-16-wide
        # bins, Gaussian log-pdf) need f32
        ff = {"encoding": mel_en, "out_params": out.astype(jnp.float32)}
        if detail is not None:
            ff["detail"] = detail
        return ff, new_params

    # -- loss --------------------------------------------------------------

    def calculate_loss(self, ff_dict):
        """ff_dict needs 'out_params' + targets from encode_signal
        (reference wavenet.py:293-315).  With detail_log the loss dict
        carries the ff detail histograms plus, for the gauss head, the
        mean/std/log_std histograms (reference wavenet.py:308-312) — the
        README names these the practical convergence diagnostics."""
        cfg = self.cfg
        out = ff_dict["out_params"]
        if cfg.loss_type == "ce":
            loss = dist.ce_loss(out, ff_dict["cate_targets"])
        elif cfg.loss_type == "mol":
            loss = dist.mol_loss(out, ff_dict["real_targets"], cfg.quant_chann)
        else:
            loss = dist.gauss_loss(out, ff_dict["real_targets"])
        ld = {"loss": loss}
        if cfg.detail_log:
            ld.update(ff_dict.get("detail", {}))
            if cfg.loss_type == "gauss":
                mean, std = dist.mean_std_from_out_params(out)
                ld["hist/mean"] = logging_utils.device_histogram(mean)
                ld["hist/std"] = logging_utils.device_histogram(std)
                ld["hist/log_std"] = logging_utils.device_histogram(
                    jnp.log(std)
                )
        return ld

    # -- convenience -------------------------------------------------------

    def forward_loss(self, params, wav, mel, dropout_rng=None):
        """wav [B, L], mel [B, T, num_mel] -> scalar loss dict."""
        enc = self.encode_signal({"wav": wav})
        ff, _ = self.feed_forward(
            params, {"wav_scaled": enc["wav_scaled"], "mel": mel}, dropout_rng=dropout_rng
        )
        ff.update(enc)
        return self.calculate_loss(ff)

    def data_dep_init(self, params, wav, mel, dropout_rng=None):
        """Pure data-dependent init: returns (ff_dict, rescaled_params)."""
        enc = self.encode_signal({"wav": wav})
        ff, new_params = self.feed_forward(
            params,
            {"wav_scaled": enc["wav_scaled"], "mel": mel},
            init=True,
            dropout_rng=dropout_rng,
        )
        return ff, new_params
