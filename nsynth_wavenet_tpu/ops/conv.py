"""Conv primitives: dilated causal conv1d, transposed / resize upsampling
convs, weight-norm parameterization with functional data-dependent init.

TPU-first design notes (vs reference wavenet/masked.py):

  * The reference implements dilation with a time<->batch reshuffle
    (masked.py:72-122, a GPU/cuDNN-era workaround).  Here dilation is
    expressed directly as ``rhs_dilation`` of ``lax.conv_general_dilated``;
    XLA tiles the resulting contraction onto the MXU.
  * Causality is explicit left padding of ``(filter_length-1)*dilation``
    (masked.py:204 pads in time_to_batch space, which is the same thing).
  * Weight norm ``W = g * V / ||V||`` with per-output-channel g
    (masked.py:131-157).  The reference's data-dependent init mutates
    variables under control deps (masked.py:212-225); here it is a pure
    function: ``*_ddi`` variants return ``(y, new_params)`` with g/b rescaled
    so the layer output has mean 0 / std WN_INIT_SCALE over the init batch.
    The rescaled output is computed directly as ``scale*(y-b) + b_new``
    (algebraically identical to re-running the conv with updated g/b).

Param layout: every conv stores its kernel as [filter_length, in_ch, out_ch]
('WIO'); weight-norm layers store {'v','g','b'}, plain layers {'w','b'}.

All apply functions accept an optional ``dtype`` to run the contraction in
bfloat16 on the MXU with float32 accumulation.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

WN_INIT_SCALE = 1.0  # reference masked.py:25
_DN = ("NWC", "WIO", "NWC")


def get_upsample_act(act_str: str):
    """Upsampler activation (reference masked.py:28-36); leaky alpha=0.4."""
    if act_str == "tanh":
        return jnp.tanh
    if act_str == "relu":
        return jax.nn.relu
    if act_str == "leaky_relu":
        return partial(jax.nn.leaky_relu, negative_slope=0.4)
    raise ValueError(f"Unsupported upsample activation: {act_str}")


def shift_right(x: jnp.ndarray) -> jnp.ndarray:
    """Shift time axis right by one, zero-padding the front.

    x: [batch, time, channels] (reference masked.py:39-52).
    """
    return jnp.pad(x, [(0, 0), (1, 0), (0, 0)])[:, :-1, :]


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _l2_norm(v, axis):
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def conv1d_init(
    key,
    in_ch: int,
    out_ch: int,
    filter_length: int,
    *,
    use_weight_norm: bool = False,
    kernel_stddev: float = 0.05,
    bias_init: float = 0.0,
):
    """Init params for a (possibly dilated/causal) conv1d layer."""
    w = kernel_stddev * jax.random.normal(key, (filter_length, in_ch, out_ch), jnp.float32)
    b = jnp.full((out_ch,), bias_init, jnp.float32)
    if use_weight_norm:
        return {"v": w, "g": _l2_norm(w, axis=(0, 1)), "b": b}
    return {"w": w, "b": b}


def effective_kernel(params) -> jnp.ndarray:
    """Return the effective [fl, in, out] kernel (resolving weight norm)."""
    if "v" in params:
        v = params["v"]
        v_norm = v / jnp.maximum(_l2_norm(v, axis=(0, 1))[None, None, :], 1e-12)
        return v_norm * params["g"][None, None, :]
    return params["w"]


def _conv(x, w, *, padding, rhs_dilation=(1,), lhs_dilation=(1,), dtype=None,
          out_dtype=None):
    """conv_general_dilated with optional bf16 mixed precision.

    With a low-precision dtype both operands are cast and the (bf16) result
    cast back to ``out_dtype`` (default f32) — the TPU MXU still accumulates
    bf16 operands in f32 internally.  (Casting only the output via
    preferred_element_type would make the conv non-transposable under
    jax.grad: the f32 cotangent would meet bf16 operands in the transpose
    conv.)  Passing out_dtype=dtype keeps the activation stream in bf16
    between layers — at training shapes the step is HBM-bound on activation
    traffic, not MXU FLOPs (benchmarks/profile_teacher.py), so this halves
    the dominant cost; master weights stay f32 (the w cast's transpose
    re-accumulates the weight gradient in f32).
    """
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=padding,
        rhs_dilation=rhs_dilation,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DN,
    )
    if dtype is not None:
        y = y.astype(out_dtype or jnp.float32)
    return y


# ---------------------------------------------------------------------------
# conv1d (causal / dilated)
# ---------------------------------------------------------------------------


def conv1d(
    params,
    x: jnp.ndarray,
    *,
    dilation: int = 1,
    causal: bool = True,
    dtype: Optional[jnp.dtype] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Dilated 1-D conv over [batch, time, channels], length-preserving.

    causal=True left-pads (filter_length-1)*dilation; causal=False uses SAME
    padding (reference masked.py:193).
    """
    w = effective_kernel(params)
    fl = w.shape[0]
    if causal:
        padding = [((fl - 1) * dilation, 0)]
    else:
        total = (fl - 1) * dilation
        padding = [(total // 2, total - total // 2)]
    y = _conv(x, w, padding=padding, rhs_dilation=(dilation,), dtype=dtype,
              out_dtype=out_dtype)
    return y + params["b"].astype(y.dtype)


def _ddi_rescale(params, y, init_scale: float = WN_INIT_SCALE):
    """Data-dependent-init rescale of (g, b) given the pre-activation y.

    Returns (y_new, new_params).  new_g = g*s, new_b = b - m*s with
    s = init_scale / sqrt(var(y) + 1e-10); y_new recomputed in closed form.
    """
    assert "v" in params, "data-dependent init requires weight norm"
    m = jnp.mean(y, axis=tuple(range(y.ndim - 1)))
    var = jnp.var(y, axis=tuple(range(y.ndim - 1)))
    scale = init_scale / jnp.sqrt(var + 1e-10)
    new_b = params["b"] - m * scale
    new_params = {"v": params["v"], "g": params["g"] * scale, "b": new_b}
    y_new = scale * (y - params["b"]) + new_b
    return y_new, new_params


def conv1d_ddi(params, x, *, dilation: int = 1, causal: bool = True):
    """conv1d + data-dependent init; returns (y, new_params)."""
    y = conv1d(params, x, dilation=dilation, causal=causal)
    return _ddi_rescale(params, y)


# ---------------------------------------------------------------------------
# Transposed (fractionally strided) conv, TF-SAME style: out length = s * L
# ---------------------------------------------------------------------------


def trans_conv1d(
    params,
    x: jnp.ndarray,
    *,
    stride: int,
    dtype: Optional[jnp.dtype] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Transposed conv1d with SAME semantics: [B, L, Cin] -> [B, s*L, Cout].

    Implemented as an input-dilated conv (lhs_dilation=stride), the native
    XLA form of a fractionally-strided conv (reference masked.py:235-291 uses
    tf.nn.conv2d_transpose).  Padding reproduces TF's SAME split for
    filter_length >= stride.
    """
    w = effective_kernel(params)
    fl = w.shape[0]
    assert fl >= stride, "upsampling filters are longer than the stride"
    fwd_pad_left = (fl - stride) // 2
    pl = fl - 1 - fwd_pad_left
    ph = stride - 1 + fwd_pad_left
    y = _conv(x, w, padding=[(pl, ph)], lhs_dilation=(stride,), dtype=dtype,
              out_dtype=out_dtype)
    return y + params["b"].astype(y.dtype)


def trans_conv1d_ddi(params, x, *, stride: int):
    """trans_conv1d + data-dependent init (pre-activation moments)."""
    y = trans_conv1d(params, x, stride=stride)
    return _ddi_rescale(params, y)


# ---------------------------------------------------------------------------
# Resize (nearest-neighbor) upsampling conv
# ---------------------------------------------------------------------------


def resize_conv1d(
    params,
    x: jnp.ndarray,
    *,
    stride: int,
    dtype: Optional[jnp.dtype] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Nearest-neighbor ×stride upsample followed by a SAME conv
    (reference masked.py:294-322)."""
    x_up = jnp.repeat(x, stride, axis=1)
    return conv1d(params, x_up, causal=False, dtype=dtype, out_dtype=out_dtype)


def resize_conv1d_ddi(params, x, *, stride: int):
    x_up = jnp.repeat(x, stride, axis=1)
    y = conv1d(params, x_up, causal=False)
    return _ddi_rescale(params, y)
