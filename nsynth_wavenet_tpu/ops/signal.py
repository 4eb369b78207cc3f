"""Signal encodings: mu-law companding and linear quantization.

Semantics match the reference exactly (floor/offset conventions):
  * mu-law:      reference auxilaries/utils.py:72-105   (floor(out * 128))
  * inv mu-law:  reference auxilaries/utils.py:108-139  (+0.5 offset, 0 -> 0)
  * quantize:    reference auxilaries/utils.py:142-169  (floor(x * qc / 2))

All functions are pure jnp and work on any array shape; they are used both
on host (numpy inputs promote fine) and inside jitted TPU programs.
"""

import jax.numpy as jnp
import numpy as np


def mu_law(x, mu: int = 255):
    """Mu-law companding: real signal in [-1, 1) -> integer-valued float in
    [-128, 128) (for mu=255).  Uses floor(out * 128) like the reference."""
    out = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    return jnp.floor(out * 128.0)


def inv_mu_law(x, mu: int = 255):
    """Inverse mu-law: integer-valued samples in [-128, 128) -> real signal.

    Adds 0.5 before expanding (bin center) and maps 0 -> 0 exactly.
    """
    x = jnp.asarray(x, jnp.float32)
    out = (x + 0.5) * 2.0 / (mu + 1)
    out = jnp.sign(out) / mu * ((1 + mu) ** jnp.abs(out) - 1)
    return jnp.where(x == 0, x, out)


def cast_quantize(x, quant_chann: int):
    """Real signal in [-1, 1) -> int32 in [-quant_chann/2, quant_chann/2)."""
    return jnp.floor(x * (quant_chann / 2)).astype(jnp.int32)


def inv_cast_quantize(x_quantized, quant_chann: int):
    """Inverse of :func:`cast_quantize` (no bin-center offset, as reference)."""
    return jnp.asarray(x_quantized, jnp.float32) / (quant_chann / 2)


def encode_signal(wav, *, use_mu_law: bool, quant_chann: int):
    """Produce scaled input signal + real/categorical targets.

    Mirrors reference wavenet/wavenet.py:157-178 (Wavenet.encode_signal).

    Returns dict with:
      wav_scaled:   float input to the WaveNet stack, in [-1, 1)
      real_targets: float targets for MoL/Gauss heads
      cate_targets: int32 targets in [0, quant_chann) for the CE head
    """
    half = quant_chann // 2
    if use_mu_law:
        x_quantized = mu_law(wav)
        x_scaled = x_quantized / float(half)
        real_targets = x_scaled
        cate_targets = x_quantized.astype(jnp.int32) + half
    else:
        x_quantized = cast_quantize(wav, quant_chann)
        x_scaled = wav
        real_targets = wav
        cate_targets = x_quantized + half
    # Audio is contractually in [-1, 1); clamp so a stray out-of-range sample
    # yields the edge class instead of a silent out-of-bounds gather (NaN CE).
    cate_targets = jnp.clip(cate_targets, 0, quant_chann - 1)
    return {
        "wav_scaled": x_scaled,
        "real_targets": real_targets,
        "cate_targets": cate_targets,
    }
