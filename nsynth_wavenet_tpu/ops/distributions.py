"""Output distributions: log-probs, losses, and samplers.

Ports the math (not the code) of reference wavenet/loss_func.py:

  * mixture of discretized logistics (MoL) log-prob  (loss_func.py:22-63)
  * single Gaussian log-prob                          (loss_func.py:99-114)
  * CE / MoL / Gauss losses                           (loss_func.py:117-132)
  * categorical / MoL / Gaussian samplers             (loss_func.py:140-206)

Samplers take explicit jax PRNG keys (functional RNG instead of the
reference's graph-level tf.random ops) and return quantized int32 samples in
[-quant_chann/2, quant_chann/2), identical to the reference contract so the
fastgen scan can feed them straight back through inverse mu-law / dequantize.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu.ops import signal as sig


def mol_log_probs(mol_params, targets, quant_chann, use_log_scales=True):
    """Log-likelihood of a mixture of discretized logistics.

    mol_params: [..., 3 * nr_mix] (logit_probs | means | scale_params)
    targets:    [...] rescaled to [-1, 1)
    Returns log_probs with shape targets.shape.
    """
    logit_probs, means, scale_params = jnp.split(mol_params, 3, axis=-1)
    if use_log_scales:
        log_scales = jnp.maximum(scale_params, -7.0)
        inv_stdv = jnp.exp(-log_scales)
    else:
        inv_stdv = 1.0 / jnp.maximum(jax.nn.softplus(scale_params), np.exp(-7.0))

    centered = targets[..., None] - means
    plus_in = inv_stdv * (centered + 1.0 / quant_chann)
    min_in = inv_stdv * (centered - 1.0 / quant_chann)
    cdf_delta = jax.nn.sigmoid(plus_in) - jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log sigmoid(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)

    # Edge bins: below the lowest / above the highest quantization level the
    # discretized logistic integrates to the full tail.
    max_val = float(quant_chann - 1)
    max_thres = (max_val - 0.5) / (quant_chann / 2.0) - 1.0
    min_thres = 0.5 / (quant_chann / 2.0) - 1.0
    t = targets[..., None]
    log_probs = jnp.where(
        t < min_thres,
        log_cdf_plus,
        jnp.where(t > max_thres, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return jax.scipy.special.logsumexp(log_probs, axis=-1)


def mean_std_from_out_params(gauss_params, use_log_scales=True):
    """Split [..., 2] Gaussian head params into (mean, std), both [...]."""
    mean = gauss_params[..., 0]
    std_param = gauss_params[..., 1]
    if use_log_scales:
        std = jnp.exp(jnp.maximum(std_param, -7.0))
    else:
        std = jnp.maximum(jax.nn.softplus(std_param), np.exp(-7.0))
    return mean, std


def gauss_log_prob(gauss_params, targets, use_log_scales=True):
    mean, std = mean_std_from_out_params(gauss_params, use_log_scales)
    var = std**2.0
    return -0.5 * jnp.log(2.0 * np.pi * var) - (targets - mean) ** 2.0 / (2.0 * var)


def mog_log_prob(mog_params, targets, use_log_scales=True):
    """Mixture-of-Gaussians log-prob (reference loss_func.py:78-96).

    mog_params: [..., 3 * nr_mix] (logit_probs | means | std_params).
    """
    logit_probs, means, std_params = jnp.split(mog_params, 3, axis=-1)
    if use_log_scales:
        stds = jnp.exp(jnp.maximum(std_params, -7.0))
    else:
        stds = jnp.maximum(jax.nn.softplus(std_params), np.exp(-7.0))
    var = stds**2.0
    comp_lp = -0.5 * jnp.log(2.0 * np.pi * var) - (targets[..., None] - means) ** 2.0 / (
        2.0 * var
    )
    return jax.scipy.special.logsumexp(
        comp_lp + jax.nn.log_softmax(logit_probs, axis=-1), axis=-1
    )


# ---------------------------------------------------------------------------
# Losses (scalar means)
# ---------------------------------------------------------------------------


def ce_loss(logits, cate_targets):
    """Mean sparse softmax cross entropy; targets int in [0, quant_chann)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, cate_targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def mol_loss(mol_params, real_targets, quant_chann):
    return -jnp.mean(mol_log_probs(mol_params, real_targets, quant_chann))


def gauss_loss(gauss_params, real_targets):
    return -jnp.mean(gauss_log_prob(gauss_params, real_targets))


def mog_loss(mog_params, real_targets):
    return -jnp.mean(mog_log_prob(mog_params, real_targets))


# ---------------------------------------------------------------------------
# Samplers.  All return int32 quantized samples in [-qc/2, qc/2).
# ---------------------------------------------------------------------------


def ce_sample(rng, logits, quant_chann):
    """logits: [..., quant_chann] -> int32 sample [...]"""
    s = jax.random.categorical(rng, logits, axis=-1)
    return s.astype(jnp.int32) - quant_chann // 2


def _uniform_open(rng, shape):
    return jax.random.uniform(rng, shape, minval=1e-5, maxval=1.0 - 1e-5)


def mol_sample(rng, mol_params, quant_chann, use_log_scales=True):
    """mol_params: [..., 3 * nr_mix] -> int32 sample [...]"""
    rng_sel, rng_x = jax.random.split(rng)
    logit_probs, means, scale_params = jnp.split(mol_params, 3, axis=-1)
    nr_mix = logit_probs.shape[-1]

    # Gumbel-max mixture selection.
    ru = _uniform_open(rng_sel, logit_probs.shape)
    sel = jax.nn.one_hot(
        jnp.argmax(logit_probs - jnp.log(-jnp.log(ru)), axis=-1), nr_mix, dtype=mol_params.dtype
    )
    mean = jnp.sum(means * sel, axis=-1)
    if use_log_scales:
        scale = jnp.exp(jnp.clip(jnp.sum(scale_params * sel, axis=-1), -7.0, 7.0))
    else:
        scale = jnp.clip(jnp.sum(scale_params * sel, axis=-1), np.exp(-7.0), np.exp(7.0))

    ru2 = _uniform_open(rng_x, mean.shape)
    x = mean + scale * (jnp.log(ru2) - jnp.log(1.0 - ru2))
    x = jnp.clip(x, -1.0, 1.0 - 2.0 / quant_chann)
    return sig.cast_quantize(x, quant_chann)


def gauss_sample(rng, gauss_params, quant_chann, use_log_scales=True):
    """gauss_params: [..., 2] -> int32 sample [...]"""
    mean, std = mean_std_from_out_params(gauss_params, use_log_scales)
    x = mean + std * jax.random.normal(rng, mean.shape)
    x = jnp.clip(x, -1.0, 1.0 - 2.0 / quant_chann)
    return sig.cast_quantize(x, quant_chann)


def mog_sample(rng, mog_params, quant_chann, use_log_scales=True):
    """Mixture-of-Gaussians sampler (reference loss_func.py:209-214)."""
    rng_sel, rng_x = jax.random.split(rng)
    logit_probs, means, std_params = jnp.split(mog_params, 3, axis=-1)
    nr_mix = logit_probs.shape[-1]
    ru = _uniform_open(rng_sel, logit_probs.shape)
    sel = jax.nn.one_hot(
        jnp.argmax(logit_probs - jnp.log(-jnp.log(ru)), axis=-1), nr_mix, dtype=mog_params.dtype
    )
    mean = jnp.sum(means * sel, axis=-1)
    std_p = jnp.sum(std_params * sel, axis=-1)
    if use_log_scales:
        std = jnp.exp(jnp.clip(std_p, -7.0, 7.0))
    else:
        std = jnp.maximum(jax.nn.softplus(std_p), np.exp(-7.0))
    x = mean + std * jax.random.normal(rng_x, mean.shape)
    x = jnp.clip(x, -1.0, 1.0 - 2.0 / quant_chann)
    return sig.cast_quantize(x, quant_chann)


def logistic_0_1(rng, shape):
    """Standard logistic(0, 1) noise (reference parallel_wavenet.py:172-178)."""
    ru = _uniform_open(rng, shape)
    return jnp.log(ru) - jnp.log(1.0 - ru)
