"""Distribution-layer tests: log-prob math vs naive numpy, sampler
statistics, edge-bin handling (reference wavenet/loss_func.py semantics)."""

import jax
import numpy as np
import scipy.special

from nsynth_wavenet_tpu.ops import distributions as dist


def _naive_mol_log_probs(params, targets, qc):
    lp, means, log_scales = np.split(params, 3, axis=-1)
    log_scales = np.maximum(log_scales, -7.0)
    inv = np.exp(-log_scales)
    t = targets[..., None]
    plus = inv * (t - means + 1.0 / qc)
    minus = inv * (t - means - 1.0 / qc)
    cdf_d = scipy.special.expit(plus) - scipy.special.expit(minus)
    log_cdf_plus = plus - np.logaddexp(0, plus)
    log_om_cdf_min = -np.logaddexp(0, minus)
    max_thres = ((qc - 1) - 0.5) / (qc / 2) - 1.0
    min_thres = 0.5 / (qc / 2) - 1.0
    lp_x = np.where(
        t < min_thres,
        log_cdf_plus,
        np.where(t > max_thres, log_om_cdf_min, np.log(np.maximum(cdf_d, 1e-12))),
    )
    lp_x = lp_x + lp - scipy.special.logsumexp(lp, axis=-1, keepdims=True)
    return scipy.special.logsumexp(lp_x, axis=-1)


def test_mol_log_probs_matches_naive():
    rng = np.random.RandomState(0)
    params = rng.randn(3, 50, 30).astype(np.float32)
    targets = np.clip(rng.uniform(-1, 1, (3, 50)), -1, 1 - 2 / 256).astype(np.float32)
    got = np.asarray(dist.mol_log_probs(params, targets, 256))
    want = _naive_mol_log_probs(params, targets, 256)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mol_log_probs_edge_bins():
    # targets at the extremes hit the open tails; probs over all 256 bins sum to 1
    params = np.zeros((1, 1, 3), np.float32)  # single component at 0, log_scale 0
    qc = 256
    bins = (np.arange(qc) - qc / 2 + 0.0) / (qc / 2)
    lp = np.asarray(dist.mol_log_probs(np.tile(params, (1, qc, 1)), bins[None], qc))
    total = np.exp(lp).sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-3)


def test_gauss_log_prob():
    rng = np.random.RandomState(1)
    mean = rng.randn(10).astype(np.float32)
    log_std = rng.uniform(-2, 0, 10).astype(np.float32)
    x = rng.randn(10).astype(np.float32)
    params = np.stack([mean, log_std], axis=-1)
    got = np.asarray(dist.gauss_log_prob(params, x))
    std = np.exp(log_std)
    want = -0.5 * np.log(2 * np.pi * std**2) - (x - mean) ** 2 / (2 * std**2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mog_log_prob_reduces_to_gauss():
    """A MoG with identical components equals the single Gaussian."""
    rng = np.random.RandomState(2)
    mean = rng.randn(20).astype(np.float32)
    log_std = rng.uniform(-1, 0, 20).astype(np.float32)
    x = rng.randn(20).astype(np.float32)
    g = np.asarray(dist.gauss_log_prob(np.stack([mean, log_std], -1), x))
    mog_params = np.concatenate(
        [
            np.zeros((20, 3), np.float32),  # equal logits
            np.repeat(mean[:, None], 3, 1),
            np.repeat(log_std[:, None], 3, 1),
        ],
        axis=-1,
    )
    m = np.asarray(dist.mog_log_prob(mog_params, x))
    np.testing.assert_allclose(m, g, rtol=1e-4, atol=1e-5)


def test_ce_sample_statistics():
    qc = 256
    logits = np.zeros((5000, qc), np.float32)
    logits[:, 10] = 8.0  # heavily favor class 10 (p ~ e^8/(e^8+255) ~ 0.92)
    s = np.asarray(dist.ce_sample(jax.random.PRNGKey(0), logits, qc))
    assert s.shape == (5000,)
    # class 10 -> value 10 - 128 = -118
    assert (s == -118).mean() > 0.5
    assert s.min() >= -qc // 2 and s.max() < qc // 2


def test_mol_sample_statistics():
    qc = 256
    # one dominant logistic at mean 0.5, tiny scale
    params = np.zeros((8000, 1, 3), np.float32)
    params[..., 1] = 0.5  # mean
    params[..., 2] = -5.0  # log scale
    s = np.asarray(dist.mol_sample(jax.random.PRNGKey(1), params, qc))
    x = s / (qc / 2)
    assert abs(x.mean() - 0.5) < 0.01
    assert x.std() < 0.05


def test_gauss_and_mog_samples_in_range():
    qc = 2**16
    rng = np.random.RandomState(3)
    gp = np.stack([rng.randn(1000) * 0.1, np.full(1000, -2.0)], -1).astype(np.float32)
    s = np.asarray(dist.gauss_sample(jax.random.PRNGKey(2), gp, qc))
    assert s.min() >= -qc // 2 and s.max() < qc // 2
    mogp = rng.randn(1000, 9).astype(np.float32)
    s2 = np.asarray(dist.mog_sample(jax.random.PRNGKey(3), mogp, qc))
    assert s2.min() >= -qc // 2 and s2.max() < qc // 2


def test_mog_loss_finite():
    rng = np.random.RandomState(4)
    params = rng.randn(2, 100, 9).astype(np.float32)
    x = rng.uniform(-1, 1, (2, 100)).astype(np.float32)
    assert np.isfinite(float(dist.mog_loss(params, x)))


def test_logistic_noise_statistics():
    z = np.asarray(dist.logistic_0_1(jax.random.PRNGKey(4), (100_000,)))
    # logistic(0,1): mean 0, std pi/sqrt(3) ~ 1.8138
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - np.pi / np.sqrt(3)) < 0.02