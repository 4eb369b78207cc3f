"""DETAIL_LOG observability parity (reference wavenet.py:17 module flag).

The reference's practical convergence diagnostics (Readme.md:122-130):
per-flow scale/log_scale/mean scalars (parallel_wavenet.py:279-282),
deconv-activation histograms (wavenet.py:68-71) and gauss-head
mean/std/log_std histograms (wavenet.py:308-312).  Here they ride the
train-step metrics as on-device fixed-shape histogram summaries
(logging_utils.device_histogram) and reach TensorBoard through
MetricsWriter.add_histogram_raw — these tests gate both halves end to end,
including the tags landing in a real events file.
"""

import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.parallel_wavenet import ParallelWavenet
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.training import optimizer as opt_lib
from nsynth_wavenet_tpu.training import train_lib
from nsynth_wavenet_tpu.utils import logging_utils

TINY = dict(
    num_layers=4,
    num_stages=2,
    width=16,
    skip_width=8,
    deconv_width=16,
    wave_length=1280,
    compute_dtype="float32",
)


def _wav(batch=2, length=1280, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(length) / 16000.0
    return np.clip(
        0.3 * np.sin(2 * np.pi * 200 * t)[None] + 0.02 * rng.randn(batch, length),
        -0.99, 0.99,
    ).astype(np.float32)


def test_device_histogram_counts_and_moments():
    x = jnp.asarray(np.linspace(-2.0, 2.0, 257, dtype=np.float32))
    h = jax.jit(logging_utils.device_histogram)(x)
    counts = np.asarray(h["counts"])
    assert counts.sum() == x.size  # every element lands in exactly one bin
    assert float(h["min"]) == -2.0 and float(h["max"]) == 2.0
    np.testing.assert_allclose(float(h["sum"]), float(np.sum(x)), rtol=1e-5)
    np.testing.assert_allclose(
        float(h["sum_sq"]), float(np.sum(np.asarray(x) ** 2)), rtol=1e-5
    )
    # constant input: all mass in one bin, no div-by-zero
    hc = jax.jit(logging_utils.device_histogram)(jnp.full((64,), 3.0))
    assert np.asarray(hc["counts"]).sum() == 64


def test_teacher_gauss_detail_metrics():
    """detail_log=True surfaces deconv + gauss-head histograms in the train
    metrics; detail_log=False keeps metrics scalar-only (default cost)."""
    cfg = config_lib.WavenetConfig(
        use_mu_law=False, loss_type="gauss", detail_log=True, **TINY
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
    state = train_lib.make_train_state(params, optimizer)
    step = jax.jit(train_lib.make_wavenet_train_step(model, optimizer))
    wav = _wav()
    _, metrics = step(state, wav, jax.random.PRNGKey(1))

    n_deconv = len(cfg.deconv_config)
    for i in range(n_deconv):
        assert f"hist/mel_en_{i}" in metrics
    for tag in ("hist/mean", "hist/std", "hist/log_std"):
        assert tag in metrics
    h = jax.device_get(metrics["hist/mel_en_0"])
    assert np.asarray(h["counts"]).sum() > 0
    # std is positive so log_std histogram must be finite
    hls = jax.device_get(metrics["hist/log_std"])
    assert np.isfinite(float(hls["min"])) and np.isfinite(float(hls["max"]))

    cfg_off = config_lib.WavenetConfig(use_mu_law=False, loss_type="gauss", **TINY)
    model_off = Wavenet(cfg_off)
    step_off = jax.jit(train_lib.make_wavenet_train_step(model_off, optimizer))
    _, m_off = step_off(state, wav, jax.random.PRNGKey(1))
    assert not any(k.startswith("hist/") for k in m_off)


def test_student_per_flow_detail_scalars():
    te_cfg = config_lib.WavenetConfig(
        use_mu_law=False, loss_type="gauss", double_gate_width=False,
        use_as_teacher=True, **TINY,
    )
    teacher = Wavenet(te_cfg)
    te_params = teacher.init_params(jax.random.PRNGKey(0))
    st = {k: v for k, v in TINY.items()
          if k not in ("skip_width", "num_layers")}
    st_cfg = config_lib.ParallelWavenetConfig(
        loss_type="gauss", num_iaf_layers=(2, 2), use_share_deconv=True,
        power_loss_factor=1.0, detail_log=True, **st,
    )
    pwn = ParallelWavenet(st_cfg, teacher)
    st_params = pwn.init_params(jax.random.PRNGKey(1))
    opt = train_lib.make_student_optimizer(st_cfg, st_params)
    state = train_lib.make_train_state(st_params, opt)
    step = jax.jit(train_lib.make_pwn_train_step(pwn, te_params, opt))
    wav = _wav()
    _, metrics = step(state, wav, wav, jax.random.PRNGKey(2))

    for fi in range(pwn.num_flows):
        for tag in (f"scale_{fi}", f"log_scale_{fi}", f"mean_{fi}"):
            assert tag in metrics, tag
            assert np.isfinite(float(metrics[tag]))
    # shared deconv: ONE histogram set, un-prefixed (reference logs the
    # shared stack under its own scope, parallel_wavenet.py:189-198)
    assert "hist/mel_en_0" in metrics
    # per-flow scale means must equal exp of per-flow log-scale means only
    # in expectation, but both must be sane: scale in (0, e^7]
    assert 0.0 < float(metrics["scale_0"]) <= np.exp(7.0)


def test_metrics_writer_histogram_tags_in_events(tmp_path):
    """The full path: device metrics -> runner host conversion ->
    MetricsWriter -> tags present in the TB events file on disk."""
    logdir = str(tmp_path / "tb")
    w = logging_utils.MetricsWriter(logdir)
    h = jax.jit(logging_utils.device_histogram)(
        jnp.asarray(np.random.RandomState(0).randn(512).astype(np.float32))
    )
    from nsynth_wavenet_tpu.training.runner import _host_metrics

    m = _host_metrics({"loss": jnp.float32(1.5), "hist/mel_en_0": h})
    assert isinstance(m["loss"], float) and isinstance(m["hist/mel_en_0"], dict)
    w.write(3, m)
    w.close()
    events = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert events, os.listdir(logdir)
    blob = b"".join(open(e, "rb").read() for e in events)
    assert b"hist/mel_en_0" in blob
    assert b"loss" in blob
