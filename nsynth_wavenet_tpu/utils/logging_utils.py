"""Logging glue: console + per-run train.log file, config dumps, and
TensorBoard scalar/histogram writing (reference auxilaries/enhance_log.py +
the summary wiring in train_wavenet.py:145-158 and the DETAIL_LOG
histograms, wavenet.py:68-71/:308-312)."""

import dataclasses
import logging
import os
import sys


def get_logger(name: str = "nsynth_wavenet_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def add_log_file(logdir: str, name: str = "nsynth_wavenet_tpu"):
    """Attach a train.log file handler (reference enhance_log.py:7-19)."""
    logger = get_logger(name)
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, "train.log")
    for h in logger.handlers:
        if isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(path):
            return logger
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(fh)
    return logger


def config_summary(cfg) -> str:
    """Pretty config dump (reference enhance_log.py:36-54)."""
    lines = [type(cfg).__name__ + ":"]
    for f in dataclasses.fields(cfg):
        lines.append(f"  {f.name} = {getattr(cfg, f.name)}")
    return "\n".join(lines)


def device_histogram(x, bins: int = 64):
    """Fixed-size on-device histogram summary for TB DETAIL_LOG.

    The reference hands full activation tensors to tf.summary.histogram
    (wavenet.py:68-71, :308-312); fetching those through this backend's
    tunnel would cost more than the train step.  Instead the histogram is
    reduced ON DEVICE inside the jitted step to a fixed-shape summary
    (bins+4 floats — static shapes, jit-safe) and MetricsWriter feeds it
    to tensorboardX's add_histogram_raw.  Bucket edges are data-dependent
    VALUES (min/max of the batch), which is fine under jit.
    """
    import jax.numpy as jnp

    x = x.astype(jnp.float32).ravel()
    lo = jnp.min(x)
    hi = jnp.max(x)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    idx = jnp.clip(((x - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
    return {
        "counts": counts,
        "min": lo,
        "max": hi,
        "sum": jnp.sum(x),
        "sum_sq": jnp.sum(x * x),
    }


class MetricsWriter:
    """TensorBoard scalars + DETAIL_LOG histograms via tensorboardX
    (summaries every step batch, replacing the reference's 600 s summary
    saver).  Dict-valued metrics produced by ``device_histogram`` are
    written with add_histogram_raw; everything else as scalars."""

    def __init__(self, logdir: str):
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:  # pragma: no cover - tensorboardX optional
            self._w = None

    def write(self, step: int, metrics: dict):
        if self._w is None:
            return
        for k, v in metrics.items():
            if isinstance(v, dict) and "counts" in v:
                self._write_histogram(k, v, step)
                continue
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def _write_histogram(self, tag: str, h: dict, step: int):
        import numpy as _np

        counts = _np.asarray(h["counts"], _np.float64)
        lo, hi = float(h["min"]), float(h["max"])
        if hi <= lo:
            hi = lo + 1.0
        edges = _np.linspace(lo, hi, counts.size + 1)
        try:
            self._w.add_histogram_raw(
                tag,
                min=lo,
                max=hi,
                num=float(counts.sum()),
                sum=float(h["sum"]),
                sum_squares=float(h["sum_sq"]),
                bucket_limits=edges[1:].tolist(),
                bucket_counts=counts.tolist(),
                global_step=step,
            )
        except (TypeError, ValueError):  # pragma: no cover - tbX quirk
            pass

    def close(self):
        if self._w is not None:
            self._w.close()
