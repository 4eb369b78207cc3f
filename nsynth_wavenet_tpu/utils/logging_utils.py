"""Logging glue: console + per-run train.log file, config dumps, and
TensorBoard scalar writing (reference auxilaries/enhance_log.py + the
summary wiring in train_wavenet.py:145-158)."""

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


class MetricsWriter:
    """TensorBoard scalars via tensorboardX (summaries every step batch,
    replacing the reference's 600 s summary saver)."""

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
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        if self._w is not None:
            self._w.close()
