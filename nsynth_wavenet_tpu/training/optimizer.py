"""Optimizer scaffolding: piecewise-constant LR, Adam, EMA with
num_updates warmup, optional global-norm grad clip.

Matches reference train_wavenet.py:141-162:
  * LR: chained tf.cond over the schedule dict == piecewise-constant on the
    global step.
  * AdamOptimizer(lr, epsilon=1e-8).
  * tf.train.ExponentialMovingAverage(decay=0.9999, num_updates=global_step):
    effective decay = min(0.9999, (1 + t) / (10 + t)), shadow initialized to
    the variable's initial value, updated after the gradient step.
  * optional clip_by_global_norm(1.0) behind GRAD_CLIP (train_wavenet.py:14).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

EMA_DECAY = 0.9999
ADAM_EPS = 1e-8


def piecewise_constant_lr(schedule: Tuple[Tuple[int, float], ...]):
    """schedule: ((step, lr), ...) ascending -> fn(step) -> lr."""
    pairs = sorted(schedule)
    boundaries = np.array([s for s, _ in pairs[1:]], np.int32)
    values = np.array([v for _, v in pairs], np.float32)

    def lr_fn(step):
        idx = jnp.searchsorted(jnp.asarray(boundaries), step, side="right")
        return jnp.asarray(values)[idx]

    return lr_fn


def make_optimizer(lr_schedule, grad_clip: bool = False) -> optax.GradientTransformation:
    lr_fn = piecewise_constant_lr(lr_schedule)
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(1.0))
    parts.append(optax.scale_by_adam(eps=ADAM_EPS))
    parts.append(optax.scale_by_learning_rate(lr_fn))
    return optax.chain(*parts)


def ema_decay_at(step):
    """TF ExponentialMovingAverage with num_updates warmup."""
    t = jnp.asarray(step, jnp.float32)
    return jnp.minimum(EMA_DECAY, (1.0 + t) / (10.0 + t))


def ema_update(ema_params, new_params, step):
    """shadow <- decay * shadow + (1 - decay) * param (applied post-update)."""
    d = ema_decay_at(step)
    return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, ema_params, new_params)
