"""Training step construction: one fused XLA program per step.

The reference's hot loop is a slim Supervisor session.run over a graph whose
pieces live on different devices (input queues on CPU, clones on GPUs, grad
sum on CPU — SURVEY.md §3.1).  Here a step is ONE jitted function:

    wav crop -> on-device mel -> forward -> loss -> grad -> Adam ->
    EMA update  (all fused, psum over the 'data' mesh axis by XLA)

State layout: plain dict {'params', 'opt_state', 'ema', 'step'} —
orbax-serializable and shardable leaf-by-leaf.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from nsynth_wavenet_tpu.ops import stft as stft_ops
from nsynth_wavenet_tpu.training import optimizer as opt_lib


def make_train_state(params, optimizer: optax.GradientTransformation):
    return {
        "params": params,
        "opt_state": optimizer.init(params),
        "ema": jax.tree_util.tree_map(jnp.asarray, params),  # shadow = initial value
        "step": jnp.zeros((), jnp.int32),
    }


def make_wavenet_train_step(model, optimizer: optax.GradientTransformation):
    """Returns step_fn(state, wav, rng) -> (new_state, metrics).

    wav: [B, wave_length] raw float audio; mel is computed on device.
    rng: PRNG key for dropout (folded with step inside).
    """
    lr_fn = opt_lib.piecewise_constant_lr(model.cfg.lr_schedule)
    use_dropout = model.cfg.dropout_inputs or model.cfg.dropout_all

    def step_fn(state, wav, rng):
        step = state["step"]
        mel = stft_ops.melspectrogram(wav)
        dropout_rng = jax.random.fold_in(rng, step) if use_dropout else None

        def loss_fn(p):
            return model.forward_loss(p, wav, mel, dropout_rng=dropout_rng)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, new_opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_ema = opt_lib.ema_update(state["ema"], new_params, step)
        new_state = {
            "params": new_params,
            "opt_state": new_opt_state,
            "ema": new_ema,
            "step": step + 1,
        }
        metrics = {"loss": loss, "learning_rate": lr_fn(step)}
        return new_state, metrics

    return step_fn


def jit_train_step(step_fn, batch_sharding=None, donate_state: Optional[bool] = None):
    """jit the step; batch arrives with the data-axis sharding, state keeps
    whatever placement it was given at init (layouts propagate).

    donate_state defaults to True on accelerators (halves state HBM) but
    False on CPU: XLA:CPU's in-process communicator deadlocks when a
    donated buffer feeds a collective (observed with jax 0.9 all-gather).
    """
    if donate_state is None:
        donate_state = jax.default_backend() != "cpu"
    in_shardings = None
    if batch_sharding is not None:
        in_shardings = (None, batch_sharding, None)  # state, wav, rng
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        donate_argnums=(0,) if donate_state else (),
    )


def run_data_dep_init(model, params, wav, mel, dropout_rng: Optional[jax.Array] = None):
    """Jitted data-dependent init pass; returns (out_params stats, new params).

    Reference runs this via a separate placeholder-fed graph + callback
    (train_wavenet.py:68-101); here it's one jitted pure function.
    """

    @jax.jit
    def _init(p, w, m):
        ff, new_p = model.data_dep_init(p, w, m, dropout_rng=dropout_rng)
        return ff["out_params"], new_p

    return _init(params, wav, mel)
