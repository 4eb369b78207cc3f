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


def make_wavenet_train_step(model, optimizer: optax.GradientTransformation, *, mesh=None):
    """Returns step_fn(state, wav, rng) -> (new_state, metrics).

    wav: [B, wave_length] raw float audio; mel is computed on device.
    rng: PRNG key for dropout (folded with step inside).

    If ``mesh`` has a 'seq' axis, activations get a time-axis sharding
    constraint (sequence parallelism): XLA spatially partitions the dilated
    convs and inserts receptive-field halo exchanges over ICI.
    """
    lr_fn = opt_lib.piecewise_constant_lr(model.cfg.lr_schedule)
    use_dropout = model.cfg.dropout_inputs or model.cfg.dropout_all

    seq_sharding = None
    if mesh is not None and "seq" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        seq_sharding = NamedSharding(mesh, P("data", "seq"))

    def step_fn(state, wav, rng):
        step = state["step"]
        if seq_sharding is not None:
            wav = jax.lax.with_sharding_constraint(wav, seq_sharding)
        mel = stft_ops.melspectrogram(wav)
        dropout_rng = jax.random.fold_in(rng, step) if use_dropout else None

        def loss_fn(p):
            ld = model.forward_loss(p, wav, mel, dropout_rng=dropout_rng)
            return ld["loss"], ld

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, new_opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_ema = opt_lib.ema_update(state["ema"], new_params, step)
        new_state = {
            "params": new_params,
            "opt_state": new_opt_state,
            "ema": new_ema,
            "step": step + 1,
        }
        # aux carries the DETAIL_LOG histograms/scalars when cfg.detail_log
        metrics = {**aux, "loss": loss, "learning_rate": lr_fn(step)}
        return new_state, metrics

    return step_fn


def make_cond_gap_fn(model):
    """Diagnostic: teacher-forced loss with matched mel minus the loss with
    another utterance's mel (batch rolled by one).  Near zero = the model is
    ignoring its conditioning (conditioning collapse) — invisible in the
    training loss, catastrophic at synthesis.  Logged every LOG_EVERY steps.
    """

    def gap_fn(params, wav):
        mel = stft_ops.melspectrogram(wav)
        matched = model.forward_loss(params, wav, mel)["loss"]
        mismatched = model.forward_loss(params, wav, jnp.roll(mel, 1, axis=0))["loss"]
        return mismatched - matched

    return jax.jit(gap_fn)


def jit_train_step(step_fn, batch_sharding=None, donate_state: Optional[bool] = None):
    """jit the step; batch arrives with the data-axis sharding, state keeps
    whatever placement it was given at init (layouts propagate).

    donate_state defaults to False: XLA:CPU's in-process communicator
    deadlocks when a donated buffer feeds a collective, and the tunneled
    axon TPU backend (which reports itself as 'tpu') rejects donated
    buffers with INVALID_ARGUMENT (both observed with jax 0.9).  Enable
    explicitly on hardware where donation is known good — it halves the
    train state's HBM footprint.
    """
    if donate_state is None:
        donate_state = False
    in_shardings = None
    if batch_sharding is not None:
        in_shardings = (None, batch_sharding, None)  # state, wav, rng
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        donate_argnums=(0,) if donate_state else (),
    )


def student_param_labels(pwn_cfg, params):
    """'train' / 'freeze' label tree for the student optimizer.

    With use_teacher_deconv the shared stack stays at the teacher's weights
    and is excluded from updates (reference parallel_wavenet.py:166-170,
    train_parallel_wavenet.py:171-172) — the pytree-structural equivalent of
    the reference's 'iaf'-name-substring filtering.
    """
    freeze_share = pwn_cfg.use_teacher_deconv

    def label(path, _):
        if freeze_share and path and getattr(path[0], "key", None) == "deconv_share":
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_student_optimizer(pwn_cfg, params):
    import optax as _optax

    inner = opt_lib.make_optimizer(pwn_cfg.lr_schedule, grad_clip=pwn_cfg.grad_clip)
    labels = student_param_labels(pwn_cfg, params)
    return _optax.multi_transform(
        {"train": inner, "freeze": _optax.set_to_zero()}, labels
    )


def make_pwn_train_step(pwn, teacher_params, optimizer, norm_stats=None, *, mesh=None):
    """Student distillation step: one XLA program containing base-noise
    sampling, N IAF flows, the frozen teacher's scoring forward, both STFTs
    of the power loss, and the optimizer update (reference splits this
    across clones + CPU grad summation, SURVEY.md §3.2).

    step_fn(state, wav, wav_rand, rng) -> (new_state, metrics);
    wav_rand feeds the contrastive loss's mismatched mel (pass wav again if
    contrastive_loss_factor == 0).

    If ``mesh`` has a 'seq' axis, the input gets a time-axis sharding
    constraint like the teacher step's (sequence parallelism over the
    flows' dilated convs + the teacher scoring pass).
    """
    cfg = pwn.cfg
    lr_fn = opt_lib.piecewise_constant_lr(cfg.lr_schedule)
    use_cl = cfg.loss_type == "logistic" and cfg.contrastive_loss_factor > 0.0

    seq_sharding = None
    if mesh is not None and "seq" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        seq_sharding = NamedSharding(mesh, P("data", "seq"))

    def step_fn(state, wav, wav_rand, rng):
        step = state["step"]
        rng = jax.random.fold_in(rng, step)
        if seq_sharding is not None:
            wav = jax.lax.with_sharding_constraint(wav, seq_sharding)
            wav_rand = jax.lax.with_sharding_constraint(wav_rand, seq_sharding)
        rng_noise, rng_loss = jax.random.split(rng)
        mel = stft_ops.melspectrogram(wav)

        def loss_fn(p):
            ff, _ = pwn.feed_forward(p, {"mel": mel}, rng_noise)
            ff["mel"] = mel
            ff["wav"] = wav
            if use_cl:
                ff["mel_rand"] = stft_ops.melspectrogram(wav_rand)
            ld = pwn.calculate_loss(teacher_params, ff, rng_loss, norm_stats)
            # DETAIL_LOG per-flow scalars + deconv histograms
            # (reference parallel_wavenet.py:279-282, wavenet.py:68-71)
            ld.update(ff.get("detail", {}))
            # DETAIL_LOG statistic set (reference parallel_wavenet.py:332-339)
            new_x = ff["x"]
            ld["new_x"] = jnp.mean(new_x)
            ld["new_x_std"] = jnp.std(new_x)
            ld["new_x_abs"] = jnp.mean(jnp.abs(new_x))
            ld["new_x_abs_std"] = jnp.std(jnp.abs(new_x))
            ld["mean_tot"] = jnp.mean(ff["mean_tot"])
            ld["scale_tot"] = jnp.mean(ff["scale_tot"])
            ld["log_scale_tot"] = jnp.mean(ff["log_scale_tot"])
            return ld["loss"], ld

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, new_opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_ema = opt_lib.ema_update(state["ema"], new_params, step)
        new_state = {
            "params": new_params,
            "opt_state": new_opt_state,
            "ema": new_ema,
            "step": step + 1,
        }
        metrics["learning_rate"] = lr_fn(step)
        return new_state, metrics

    return step_fn


def jit_pwn_train_step(step_fn, batch_sharding=None, donate_state: Optional[bool] = None):
    if donate_state is None:
        donate_state = False
    in_shardings = None
    if batch_sharding is not None:
        in_shardings = (None, batch_sharding, batch_sharding, None)
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
