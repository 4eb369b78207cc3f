"""End-to-end training runners for teacher and student.

Replaces the reference's slim Supervisor scaffolding (train_wavenet.py:34-179,
train_parallel_wavenet.py:17-227) with: run-dir resolution (new run under
--log_root with a config slug, or resume from --logdir), data-dependent init,
teacher restore from EMA weights, deconv transplant, SPMD-jitted steps over
the device mesh, Orbax checkpointing, and TensorBoard metrics.
"""

import glob
import json
import os
import shutil
import time

import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.data import dataset as data_lib
from nsynth_wavenet_tpu.utils import logging_utils

LOG_EVERY = 100


def _host_metrics(metrics) -> dict:
    """device_get + scalar float-ification; DETAIL_LOG histogram summaries
    (dicts from logging_utils.device_histogram) pass through intact for
    MetricsWriter.add_histogram_raw."""
    import jax

    out = {}
    for k, v in jax.device_get(metrics).items():
        out[k] = v if isinstance(v, dict) else float(v)
    return out


def maybe_init_distributed(multihost: bool):
    """Multi-host SPMD init (replaces the reference's unused PS/worker
    scaffolding, deployment/model_deploy.py:487-537): every host runs the
    same program; jax.distributed wires the coordinator, the Mesh then spans
    all hosts and gradient psums ride ICI within a slice / DCN across.
    Call before any other jax API.

    On Cloud TPU/Slurm/OpenMPI the no-arg auto-detection fills everything
    in; elsewhere (e.g. the multi-process CPU test,
    tests/test_multiprocess.py) the coordinator is taken from
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    if multihost:
        import jax

        addr = os.environ.get("JAX_COORDINATOR_ADDRESS", "")
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()


def local_batch_size(total_batch_size: int) -> int:
    """Rows of the global batch this process must produce."""
    import jax

    n = jax.process_count()
    assert total_batch_size % n == 0, (total_batch_size, n)
    return total_batch_size // n


def put_global_batch(batch_local, sharding):
    """Assemble the global on-device batch from this process's rows.

    Single-process: a plain transfer.  Multi-process: every process holds
    only its own rows, so construct the global jax.Array from process-local
    data (a cross-process ``device_put`` would require — and in jax 0.9
    actually verifies — identical data on every process)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(batch_local, sharding)
    return jax.make_array_from_process_local_data(sharding, batch_local)


def broadcast_from_host0(x):
    """Make a host-side array identical on all processes (process 0 wins).
    Used for the data-dependent-init batch: each process reads a different
    dataset shard, but DDI must rescale the replicated params identically
    everywhere or the replicas silently diverge."""
    import jax

    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))


class GracefulShutdown:
    """Preemption-safe stop for the train loops.

    TPU pods surface maintenance events / preemptions as SIGTERM.  The
    reference's recovery story is purely restart-based (rerun with --logdir
    and slim restores the latest hourly checkpoint, train_wavenet.py:51-60 —
    losing up to an hour of work).  Here the first SIGTERM/SIGINT sets a
    flag; the loop finishes the in-flight step, saves a checkpoint, and
    returns cleanly, so resume-by-logdir loses nothing.  A second signal
    restores the previous handlers' behavior (hard stop escape hatch).
    No-op when not on the main thread (signal registration is main-thread
    only — e.g. tests driving the runner from a worker thread).
    """

    def __init__(self):
        self.requested = False
        self._prev = {}

    def __enter__(self):
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass
        return self

    def _handle(self, sig, frame):
        import signal

        if self.requested:  # second signal: defer to the original handler
            prev = self._prev.get(sig, signal.SIG_DFL)
            if prev is signal.SIG_IGN:
                return  # originally ignored: stay ignored, don't interrupt
            signal.signal(sig, prev)
            if callable(prev):
                prev(sig, frame)
                return
            raise KeyboardInterrupt
        self.requested = True

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        return False


STOP_SYNC_EVERY = 10


def make_stop_sync():
    """Cross-process agreement on the GracefulShutdown flag.

    On a pod every host receives SIGTERM at a slightly different step
    boundary, while ``step_fn``'s grad psum and the Orbax ``mgr.save`` are
    collectives — a host that exits the loop one step early deadlocks the
    rest at exactly preemption time.  All processes therefore all-reduce the
    local flag at the same fixed step boundaries (every STOP_SYNC_EVERY
    steps), so the stop decision — and hence the shutdown checkpoint's
    collective save — is identical everywhere.  Single-process: the local
    flag, checked every step with zero overhead.
    """
    import jax

    if jax.process_count() == 1:
        return lambda requested, step: requested

    def sync(requested: bool, step: int) -> bool:
        if step % STOP_SYNC_EVERY != 0:
            return False
        from jax.experimental import multihost_utils

        return bool(multihost_utils.process_allgather(np.asarray(requested)).any())

    return sync


class Profiler:
    """jax.profiler trace over a step window (the reference has no tracing
    at all, SURVEY.md §5); writes a TensorBoard-loadable trace."""

    def __init__(self, run_dir, start_step, num_steps):
        self.dir = os.path.join(run_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps if num_steps else 0
        self.active = False

    def maybe_update(self, step):
        import jax

        if self.stop_step and not self.active and step == self.start_step:
            jax.profiler.start_trace(self.dir)
            self.active = True
        elif self.active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self.active = False

    def close(self):
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False


def _shared_time_stamp() -> str:
    """Run-dir timestamp, identical on every process (process 0's clock wins
    — otherwise hosts race the strftime second and create distinct dirs)."""
    import jax

    stamp = time.strftime("%m%d_%H%M%S")
    if jax.process_count() == 1:
        return stamp
    from jax.experimental import multihost_utils

    raw = np.frombuffer(stamp.encode("ascii"), dtype=np.uint8)
    return bytes(np.asarray(multihost_utils.broadcast_one_to_all(raw))).decode("ascii")


def resolve_run_dir(log_root: str, logdir: str, config_path: str, model_tag: str):
    """New run: create log_root/<slug>-<time> and copy the config json.
    Resume: read the json already inside logdir (reference
    train_wavenet.py:41-62)."""
    if log_root:
        if not config_path:
            raise RuntimeError("No config json specified.")
        cfg = config_lib.load_config(config_path)
        slug = config_lib.config_slug(cfg, model_tag)
        stamp = _shared_time_stamp()
        run_dir = os.path.join(log_root, f"{slug}-{stamp}")
        os.makedirs(run_dir, exist_ok=True)
        shutil.copy(config_path, run_dir)
        resumed = False
    else:
        run_dir = logdir
        jsons = glob.glob(os.path.join(run_dir, "*.json"))
        jsons = [j for j in jsons if not os.path.basename(j).startswith("norm_stats")]
        assert len(jsons) == 1, f"expected exactly one config json in {run_dir}: {jsons}"
        cfg = config_lib.load_config(jsons[0])
        resumed = True
    return run_dir, cfg, resumed


def _init_logging(log, array, name):
    array = np.asarray(array)
    log.info(
        "initial %s.m %.5f, %s.std %.5f, %s.min %.5f, %s.max %.5f",
        name, array.mean(), name, array.std(), name, array.min(), name, array.max(),
    )


def _log_teacher_init_stats(log, loss_type, out_params):
    """Reference train_wavenet.py:84-100."""
    out = np.asarray(out_params)
    if loss_type == "mol":
        _, mean, log_scale = np.split(out, 3, axis=2)
        _init_logging(log, mean, "mean")
        _init_logging(log, np.exp(np.maximum(log_scale, -7.0)), "scale")
    elif loss_type == "gauss":
        mean, log_std = np.split(out, 2, axis=2)
        _init_logging(log, mean, "mean")
        _init_logging(log, np.exp(np.maximum(log_std, -7.0)), "std")


def train_wavenet(
    train_path: str,
    config_path: str = "",
    log_root: str = "",
    logdir: str = "/tmp/nsynth_wavenet_tpu",
    total_batch_size: int = 4,
    num_steps: int = None,
    ckpt_every_steps: int = 2000,
    seed: int = 0,
    multihost: bool = False,
    profile_steps: int = 0,
    n_model: int = 1,
    n_seq: int = 1,
):
    """Teacher training (reference train_wavenet.py).

    n_model/n_seq select channel tensor parallelism / sequence parallelism
    extents of the device mesh (remaining devices go to the data axis) —
    the CLI-reachable analog of the reference's DeploymentConfig device
    policy (deployment/model_deploy.py:479-680)."""
    maybe_init_distributed(multihost)
    import jax

    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.ops import stft as stft_ops
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
    from nsynth_wavenet_tpu.training import checkpoint as ckpt_lib
    from nsynth_wavenet_tpu.training import optimizer as opt_lib
    from nsynth_wavenet_tpu.training import train_lib

    run_dir, cfg, resumed = resolve_run_dir(log_root, logdir, config_path, "wavenet")
    log = logging_utils.add_log_file(run_dir)
    if resumed:
        log.info("Continue running in %s", run_dir)
    log.info("\n%s", logging_utils.config_summary(cfg))

    model = Wavenet(cfg)
    ds = data_lib.Dataset(
        train_path, process_index=jax.process_index(), process_count=jax.process_count()
    )

    params = model.init_params(jax.random.PRNGKey(seed))
    if cfg.use_weight_norm:
        log.info("Calculate initial statistics (data-dependent init).")
        init_wav = broadcast_from_host0(
            ds.get_init_batch(total_batch_size, cfg.wave_length, seed=seed)
        )
        init_mel = stft_ops.melspectrogram_np(init_wav)
        out_params, params = train_lib.run_data_dep_init(
            model, params, init_wav, init_mel, dropout_rng=jax.random.PRNGKey(seed + 1)
        )
        _log_teacher_init_stats(log, cfg.loss_type, out_params)

    optimizer = opt_lib.make_optimizer(cfg.lr_schedule, grad_clip=cfg.grad_clip)
    state = train_lib.make_train_state(params, optimizer)

    mesh = mesh_lib.mesh_for_batch(total_batch_size, n_model=n_model, n_seq=n_seq)
    state = mesh_lib.shard_train_state(state, mesh)
    bs = mesh_lib.batch_sharding(mesh)

    mgr = ckpt_lib.CheckpointManager(os.path.join(run_dir, "ckpt"))
    restored = mgr.restore(state)
    if restored is not None:
        state = restored
        log.info("Restored checkpoint at step %d", int(jax.device_get(state["step"])))

    step_fn = train_lib.jit_train_step(
        train_lib.make_wavenet_train_step(model, optimizer, mesh=mesh), bs
    )
    cond_gap_fn = train_lib.make_cond_gap_fn(model)

    writer = logging_utils.MetricsWriter(run_dir)
    it = ds.batch_iterator(
        local_batch_size(total_batch_size), cfg.wave_length,
        seed=seed + jax.process_index(),
    )
    rng = jax.random.PRNGKey(seed + 2)
    target = num_steps if num_steps is not None else cfg.num_iters
    step = int(jax.device_get(state["step"]))
    profiler = Profiler(run_dir, step + 10, profile_steps)
    t_last, s_last = time.time(), step
    should_stop = make_stop_sync()
    try:
        with GracefulShutdown() as stop:
            stopped = False
            while step < target:
                if should_stop(stop.requested, step):
                    stopped = True
                    break
                profiler.maybe_update(step)
                wav = put_global_batch(next(it), bs)
                state, metrics = step_fn(state, wav, rng)
                step += 1
                if step % LOG_EVERY == 0 or step == target:
                    m = _host_metrics(metrics)
                    now = time.time()
                    sps = (step - s_last) / max(now - t_last, 1e-9)
                    t_last, s_last = now, step
                    m["steps_per_sec"] = sps
                    m["utterances_per_sec"] = sps * total_batch_size
                    if total_batch_size > 1:
                        # conditioning-usage diagnostic (~0 = collapse)
                        m["cond_gap"] = float(cond_gap_fn(state["params"], wav))
                    writer.write(step, m)
                    log.info(
                        "step %d loss %.4f lr %.2e cond_gap %.4f (%.2f steps/s)",
                        step, m["loss"], m["learning_rate"], m.get("cond_gap", 0.0), sps,
                    )
                if step % ckpt_every_steps == 0 or step == target:
                    # save the sharded jax.Arrays directly: Orbax gathers each
                    # shard from the process that owns it, so this works even
                    # when --n_model/--n_seq axes span processes (where a
                    # jax.device_get would raise on non-addressable shards)
                    mgr.save(step, state)
            if stopped and step % ckpt_every_steps != 0 and step != target:
                log.info("shutdown signal: saving checkpoint at step %d", step)
                mgr.save(step, state)
    finally:
        profiler.close()
        it.close()
        writer.close()
        mgr.close()
    return run_dir, state


def load_teacher(teacher_dir: str):
    """Discover the teacher's config + latest checkpoint and return
    (teacher_model, ema_params) — the reference restores the teacher from its
    EMA shadow variables (train_parallel_wavenet.py:26-38, 198-203)."""
    import jax

    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.training import checkpoint as ckpt_lib
    from nsynth_wavenet_tpu.training import optimizer as opt_lib
    from nsynth_wavenet_tpu.training import train_lib

    jsons = [
        j
        for j in glob.glob(os.path.join(teacher_dir, "*.json"))
        if not os.path.basename(j).startswith("norm_stats")
    ]
    assert len(jsons) == 1, f"expected one teacher config json in {teacher_dir}"
    cfg = config_lib.load_config(jsons[0], use_as_teacher=True)
    assert isinstance(cfg, config_lib.WavenetConfig)
    model = Wavenet(cfg)

    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
    template = train_lib.make_train_state(params, optimizer)
    mgr = ckpt_lib.CheckpointManager(os.path.join(teacher_dir, "ckpt"))
    restored = mgr.restore(template)
    mgr.close()
    assert restored is not None, f"no checkpoint under {teacher_dir}/ckpt"
    return model, restored["ema"]


def train_parallel_wavenet(
    train_path: str,
    teacher_dir: str,
    config_path: str = "",
    log_root: str = "",
    logdir: str = "/tmp/nsynth_pwn_tpu",
    total_batch_size: int = 4,
    num_steps: int = None,
    ckpt_every_steps: int = 2000,
    seed: int = 0,
    multihost: bool = False,
    profile_steps: int = 0,
    n_model: int = 1,
    n_seq: int = 1,
):
    """Student distillation training (reference train_parallel_wavenet.py).
    n_model/n_seq: see train_wavenet."""
    maybe_init_distributed(multihost)
    import jax

    from nsynth_wavenet_tpu.models.parallel_wavenet import (
        ParallelWavenet,
        transplant_teacher_deconv,
    )
    from nsynth_wavenet_tpu.ops import stft as stft_ops
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
    from nsynth_wavenet_tpu.training import checkpoint as ckpt_lib
    from nsynth_wavenet_tpu.training import train_lib

    run_dir, cfg, resumed = resolve_run_dir(
        log_root, logdir, config_path, "parallel_wavenet"
    )
    log = logging_utils.add_log_file(run_dir)
    log.info("\n%s", logging_utils.config_summary(cfg))

    teacher, te_params = load_teacher(teacher_dir)
    log.info("teacher from %s\n%s", teacher_dir, logging_utils.config_summary(teacher.cfg))

    pwn = ParallelWavenet(cfg, teacher)
    ds = data_lib.Dataset(
        train_path, process_index=jax.process_index(), process_count=jax.process_count()
    )

    # ordered init (reference train_parallel_wavenet.py:195-211):
    # 1. teacher restore (above)  2. data-dependent init  3. deconv transplant
    params = pwn.init_params(jax.random.PRNGKey(seed))
    if cfg.use_weight_norm:
        log.info("Calculate initial statistics (data-dependent init).")
        init_wav = broadcast_from_host0(
            ds.get_init_batch(total_batch_size, cfg.wave_length, seed=seed)
        )
        init_mel = stft_ops.melspectrogram_np(init_wav)

        ff, params = jax.jit(
            lambda p, m: pwn.feed_forward(p, {"mel": m}, jax.random.PRNGKey(seed + 1), init=True)
        )(params, init_mel)
        _init_logging(log, ff["x"], "new_x")
        _init_logging(log, ff["mean_tot"], "mean")
        _init_logging(log, ff["scale_tot"], "scale")
    params = transplant_teacher_deconv(params, te_params)

    # power-loss feature normalization stats, persisted per run so a resumed
    # experiment reuses identical stats (reference parallel_wavenet.py:442-453)
    norm_stats = None
    if cfg.norm_feat:
        stats_path = os.path.join(run_dir, "norm_stats.npz")
        if os.path.exists(stats_path):
            z = np.load(stats_path)
            norm_stats = (z["mean"], z["std"])
        else:
            log.info("Calculating STFT feature mean/std for power-loss norm.")
            mean, std = data_lib.spec_feat_mean_std(train_path, feat_fn=pwn.stft_feat)
            # each process estimated stats from its own dataset shard; the
            # step closure bakes them in, so they must agree everywhere
            mean = broadcast_from_host0(mean)
            std = broadcast_from_host0(std)
            if jax.process_index() == 0:
                np.savez(stats_path, mean=mean, std=std)
            norm_stats = (mean, std)

    optimizer = train_lib.make_student_optimizer(cfg, params)
    state = train_lib.make_train_state(params, optimizer)

    mesh = mesh_lib.mesh_for_batch(total_batch_size, n_model=n_model, n_seq=n_seq)
    # same column/row-parallel channel rules as the teacher — the flow trees
    # embed the same per-layer structure (mesh.wavenet_tp_spec)
    state = mesh_lib.shard_train_state(state, mesh)
    bs = mesh_lib.batch_sharding(mesh)
    te_params = mesh_lib.shard_params(te_params, mesh)

    mgr = ckpt_lib.CheckpointManager(os.path.join(run_dir, "ckpt"))
    restored = mgr.restore(state)
    if restored is not None:
        state = restored
        log.info("Restored checkpoint at step %d", int(jax.device_get(state["step"])))

    step_fn = train_lib.jit_pwn_train_step(
        train_lib.make_pwn_train_step(pwn, te_params, optimizer, norm_stats, mesh=mesh),
        bs,
    )

    writer = logging_utils.MetricsWriter(run_dir)
    it = ds.batch_iterator(
        local_batch_size(total_batch_size), cfg.wave_length,
        seed=seed + jax.process_index(),
    )
    it_rand = ds.batch_iterator(
        local_batch_size(total_batch_size), cfg.wave_length,
        seed=seed + 12345 + jax.process_index(),
    )
    rng = jax.random.PRNGKey(seed + 2)
    target = num_steps if num_steps is not None else cfg.num_iters
    step = int(jax.device_get(state["step"]))
    profiler = Profiler(run_dir, step + 10, profile_steps)
    t_last, s_last = time.time(), step
    should_stop = make_stop_sync()
    try:
        with GracefulShutdown() as stop:
            stopped = False
            while step < target:
                if should_stop(stop.requested, step):
                    stopped = True
                    break
                profiler.maybe_update(step)
                wav = put_global_batch(next(it), bs)
                wav_rand = put_global_batch(next(it_rand), bs)
                state, metrics = step_fn(state, wav, wav_rand, rng)
                step += 1
                if step % LOG_EVERY == 0 or step == target:
                    m = _host_metrics(metrics)
                    now = time.time()
                    sps = (step - s_last) / max(now - t_last, 1e-9)
                    t_last, s_last = now, step
                    m["steps_per_sec"] = sps
                    writer.write(step, m)
                    # hpt (H_Ps_Pt, the teacher cross-entropy term of the MC
                    # KL) is the component that CAN decrease at smoke scale —
                    # the KL itself is floored by the teacher's own NLL while
                    # power-loss sharpening lowers H_Ps (reference
                    # parallel_wavenet.py:361-402); quality_smoke's mol
                    # pairing gates on it at long-run scale
                    hpt = (" hpt %.4f" % m["H_Ps_Pt"]) if "H_Ps_Pt" in m else ""
                    log.info(
                        "step %d loss %.4f kl %.4f power %.4f%s (%.2f steps/s)",
                        step, m["loss"], m.get("kl_loss", float("nan")),
                        m.get("power_loss", float("nan")), hpt, sps,
                    )
                if step % ckpt_every_steps == 0 or step == target:
                    mgr.save(step, state)
            if stopped and step % ckpt_every_steps != 0 and step != target:
                log.info("shutdown signal: saving checkpoint at step %d", step)
                mgr.save(step, state)
    finally:
        profiler.close()
        it.close()
        it_rand.close()
        writer.close()
        mgr.close()
    return run_dir, state
