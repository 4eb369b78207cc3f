"""Preemption-safe training stop (runner.GracefulShutdown).

TPU pods deliver preemptions as SIGTERM; the loop must save a checkpoint at
the interrupted step and exit cleanly so resume-by-logdir loses nothing
(the reference loses up to an hour: slim saves hourly and recovery is
restart-only, train_wavenet.py:51-60, 176-177).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

from nsynth_wavenet_tpu.data import dataset as data_lib

TINY_CFG = {
    "wave_length": 1280,
    "num_layers": 4,
    "num_stages": 2,
    "filter_length": 3,
    "width": 16,
    "skip_width": 8,
    "deconv_width": 16,
    "deconv_config": [[40, 10], [80, 20]],
    "loss_type": "gauss",
    "use_mu_law": False,
    "double_gate_width": False,
    "num_iters": 100000,
    "compute_dtype": "float32",
}


def test_sigterm_saves_checkpoint_and_resumes(tmp_path):
    root = str(tmp_path)
    data_lib.make_synthetic_dataset(os.path.join(root, "ds"), n_records=4, length=4000)
    cfg_path = os.path.join(root, "tiny.json")
    with open(cfg_path, "wt") as f:
        json.dump(TINY_CFG, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # huge --num_steps and a ckpt interval it will never reach: the ONLY way
    # a checkpoint appears is the shutdown path
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "train_wavenet.py"),
         "--config", cfg_path, "--train_path", os.path.join(root, "ds"),
         "--log_root", os.path.join(root, "runs"), "--total_batch_size", "2",
         "--ckpt_every_steps", "1000000"],
        cwd=repo, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until the run dir + first training activity exists
        deadline = time.time() + 180
        run_dir = None
        while time.time() < deadline:
            runs = (
                [os.path.join(root, "runs", d) for d in os.listdir(os.path.join(root, "runs"))]
                if os.path.isdir(os.path.join(root, "runs")) else []
            )
            if runs and os.path.exists(os.path.join(runs[0], "train.log")):
                run_dir = runs[0]
                # give it time to get past compile and run some steps
                if "steps/s" in open(os.path.join(run_dir, "train.log")).read():
                    break
            if proc.poll() is not None:
                raise AssertionError(f"trainer died early:\n{proc.stdout.read()}")
            time.sleep(2.0)
        assert run_dir is not None, "run dir never appeared"

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
        assert proc.returncode == 0, f"non-clean exit {proc.returncode}:\n{out}"
        assert "shutdown signal: saving checkpoint" in out, out
    finally:
        if proc.poll() is None:
            proc.kill()

    ckpts = os.listdir(os.path.join(run_dir, "ckpt"))
    assert ckpts, "no checkpoint saved on SIGTERM"

    # resume-by-logdir continues from the interrupted step
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "train_wavenet.py"),
         "--train_path", os.path.join(root, "ds"), "--logdir", run_dir,
         "--num_steps", "0"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Restored checkpoint at step" in res.stdout + res.stderr


def test_graceful_shutdown_nonmain_thread_noop():
    """Entering from a worker thread must not try to register handlers."""
    import threading

    from nsynth_wavenet_tpu.training import runner

    err = []

    def run():
        try:
            with runner.GracefulShutdown() as stop:
                assert not stop.requested
        except Exception as e:  # pragma: no cover
            err.append(e)

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert not err, err


def test_graceful_shutdown_restores_handlers():
    from nsynth_wavenet_tpu.training import runner

    before = signal.getsignal(signal.SIGTERM)
    with runner.GracefulShutdown() as stop:
        assert signal.getsignal(signal.SIGTERM) != before
        os.kill(os.getpid(), signal.SIGTERM)
        # handler runs synchronously in the main thread on the next bytecode
        time.sleep(0.1)
        assert stop.requested
    assert signal.getsignal(signal.SIGTERM) == before
