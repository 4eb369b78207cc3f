"""Checkpoint / resume via Orbax.

Mirrors the reference's semantics (SURVEY.md §5):
  * periodic save of the full train state (params + optimizer + EMA + step);
    the reference saves every 3600 s via slim Supervisor (train_wavenet.py:177)
  * resume-by-logdir: restore the latest step found in the directory
  * EMA-only export for shipping eval models (tools/make_eval_model.py:8-34)
"""

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1):
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=False,
            ),
        )

    def save(self, step: int, state: Any):
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the template's structure/shardings; returns state."""
        ocp = _ocp()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(_abstractify, state_template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()


def _abstractify(x):
    if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    if isinstance(x, np.ndarray):
        # an explicit target sharding lets Orbax re-shard instead of replaying
        # the topology recorded at save time (saves are now native sharded
        # jax.Arrays, whose device ids won't exist in a host-template restore)
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    return x


def export_ema(state: Any, path: str):
    """Write an EMA-weights-only checkpoint for eval/shipping
    (reference tools/make_eval_model.py keeps only the EMA shadow vars)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state["ema"], force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, params_template: Any):
    """Load a params-only checkpoint (as written by export_ema)."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(_abstractify, params_template)
    out = ckptr.restore(os.path.abspath(path), abstract)
    ckptr.close()
    return out
