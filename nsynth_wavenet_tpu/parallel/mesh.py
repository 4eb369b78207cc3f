"""Device mesh + sharding layout.

Replaces the reference's in-graph clone replication (deployment/
model_deploy.py: one variable-reusing copy of the graph per GPU, gradients
hopped to CPU and tf.add_n-summed, model_deploy.py:414-449) with SPMD over a
``jax.sharding.Mesh``:

  * axis ``data``  — batch sharding; gradient psum inserted by XLA over ICI.
  * axis ``model`` — optional channel tensor parallelism for the wide
    (512/1024-channel) teacher convs: Megatron-style column-parallel on the
    gate producing convs, row-parallel on the res/skip 1x1s.

Parameters are placed with NamedShardings at init; ``jax.jit`` then
propagates layouts through the train step, so there is no separate
"deployment" wrapper — the step function is the deployment.
"""

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, n_seq: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model'[, 'seq']) mesh.  Defaults: all devices on
    'data'.  The 'seq' axis shards the time dimension of activations
    (sequence/context parallelism): the dilated convs have a finite
    receptive field, so XLA's spatial partitioner inserts halo exchanges of
    (filter-1)*dilation samples over ICI (SURVEY.md §5 long-context)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    need = n_data * n_model * n_seq
    assert need <= len(devices), (n_data, n_model, n_seq, len(devices))
    if n_seq > 1:
        arr = np.asarray(devices[:need]).reshape(n_data, n_model, n_seq)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Mesh whose data axis evenly divides the global batch: uses the largest
    device count d <= len(devices) with batch_size % d == 0."""
    return mesh_for_batch(batch_size, devices=devices)


def mesh_for_batch(
    batch_size: int, n_model: int = 1, n_seq: int = 1, devices=None
) -> Mesh:
    """Mesh with explicit model/seq extents; the data axis takes the largest
    count that divides the batch and fits the remaining devices.  This is
    what the train CLIs' --n_model/--n_seq flags build (the analog of the
    reference's DeploymentConfig device policy, model_deploy.py:479-680)."""
    if devices is None:
        devices = jax.devices()
    avail = len(devices) // (n_model * n_seq)
    if avail < 1:
        raise ValueError(
            f"need n_model*n_seq={n_model * n_seq} devices, have {len(devices)}"
        )
    n = avail
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n_data=n, n_model=n_model, n_seq=n_seq, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.device_put(tree, jax.tree_util.tree_map(lambda _: rep, tree))


# ---------------------------------------------------------------------------
# Tensor-parallel layout rules for WaveNet parameter trees (teacher AND
# student: the student's IAF flows embed the same per-layer structure,
# ['flows'][f]['layers'][i]['dilated'|'mel_cond'|'res'], so the rules match
# both trees — reference parallel_wavenet.py:200-287 builds each flow from
# the same conv vocabulary as wavenet.py:225-274).
# ---------------------------------------------------------------------------

# path-pattern -> PartitionSpec for kernels ('w'/'v') and biases ('b'/'g').
# Column parallel: dilated + mel_cond convs shard the gate_width output axis.
# Row parallel: res/skip 1x1s shard their gate-half input axis (XLA inserts
# the psum).  Everything else (starts, heads, deconv) is replicated.
_TP_KERNEL_RULES = (
    (re.compile(r"\['layers'\]\[\d+\]\['(dilated|mel_cond)'\]"), P(None, None, MODEL_AXIS)),
    (re.compile(r"\['layers'\]\[\d+\]\['(res|skip)'\]"), P(None, MODEL_AXIS, None)),
)
_TP_BIAS_RULES = (
    (re.compile(r"\['layers'\]\[\d+\]\['(dilated|mel_cond)'\]"), P(MODEL_AXIS)),
)


def wavenet_tp_spec(path) -> P:
    """PartitionSpec for one WaveNet-family param leaf (teacher or student
    flow) identified by its tree path."""
    path_str = jax.tree_util.keystr(path)
    leaf_name = path[-1].key if hasattr(path[-1], "key") else None
    if leaf_name in ("w", "v"):
        for pat, spec in _TP_KERNEL_RULES:
            if pat.search(path_str):
                return spec
    elif leaf_name in ("b", "g"):
        for pat, spec in _TP_BIAS_RULES:
            if pat.search(path_str):
                return spec
    return P()


teacher_tp_spec = wavenet_tp_spec  # back-compat name


def shard_params(params, mesh: Mesh, spec_fn=teacher_tp_spec):
    """Place a parameter pytree on the mesh according to spec_fn(path)."""
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, spec_fn(path)), params
    )
    return jax.device_put(params, shardings)


def shard_train_state(state, mesh: Mesh, spec_fn=teacher_tp_spec):
    """Place a full train state on the mesh, preserving pytree structure.

    The spec rules match on path substrings, so they apply equally to
    params, ema, and the optimizer's mu/nu mirrors (whose paths embed the
    same layer names); every other leaf (step, Adam count, ...) replicates.
    A leaf whose shape is incompatible with its matched spec (e.g. scalar
    count) falls back to replication.
    """

    def _sharding(path, leaf):
        spec = spec_fn(path)
        if spec != P() and hasattr(leaf, "ndim") and leaf.ndim < len(spec):
            spec = P()
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map_with_path(_sharding, state)
    return jax.device_put(state, shardings)
