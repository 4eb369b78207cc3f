"""Per-step collective-traffic accounting from compiled HLO (no hardware).

The >=90% 1->N-host scaling target (BASELINE.md) cannot be *measured* on one
chip, but the communication volume that determines it can be *computed*: jit
the real train step over virtual CPU meshes, compile, and walk the HLO for
collective ops (all-reduce / all-gather / reduce-scatter /
collective-permute), summing their operand bytes.  DP scaling efficiency is
then bounded by step_compute_time / (step_compute_time + bytes/bandwidth) —
with the teacher's ~23 MB of f32 gradients all-reduced per step against a
>=100 GB/s ICI ring, the communication share is <1 ms against a ~100 ms
step, i.e. nothing in the program structure caps scaling below ~99%.

Usage (CPU, no TPU needed):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/collective_accounting.py
Prints one line per mesh shape + a JSON summary; also importable
(``collective_bytes(compiled)``) and covered by
tests/test_collective_accounting.py.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
                "all-to-all")

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of every array literal in an HLO result-shape string
    (handles tuples by summing members)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(compiled) -> dict:
    """Walk a compiled executable's HLO text; returns
    {op_kind: {"count": n, "bytes": output_bytes_summed}}."""
    txt = compiled.as_text()
    out = {}
    kinds = "|".join(_COLLECTIVES)
    pat = re.compile(
        r"%?[\w.\-]+ = (\([^)]*\)|[\w\[\],{}\s]*?) ((?:" + kinds + r")(?:-start)?)\("
    )
    for line in txt.splitlines():
        line = line.strip()
        # e.g.:  %all-reduce.1 = f32[512,1024] all-reduce(...), replica_groups=...
        m = pat.match(line)
        if not m:
            continue
        kind = m.group(2).replace("-start", "")
        b = _shape_bytes(m.group(1))
        slot = out.setdefault(kind, {"count": 0, "bytes": 0})
        slot["count"] += 1
        slot["bytes"] += b
    return out


def _param_bytes(tree) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def account_teacher_step(n_data=8, n_model=1, n_seq=1, full_size=False):
    import jax
    import numpy as np

    from nsynth_wavenet_tpu import config as config_lib
    from nsynth_wavenet_tpu.models.wavenet import Wavenet
    from nsynth_wavenet_tpu.parallel import mesh as mesh_lib
    from nsynth_wavenet_tpu.training import optimizer as opt_lib
    from nsynth_wavenet_tpu.training import train_lib

    kw = dict(loss_type="mol", use_mu_law=False, double_gate_width=False,
              upsample_act="leaky_relu")
    if not full_size:
        kw.update(num_layers=6, num_stages=3, width=64, skip_width=64,
                  deconv_width=32, wave_length=2560, compute_dtype="float32")
    cfg = config_lib.WavenetConfig(**kw)
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = opt_lib.make_optimizer(cfg.lr_schedule)
    state = train_lib.make_train_state(params, optimizer)

    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model, n_seq=n_seq)
    state = mesh_lib.shard_train_state(state, mesh)
    bs = mesh_lib.batch_sharding(mesh)
    batch = max(n_data, 2)
    wav = np.zeros((batch, cfg.wave_length), np.float32)
    wav_sh = jax.device_put(wav, bs)
    step = train_lib.jit_train_step(
        train_lib.make_wavenet_train_step(model, optimizer, mesh=mesh), bs
    )
    compiled = step.lower(state, wav_sh, jax.random.PRNGKey(0)).compile()
    return {
        "mesh": {"data": n_data, "model": n_model, "seq": n_seq},
        "param_bytes": _param_bytes(params),
        "collectives": collective_bytes(compiled),
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = []
    for n_data, n_model, n_seq in ((8, 1, 1), (4, 2, 1), (2, 2, 2)):
        r = account_teacher_step(n_data, n_model, n_seq)
        total = sum(v["bytes"] for v in r["collectives"].values())
        print(
            f"mesh data={n_data} model={n_model} seq={n_seq}: "
            f"params {r['param_bytes']/1e6:.1f} MB, collective traffic/step "
            f"{total/1e6:.2f} MB in {sum(v['count'] for v in r['collectives'].values())} ops "
            f"{ {k: v['count'] for k, v in r['collectives'].items()} }",
            file=sys.stderr,
        )
        results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
