"""Capture a real device trace of the fused AR serving kernel and dump the
per-op time breakdown.

The A/B experiments (ab_int8_combine.py) bound the kernel's remaining gap
to its HBM/MXU floor but cannot say WHERE the time goes — scheduling
hypotheses (VPU passes, DMA waits) have each moved only a few percent.
This tool gets the ground truth: run the compiled kernel under
jax.profiler with create_perfetto_trace=True (the tensorboard profile
plugin's xplane converter is incompatible with this env's TF/protobuf)
and aggregate device event durations by op name from the perfetto JSON.

Usage: python benchmarks/profile_kernel.py [B] [variant]
  variant: bf16 | int8 | int8_static (default int8_static)
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models.fastgen import Fastgen
from nsynth_wavenet_tpu.models.wavenet import Wavenet
from nsynth_wavenet_tpu.ops import fastgen_kernel as fk
from nsynth_wavenet_tpu.ops import stft
from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def trace_events(log_dir):
    """perfetto trace capture -> (events, thread-name map)."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "perfetto_trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no perfetto capture under {log_dir}"
    with gzip.open(paths[-1], "rt") as f:
        obj = json.load(f)
    events = obj["traceEvents"] if isinstance(obj, dict) else obj
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    return events, tids


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variant = sys.argv[2] if len(sys.argv) > 2 else "int8_static"
    cfg = config_lib.WavenetConfig(
        loss_type="mol", use_mu_law=False, double_gate_width=False,
        upsample_act="leaky_relu",
    )
    model = Wavenet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    fg = Fastgen(model)
    sr = 16000
    rng = np.random.RandomState(0)
    t = np.arange(sr) / sr
    wav = np.clip(
        0.3 * np.sin(2 * np.pi * 150 * t)[None] + 0.01 * rng.randn(B, sr),
        -0.99, 0.99,
    ).astype(np.float32)
    mel = stft.melspectrogram_np(wav)
    gen_len = (mel.shape[1] - 1) * 200

    kwargs = {
        "bf16": dict(weight_dtype=jnp.bfloat16),
        "int8": dict(weight_dtype=jnp.int8),
        "int8_static": dict(weight_dtype=jnp.int8, act_amax="calibrate"),
    }[variant]
    if kwargs.get("act_amax") == "calibrate":
        kwargs["act_amax"] = jax.jit(fg.calibrate_act_amax)(
            params, jnp.asarray(wav[:8]), jnp.asarray(mel[:8])
        )
    gen = jax.jit(
        lambda p, m, s: fg.generate_pallas(p, m, s, length=gen_len, **kwargs)
    )
    t0 = time.time()
    np.asarray(gen(params, mel, 0))
    print(f"compile+first {time.time() - t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    np.asarray(gen(params, mel, 1))
    step_us = (time.time() - t0) / gen_len * 1e6
    print(f"untraced rep: {step_us:.1f} us/step", file=sys.stderr)

    log_dir = os.environ.get("PROFILE_DIR", "/tmp/kernel_profile")
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        np.asarray(gen(params, mel, 2))

    events, tids = trace_events(log_dir)
    # aggregate complete events by (device line, name); the Pallas kernel
    # shows up as one fusion op per grid step on the TensorCore line —
    # sub-op breakdown only exists if the backend emits it, so print
    # whatever granularity we get
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        line = tids.get((e.get("pid"), e.get("tid")), "?")
        key = (line[:40], e.get("name", "?")[:80])
        a = agg.setdefault(key, [0, 0.0])
        a[0] += 1
        a[1] += e["dur"]  # microseconds
    total = sum(v[1] for v in agg.values())
    print(f"\n{len(events)} events, {total / 1e3:.1f} ms total; top by time:")
    for (line, name), (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:30]:
        print(f"  {dur / 1e3:9.2f} ms  x{n:<6d} [{line}] {name}")


if __name__ == "__main__":
    main()
