"""Shared perfetto-trace aggregation for the benchmark tools.

jax.profiler with create_perfetto_trace=True is the only working capture
path in this environment (the tensorboard xplane converter is incompatible
with the installed TF/protobuf); these helpers read the gzipped trace and
aggregate device-event durations by op name.
"""

import glob
import gzip
import json
import os


def load_events(log_dir):
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


def top_device_ops(log_dir, top=25, min_ms=0.0, device_only=True):
    """Print the top ops by total device time; returns the aggregation."""
    events, tids = load_events(log_dir)
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        line = tids.get((e.get("pid"), e.get("tid")), "?")
        if device_only and not any(
            k in line for k in ("TensorCore", "XLA", "/device")
        ):
            continue
        key = (line[:30], e.get("name", "?")[:70])
        a = agg.setdefault(key, [0, 0.0])
        a[0] += 1
        a[1] += e["dur"]
    total = sum(v[1] for v in agg.values())
    print(f"\ntrace: {total / 1e3:.1f} ms aggregated device time; top ops:")
    for (line, name), (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]:
        if dur / 1e3 < min_ms:
            break
        print(f"  {dur / 1e3:9.2f} ms  x{n:<5d} [{line}] {name}")
    return agg
