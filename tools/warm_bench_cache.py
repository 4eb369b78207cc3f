"""Regenerate the committed warm compile-cache for bench.py.

Runs bench.py in a subprocess against a FRESH persistent-cache dir, then
copies every entry it produced into ``benchmarks/warm_cache/`` (committed).
``compile_cache.enable_persistent_cache`` hydrates the live cache from that
dir, so the driver's end-of-round bench run loads the shipped + anchor
kernels from disk instead of paying the remote cold compile (~27 min on a
bad backend day — BENCH_r02).

Run this (TPU) after ANY change to the shipped serving mode, bench batch,
or kernel code, then commit benchmarks/warm_cache/:

    python tools/warm_bench_cache.py
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WARM = os.path.join(REPO, "benchmarks", "warm_cache")
LIVE = os.path.join(REPO, ".jax_cache")
# the three programs bench.py compiles (names come from the jitted
# function names in bench.py — keep in sync)
BENCH_PREFIXES = ("jit__shipped-", "jit__anchor-", "jit_calibrate_act_amax-")


def snapshot_from_live():
    """Copy the newest live-cache entry per bench program into WARM —
    use right after a successful `python bench.py` run (cheaper than the
    fresh-dir subprocess, same result)."""
    assert os.path.isdir(LIVE), "no live cache; run bench.py first"
    picks = {}
    for f in os.listdir(LIVE):
        for pre in BENCH_PREFIXES:
            if f.startswith(pre):
                p = os.path.join(LIVE, f)
                if pre not in picks or os.path.getmtime(p) > os.path.getmtime(picks[pre]):
                    picks[pre] = p
    missing = [p for p in BENCH_PREFIXES if p not in picks]
    if missing:
        print(f"missing live entries for {missing}; run bench.py first",
              file=sys.stderr)
        return 1
    if os.path.isdir(WARM):
        shutil.rmtree(WARM)
    os.makedirs(WARM)
    total = 0
    for pre, src in picks.items():
        shutil.copyfile(src, os.path.join(WARM, os.path.basename(src)))
        total += os.path.getsize(src)
    from nsynth_wavenet_tpu.utils import compile_cache
    compile_cache.write_manifest(WARM)
    print(f"committed-warm-cache refreshed from live cache: {len(picks)} "
          f"entries, {total / 1e6:.1f} MB -> {WARM}")
    return 0


def main():
    if "--from_live" in sys.argv:
        return snapshot_from_live()
    fresh = tempfile.mkdtemp(prefix="bench_cache_")
    env = dict(os.environ, BENCH_CACHE_DIR=fresh)
    print(f"running bench.py with fresh cache dir {fresh} ...", flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env, cwd=REPO
    )
    if proc.returncode != 0:
        print("bench.py failed; warm cache NOT updated", file=sys.stderr)
        return 1

    entries = [f for f in os.listdir(fresh) if os.path.isfile(os.path.join(fresh, f))]
    if not entries:
        print("bench.py produced no cache entries (all compiles < 1 s?); "
              "warm cache NOT updated", file=sys.stderr)
        return 1
    if os.path.isdir(WARM):
        shutil.rmtree(WARM)
    os.makedirs(WARM)
    total = 0
    for f in entries:
        src = os.path.join(fresh, f)
        shutil.copyfile(src, os.path.join(WARM, f))
        total += os.path.getsize(src)
    from nsynth_wavenet_tpu.utils import compile_cache
    compile_cache.write_manifest(WARM)
    print(f"committed-warm-cache refreshed: {len(entries)} entries, "
          f"{total / 1e6:.1f} MB -> {WARM}")
    print("verify with a fresh process: rm -rf .jax_cache && python bench.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
