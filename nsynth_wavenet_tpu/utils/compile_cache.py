"""Persistent XLA compilation cache (+ committed warm entries).

The tunneled TPU backend compiles through a remote service; cold compiles of
the full-size programs take minutes (the B=512 Pallas AR kernel has been
observed at ~27 min on a bad day — BENCH_r02 paid exactly that).  JAX's
persistent cache serializes executables to disk and reloads them across
processes, so CLIs and bench.py enable it by default.

The live cache dir (``.jax_cache``) is gitignored and does NOT survive
round/workspace boundaries (verified empty at round-3 start after a full
round-2 of cached runs).  To keep the driver's end-of-round ``bench.py``
run from ever paying the remote cold compile again, the exact executables
bench.py needs are COMMITTED under ``benchmarks/warm_cache/`` (see
tools/warm_bench_cache.py) and hydrated into the live dir here.  Cache
keys include the jaxlib + backend versions, so stale committed entries are
simply never hit (they cost repo bytes, not correctness).
"""

import os
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO, ".jax_cache")
WARM_CACHE_DIR = os.path.join(_REPO, "benchmarks", "warm_cache")


def hydrate_warm_cache(cache_dir: str = None):
    """Copy committed warm-cache entries into the live cache dir (no-op for
    entries already present)."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    if not os.path.isdir(WARM_CACHE_DIR):
        return 0
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for name in os.listdir(WARM_CACHE_DIR):
        src = os.path.join(WARM_CACHE_DIR, name)
        dst = os.path.join(cache_dir, name)
        if os.path.isfile(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
            n += 1
    return n


def enable_persistent_cache(cache_dir: str = None):
    """Call before the first jit execution.  Safe to call multiple times."""
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    hydrate_warm_cache(cache_dir)
