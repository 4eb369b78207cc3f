"""Persistent XLA compilation cache.

The tunneled TPU backend compiles through a remote service; cold compiles of
the full-size programs take minutes (the B=512 Pallas AR kernel: ~27 min).
JAX's persistent cache serializes executables to disk and reloads them across
processes (measured 65 s -> 14 s for a small end-to-end synthesis program),
so CLIs and bench.py enable it by default.  Equivalent role to TF1's
session-level graph reuse in the reference (which never restarts processes
mid-experiment); here processes are short-lived so the cache is load-bearing.
"""

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str = None):
    """Call before the first jit execution.  Safe to call multiple times."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir or DEFAULT_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
