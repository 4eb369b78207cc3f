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

import hashlib
import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO, ".jax_cache")
WARM_CACHE_DIR = os.path.join(_REPO, "benchmarks", "warm_cache")
MANIFEST_NAME = "MANIFEST.sha256"


def _sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def read_manifest(warm_dir: str = None):
    """Parse the committed checksum manifest: {entry name: sha256}."""
    path = os.path.join(warm_dir or WARM_CACHE_DIR, MANIFEST_NAME)
    if not os.path.isfile(path):
        return None
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                out[parts[1]] = parts[0]
    return out


def write_manifest(warm_dir: str = None):
    """Write MANIFEST.sha256 covering every entry in the warm-cache dir
    (called by tools/warm_bench_cache.py after refreshing entries)."""
    warm_dir = warm_dir or WARM_CACHE_DIR
    names = sorted(
        f for f in os.listdir(warm_dir)
        if f != MANIFEST_NAME and os.path.isfile(os.path.join(warm_dir, f))
    )
    path = os.path.join(warm_dir, MANIFEST_NAME)
    with open(path, "w") as f:
        for name in names:
            f.write(f"{_sha256(os.path.join(warm_dir, name))}  {name}\n")
    return path


def hydrate_warm_cache(cache_dir: str = None):
    """Copy committed warm-cache entries into the live cache dir (no-op for
    entries already present).

    Entries are executable blobs that JAX deserializes and runs, so each is
    verified against the committed MANIFEST.sha256 before copying; entries
    that mismatch (tampered/corrupted) or are absent from the manifest are
    skipped with a warning rather than silently hydrated (round-3 advisor
    finding).  Threat model (round-4 advisor): this is an INTEGRITY check
    against corruption/stale drift, not an authenticity check — the
    manifest lives next to the blobs, so an attacker with commit access
    can regenerate both together.  Defending against that requires code
    review of commits touching benchmarks/warm_cache/ (same trust level
    as committed source, which such an attacker could also edit)."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    if not os.path.isdir(WARM_CACHE_DIR):
        return 0
    manifest = read_manifest()
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(WARM_CACHE_DIR)):
        if name == MANIFEST_NAME:
            continue
        src = os.path.join(WARM_CACHE_DIR, name)
        dst = os.path.join(cache_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        if manifest is None or manifest.get(name) != _sha256(src):
            reason = "no manifest" if manifest is None else (
                "not in manifest" if name not in manifest else "sha256 mismatch"
            )
            print(f"warm_cache: skipping {name} ({reason})", file=sys.stderr)
            continue
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
