"""Warm-compile-cache plumbing (utils/compile_cache.py).

The live .jax_cache does not survive workspace resets, so bench.py's
compiled programs are committed under benchmarks/warm_cache/ and hydrated
into the live dir.  These tests cover the copy mechanics and the
committed artifact's integrity (one entry per bench program) — the
real executable load is validated on TPU (benchmarks/RESULTS.md round-3:
3-5 s compile+first-run after a cache wipe).
"""

import os

from nsynth_wavenet_tpu.utils import compile_cache as cc


def test_hydrate_copies_missing_entries(tmp_path, monkeypatch):
    warm = tmp_path / "warm"
    live = tmp_path / "live"
    warm.mkdir()
    (warm / "jit_a-123-cache").write_bytes(b"AAA")
    (warm / "jit_b-456-cache").write_bytes(b"BBB")
    monkeypatch.setattr(cc, "WARM_CACHE_DIR", str(warm))
    cc.write_manifest(str(warm))

    n = cc.hydrate_warm_cache(str(live))
    assert n == 2
    assert (live / "jit_a-123-cache").read_bytes() == b"AAA"
    assert not (live / cc.MANIFEST_NAME).exists()

    # existing entries are never overwritten
    (live / "jit_a-123-cache").write_bytes(b"LIVE")
    n = cc.hydrate_warm_cache(str(live))
    assert n == 0
    assert (live / "jit_a-123-cache").read_bytes() == b"LIVE"


def test_hydrate_verifies_checksums(tmp_path, monkeypatch):
    """Entries are executable blobs JAX deserializes — tampered or
    unmanifested entries must be skipped, and no manifest means nothing
    hydrates (round-3 advisor finding)."""
    warm = tmp_path / "warm"
    warm.mkdir()
    (warm / "jit_a-123-cache").write_bytes(b"AAA")
    monkeypatch.setattr(cc, "WARM_CACHE_DIR", str(warm))

    # no manifest at all -> nothing copied
    assert cc.hydrate_warm_cache(str(tmp_path / "l0")) == 0

    cc.write_manifest(str(warm))
    # tampered after manifesting -> skipped
    (warm / "jit_a-123-cache").write_bytes(b"EVIL")
    assert cc.hydrate_warm_cache(str(tmp_path / "l1")) == 0
    # restored content -> hydrates
    (warm / "jit_a-123-cache").write_bytes(b"AAA")
    assert cc.hydrate_warm_cache(str(tmp_path / "l2")) == 1
    # a new entry absent from the manifest -> skipped
    (warm / "jit_c-789-cache").write_bytes(b"CCC")
    assert cc.hydrate_warm_cache(str(tmp_path / "l3")) == 1


def test_hydrate_no_warm_dir_is_noop(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "WARM_CACHE_DIR", str(tmp_path / "absent"))
    assert cc.hydrate_warm_cache(str(tmp_path / "live")) == 0


def test_committed_warm_cache_covers_bench_programs():
    """The committed artifact must hold exactly one entry per program
    bench.py compiles (prefixes defined in tools/warm_bench_cache.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "warm_bench_cache",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "warm_bench_cache.py"),
    )
    wbc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wbc)

    assert os.path.isdir(cc.WARM_CACHE_DIR), "warm cache not committed"
    entries = os.listdir(cc.WARM_CACHE_DIR)
    for pre in wbc.BENCH_PREFIXES:
        matches = [e for e in entries if e.startswith(pre)]
        assert len(matches) == 1, (pre, matches)
        size = os.path.getsize(os.path.join(cc.WARM_CACHE_DIR, matches[0]))
        assert size > 100_000, (matches[0], size)  # real executables are MBs
