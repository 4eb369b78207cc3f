"""ctypes binding for the native batch sampler (sampler.cpp).

Lazy build-on-first-use: compiles libsampler.so with g++ next to the source
if it is missing or stale, then loads it via ctypes (no pybind11 in this
environment).  Every entry point degrades gracefully: ``load()`` returns
None when no compiler is available, and Dataset falls back to the pure-numpy
gather (bit-identical output — tests/test_native_sampler.py).
"""

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sampler.cpp")
_LIB = os.path.join(_DIR, "libsampler.so")

_lock = threading.Lock()
_lib = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    # compile to a per-pid temp then atomically rename: concurrent processes
    # (multi-host training starts one per host/process) must never observe a
    # half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.crop_gather.argtypes = [
            _f32p, _i64p, _i64p, ctypes.c_int64,
            _i64p, _i64p, ctypes.c_int64, ctypes.c_int64,
            _f32p, ctypes.c_int64,
        ]
        lib.crop_gather.restype = None
        _lib = lib
        return _lib


def crop_gather(data, offsets, lengths, rec_idx, starts, crop_len, out,
                n_threads: int = 0) -> bool:
    """Native gather of ``len(rec_idx)`` crops into ``out``; False if the
    library is unavailable (caller should run the numpy path).  All array
    arguments must be C-contiguous numpy arrays of the documented dtypes."""
    import numpy as np

    lib = load()
    if lib is None:
        return False
    # FFI preconditions: raise explicitly (NOT assert — asserts vanish under
    # python -O, and a wrong dtype/stride here is memory corruption in C++,
    # not a graceful error).
    for name, a in (("data", data), ("out", out)):
        if a.dtype != np.float32 or not a.flags.c_contiguous:
            raise TypeError(
                f"crop_gather: {name} must be C-contiguous float32, got "
                f"dtype={a.dtype}, contiguous={a.flags.c_contiguous}"
            )
    for name, a in (
        ("offsets", offsets), ("lengths", lengths),
        ("rec_idx", rec_idx), ("starts", starts),
    ):
        if a.dtype != np.int64 or not a.flags.c_contiguous:
            raise TypeError(
                f"crop_gather: {name} must be C-contiguous int64, got "
                f"dtype={a.dtype}, contiguous={a.flags.c_contiguous}"
            )
    if out.shape != (len(rec_idx), crop_len):
        raise ValueError(
            f"crop_gather: out shape {out.shape} != {(len(rec_idx), crop_len)}"
        )
    lib.crop_gather(
        data.ctypes.data_as(_f32p),
        offsets.ctypes.data_as(_i64p),
        lengths.ctypes.data_as(_i64p),
        ctypes.c_int64(len(offsets)),
        rec_idx.ctypes.data_as(_i64p),
        starts.ctypes.data_as(_i64p),
        ctypes.c_int64(len(rec_idx)),
        ctypes.c_int64(crop_len),
        out.ctypes.data_as(_f32p),
        ctypes.c_int64(n_threads),
    )
    return True
