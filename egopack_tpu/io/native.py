"""ctypes bindings for the native gather library (lazy one-time g++ build).

Python fallback is always available; the native path is behavior-identical
(same indices, same clamping, same zero-fill) and exists to release the GIL
and use wide memcpy on the host hot path. Select with ``EGOPACK_NATIVE_IO``
(default: on when the toolchain builds the library, fall back silently
otherwise).
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = osp.join(osp.dirname(__file__), "native", "gather.cpp")
_LIB = osp.join(osp.dirname(__file__), "native", "libgather.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _LIB, "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.info("native gather build failed (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("EGOPACK_NATIVE_IO", "1") == "0":
            return None
        if not osp.exists(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gather_rows_mt.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                       i64p, ctypes.c_int64, f32p, ctypes.c_int]
        lib.gather_interp.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                      i64p, i64p, f32p, ctypes.c_int64, f32p]
        _lib = lib
        return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def default_io_threads() -> int:
    """Gather thread count: ``EGOPACK_IO_THREADS`` env, else the host core
    count. Threads also overlap memmap page-fault IO waits, so >1 can pay
    even on a single core when the feature store exceeds the page cache."""
    env = os.environ.get("EGOPACK_IO_THREADS")
    if env:
        return max(1, int(env))
    return max(1, os.cpu_count() or 1)


def gather_rows(src: np.ndarray, idx: np.ndarray,
                out: Optional[np.ndarray] = None,
                n_threads: Optional[int] = None) -> np.ndarray:
    """out[i] = src[clamp(idx[i])]; negative index → zero row.

    src must be float32 C-contiguous (memmaps from the feature store are).
    ``n_threads=None`` resolves via :func:`default_io_threads` for large
    gathers; small per-sample gathers (the dataset hot path moves 37-166 KB)
    stay single-threaded — thread create/join would dwarf the memcpy.
    """
    if n_threads is None:
        n_threads = (default_io_threads()
                     if idx.size * src.shape[1] * 4 >= (1 << 20) else 1)
    lib = get_lib()
    idx = np.ascontiguousarray(idx, np.int64)
    n, dim = len(idx), src.shape[1]
    if out is None:
        out = np.empty((n, dim), np.float32)
    if lib is None or src.dtype != np.float32:
        clamped = np.clip(idx, 0, src.shape[0] - 1)
        np.take(src, clamped, axis=0, out=out)
        out[idx < 0] = 0.0
        return out
    src = src if src.flags["C_CONTIGUOUS"] else np.ascontiguousarray(src)
    lib.gather_rows_mt(_f32p(src), src.shape[0], dim, _i64p(idx), n,
                       _f32p(out), n_threads)
    return out


def gather_interp(src: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                  frac: np.ndarray) -> np.ndarray:
    """PNR fractional-stride interpolation gather (see gather.cpp)."""
    lib = get_lib()
    n, dim = len(lo), src.shape[1]
    if lib is None or src.dtype != np.float32:
        lo_c = np.clip(lo, 0, src.shape[0] - 1)
        hi_c = np.clip(hi, 0, src.shape[0] - 1)
        low = np.take(src, lo_c, axis=0).astype(np.float32)
        high = np.take(src, hi_c, axis=0).astype(np.float32)
        out = (1 - frac)[:, None] * low + frac[:, None] * high
        out[lo_c == hi_c] = low[lo_c == hi_c]
        return out.astype(np.float32)
    src = src if src.flags["C_CONTIGUOUS"] else np.ascontiguousarray(src)
    out = np.empty((n, dim), np.float32)
    lib.gather_interp(_f32p(src), src.shape[0], dim,
                      _i64p(np.ascontiguousarray(lo, np.int64)),
                      _i64p(np.ascontiguousarray(hi, np.int64)),
                      _f32p(np.ascontiguousarray(frac, np.float32)),
                      n, _f32p(out))
    return out
