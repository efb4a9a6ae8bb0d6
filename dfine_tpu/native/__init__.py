"""Native (C++) host-side components.

The TPU framework keeps all tensor math on-device; the only host-side native
compute is the Hungarian assignment (mirroring the reference's scipy LAPJV
C++ dependency, reference src/d_fine/matcher.py:112-120).  The library is
built on demand with g++ and loaded through ctypes — no pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lapjv.cpp")
_LIB = os.path.join(_HERE, "liblapjv.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.lapjv_batch.restype = ctypes.c_int
        lib.lapjv_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def lapjv_batch(cost: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Solve a batch of rectangular assignment problems (minimize).

    cost: [B, nr, nc] float (nr <= nc).  Returns col4row [B, nr] int32 —
    the column assigned to each row.  Falls back to scipy if the native
    library is unavailable.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    b, nr, nc = cost.shape
    lib = _load()
    if lib is not None:
        out = np.empty((b, nr), dtype=np.int32)
        rc = lib.lapjv_batch(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b,
            nr,
            nc,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        if rc == 0:
            return out
    from scipy.optimize import linear_sum_assignment  # fallback

    out = np.empty((b, nr), dtype=np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        out[i] = -1
        out[i, rows] = cols.astype(np.int32)
    return out


def have_native() -> bool:
    return _load() is not None
