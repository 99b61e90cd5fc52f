"""Native (C++) components, loaded via ctypes.

Currently: `leiden` — Leiden community detection (leiden.cpp), the native
replacement for the reference's igraph/leidenalg dependency
(`/root/reference/alpine/optimization.py:271-272`).  The shared library is
compiled on first use with g++ and cached next to the source; a pure-Python
Louvain-style fallback (`alpine_tpu/optimize/scoring.py:_python_louvain`)
kicks in if no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "leiden.cpp")
_LIB = os.path.join(_HERE, "_leiden.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # per-process temp name: a fixed tmp path would (a) leak a partial file
    # when g++ is killed, and (b) let concurrent processes on a fresh
    # checkout promote each other's half-written output via os.replace,
    # loading a torn .so
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, _LIB)  # atomic promote; last complete build wins
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def load_leiden() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the Leiden shared library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.alpine_leiden.restype = ctypes.c_int64
        lib.alpine_leiden.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def leiden_native(
    n_nodes: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: Optional[np.ndarray],
    resolution: float = 1.0,
    max_levels: int = 10,
    seed: int = 0,
) -> Optional[np.ndarray]:
    """Run native Leiden; returns labels (n_nodes,) or None if unavailable."""
    lib = load_leiden()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    w_ptr = None
    if weight is not None:
        weight = np.ascontiguousarray(weight, dtype=np.float64)
        w_ptr = weight.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    out = np.empty(n_nodes, dtype=np.int64)
    rc = lib.alpine_leiden(
        n_nodes, len(src),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        w_ptr, float(resolution), int(max_levels), int(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc < 0:
        return None
    return out
