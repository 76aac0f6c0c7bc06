"""Native (C++) runtime components, loaded via ctypes with auto-build.

The reference implements its runtime-adjacent pieces in CUDA/C++
(simple-knn, the rasterizer's host orchestration); the TPU build keeps the
compute path in Pallas/XLA and implements host-side components natively here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "simple_knn.cpp")
    out = os.path.join(_DIR, "libgsknn.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except Exception:
        return None


def load_knn() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.mean_sq_dist_3nn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.mean_sq_dist_3nn.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def mean_sq_dist_3nn_native(points: np.ndarray, num_threads: int = 0) -> Optional[np.ndarray]:
    """C++ 3-NN mean squared distance; None if the native lib is unavailable."""
    lib = load_knn()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    rc = lib.mean_sq_dist_3nn(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if rc != 0:
        return None
    return out
