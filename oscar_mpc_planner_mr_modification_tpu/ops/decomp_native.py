"""ctypes bindings for the native C++ free-space decomposition
(native/decomp.cpp) — the reference's external decomp_util role
(mpc_planner_modules/src/decomp_constraints.cpp:22,64-86) as a native
library, mirroring how the reference links a C++ DecompUtil.

Built lazily on first use (like guidance/cpp_backend.py); the numpy
implementation in :mod:`.decomp` stays the reference/portable backend.
Both produce identical halfspaces (parity test: tests/test_decomp_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdecomp.so")
_lib = None
_build_failed = False


def _build() -> bool:
    global _build_failed
    if _build_failed:
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB_PATH,
             os.path.join(_NATIVE_DIR, "decomp.cpp")],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
    c_d = ctypes.POINTER(ctypes.c_double)
    lib.decomp_dilate_path.restype = ctypes.c_int
    lib.decomp_dilate_path.argtypes = [
        c_d, ctypes.c_int,  # path, n_pts
        c_d, ctypes.c_int,  # obstacles, n_obs
        ctypes.c_double, ctypes.c_int,  # local_range, max_constraints
        c_d, c_d, ctypes.POINTER(ctypes.c_int),  # out_a, out_b, out_counts
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def dilate_path(path: np.ndarray, obstacles: np.ndarray, local_range: float,
                max_constraints: int
                ) -> Optional[List[List[Tuple[np.ndarray, float]]]]:
    """Native counterpart of EllipsoidDecomp2D.dilate_path. Returns None when
    the native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    path = np.ascontiguousarray(path, dtype=np.float64)
    obstacles = np.ascontiguousarray(
        obstacles if len(obstacles) else np.zeros((0, 2)), dtype=np.float64)
    n_pts = path.shape[0]
    out_a = np.zeros((n_pts * max_constraints * 2,), dtype=np.float64)
    out_b = np.zeros((n_pts * max_constraints,), dtype=np.float64)
    out_counts = np.zeros((n_pts,), dtype=np.int32)
    c_d = ctypes.POINTER(ctypes.c_double)
    rc = lib.decomp_dilate_path(
        path.ctypes.data_as(c_d), n_pts,
        obstacles.ctypes.data_as(c_d), obstacles.shape[0],
        float(local_range), int(max_constraints),
        out_a.ctypes.data_as(c_d), out_b.ctypes.data_as(c_d),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        return None
    out: List[List[Tuple[np.ndarray, float]]] = []
    A = out_a.reshape(n_pts, max_constraints, 2)
    Bv = out_b.reshape(n_pts, max_constraints)
    for k in range(n_pts):
        out.append([(A[k, j].copy(), float(Bv[k, j]))
                    for j in range(int(out_counts[k]))])
    return out
