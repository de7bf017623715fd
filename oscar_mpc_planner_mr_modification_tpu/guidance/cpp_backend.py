"""ctypes bindings for the native C++ guidance PRM (native/prm.cpp).

The library is built lazily (``make`` / direct g++ invocation) on first use and
cached; :func:`available` reports whether the native path can be used. The
Python implementation in :mod:`.global_guidance` stays the reference/portable
backend; both produce trajectories in identical formats.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libprm.so")
_lib = None
_build_failed = False


def _build() -> bool:
    global _build_failed
    if _build_failed:
        return False
    try:
        # Fresh inode: a process may hold the old library mapped; compiling
        # over the mapped file in place corrupts that mapping, while unlink
        # leaves it intact and dlopen of the path picks up the new file.
        if os.path.exists(_LIB_PATH):
            os.unlink(_LIB_PATH)
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB_PATH,
             os.path.join(_NATIVE_DIR, "prm.cpp")],
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
    if not hasattr(lib, "h_signature_batch"):
        # Stale library from before the native classifier existed: rebuild.
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        if not hasattr(lib, "h_signature_batch"):
            return None
    c_d = ctypes.POINTER(ctypes.c_double)
    lib.prm_search.restype = ctypes.c_int
    lib.prm_search.argtypes = [
        c_d, c_d, ctypes.c_int,  # start, goals, n_goals
        c_d, c_d, ctypes.c_int, ctypes.c_int,  # obs_trajs, radii, n_obs, n_steps
        ctypes.c_double, ctypes.c_int,  # dt, n_grid
        ctypes.c_int, ctypes.c_uint64, ctypes.c_double,  # n_samples, seed, vmax
        ctypes.c_double, ctypes.c_double,  # length_weight, pass_threshold
        ctypes.c_int, ctypes.c_int,  # max_paths_enum, n_out
        c_d, c_d, c_d,  # out_paths, out_sigs, out_costs
    ]
    lib.h_signature_batch.restype = None
    lib.h_signature_batch.argtypes = [
        c_d, ctypes.c_int, ctypes.c_int,  # paths, P, K
        c_d, ctypes.c_int, ctypes.c_int,  # obs, n_obs, T
        ctypes.c_double, c_d,  # dt, out
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def prm_search(start, goals, obstacle_trajs, obstacle_radii, dt: float,
               n_grid: int, n_samples: int, seed: int, max_velocity: float,
               length_weight: float, pass_threshold: float,
               max_paths_enum: int, n_out: int):
    """Run the native search. goals: (n_goals, 3) [x, y, cost]. Returns
    (paths (k, n_grid, 2), sigs (k, n_obs), costs (k,)) with k <= n_out."""
    lib = _load()
    assert lib is not None, "native PRM library unavailable"

    start = np.ascontiguousarray(start, dtype=np.float64)
    goals = np.ascontiguousarray(goals, dtype=np.float64)
    obs = np.ascontiguousarray(obstacle_trajs, dtype=np.float64)
    radii = np.ascontiguousarray(obstacle_radii, dtype=np.float64)
    n_obs = obs.shape[0] if obs.size else 0
    n_steps = obs.shape[1] if obs.size else 1
    if n_obs == 0:
        obs = np.zeros((1, 1, 2))
        radii = np.zeros(1)

    out_paths = np.zeros((n_out, n_grid, 2), dtype=np.float64)
    out_sigs = np.zeros((n_out, max(n_obs, 1)), dtype=np.float64)
    out_costs = np.zeros(n_out, dtype=np.float64)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    k = lib.prm_search(
        ptr(start), ptr(goals), goals.shape[0],
        ptr(obs), ptr(radii), n_obs, n_steps,
        ctypes.c_double(dt), n_grid, n_samples, ctypes.c_uint64(seed),
        ctypes.c_double(max_velocity), ctypes.c_double(length_weight),
        ctypes.c_double(pass_threshold), max_paths_enum, n_out,
        ptr(out_paths), ptr(out_sigs), ptr(out_costs))
    return out_paths[:k], out_sigs[:k, :n_obs], out_costs[:k]


def h_signature_batch(paths, obstacle_trajs, dt: float) -> Optional[np.ndarray]:
    """Native batched H-signature (native/prm.cpp::h_signature_batch).

    paths: (P, K, 2); obstacle_trajs: (n_obs, T, 2). Returns (P, n_obs), or
    None when the native library is unavailable (callers fall back to the
    numpy implementation in guidance/homotopy.py)."""
    lib = _load()
    if lib is None:
        return None
    paths = np.ascontiguousarray(paths, dtype=np.float64)
    obs = np.ascontiguousarray(obstacle_trajs, dtype=np.float64)
    P, K = paths.shape[0], paths.shape[1]
    n_obs, T = obs.shape[0], obs.shape[1]
    out = np.zeros((P, n_obs), dtype=np.float64)
    if P == 0 or n_obs == 0:
        return out

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    lib.h_signature_batch(ptr(paths), P, K, ptr(obs), n_obs, T,
                          ctypes.c_double(dt), ptr(out))
    return out
