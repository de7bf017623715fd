"""Native C++ decomposition (native/decomp.cpp) parity vs the numpy
reference implementation (ops/decomp.py) — same role split as the
reference's external C++ decomp_util (decomp_constraints.cpp:22,64-86)."""

import numpy as np
import pytest

from oscar_mpc_planner_mr_modification_tpu.ops import decomp_native
from oscar_mpc_planner_mr_modification_tpu.ops.decomp import EllipsoidDecomp2D


def _random_scene(seed):
    rng = np.random.default_rng(seed)
    n_pts = rng.integers(3, 8)
    path = np.cumsum(rng.uniform(-0.4, 1.0, size=(n_pts, 2)), axis=0)
    n_obs = int(rng.integers(0, 60))
    obstacles = rng.uniform(-2.0, 8.0, size=(n_obs, 2))
    return path, obstacles


def test_native_decomp_matches_python():
    if not decomp_native.available():
        pytest.skip("native toolchain unavailable")
    for seed in range(8):
        path, obstacles = _random_scene(seed)
        py = EllipsoidDecomp2D(local_range=2.5, max_constraints=8,
                               backend="python").dilate_path(path, obstacles)
        cc = decomp_native.dilate_path(path, obstacles, 2.5, 8)
        assert cc is not None
        assert len(cc) == len(py)
        for k, (hs_py, hs_cc) in enumerate(zip(py, cc)):
            assert len(hs_cc) == len(hs_py), f"seed {seed} k {k}"
            for (a_p, b_p), (a_c, b_c) in zip(hs_py, hs_cc):
                np.testing.assert_allclose(a_c, a_p, atol=1e-9,
                                           err_msg=f"seed {seed} k {k}")
                assert abs(b_c - b_p) < 1e-9, f"seed {seed} k {k}"


def test_auto_backend_halfspaces_exclude_obstacles():
    """Whichever backend "auto" picks: every emitted halfspace must keep the
    seed segment feasible and the generating obstacle on/outside the cut."""
    path = np.array([[0.0, 0.0], [1.5, 0.2], [3.0, 0.0]])
    rng = np.random.default_rng(3)
    obstacles = rng.uniform([-1.0, -2.0], [4.0, 2.0], size=(40, 2))
    # Keep obstacles off the path itself
    obstacles = obstacles[np.abs(obstacles[:, 1]) > 0.35]
    decomp = EllipsoidDecomp2D(local_range=2.5, max_constraints=8)
    out = decomp.dilate_path(path, obstacles)
    assert any(len(hs) for hs in out)
    for k in range(1, len(path)):
        mid = 0.5 * (path[k - 1] + path[k])
        for a, b in out[k]:
            assert float(a @ mid) <= b + 1e-9, "segment midpoint cut off"
            np.testing.assert_allclose(np.linalg.norm(a), 1.0, atol=1e-9)
