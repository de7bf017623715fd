"""Frozen golden parity fixtures (VERDICT r1 next #8).

Round 1 validated the SQP engine against scipy SLSQP re-solves; that only
catches drift if SLSQP re-converges identically. These tests pin frozen f64
solutions (inputs + solved Z + cost) committed as npz under tests/golden/, so
cross-round numerical drift in the solver stack fails the CPU suite directly.

Regenerate (only after an INTENTIONAL numerics change, with justification in
the commit message):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/golden/generate.py
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (SQPConfig,
                                                           make_sqp_solver)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _case_specs():
    """(name, setup() -> (ocp, P, x0, z_init), SQPConfig) for each frozen case.

    Configs match the round-1 parity tests (tests/test_sqp.py) so the goldens
    pin exactly the operating points the SLSQP cross-checks validated.
    """
    from test_sqp import contouring_setup, goal_tracking_setup

    def bicycle_setup():
        from oscar_mpc_planner_mr_modification_tpu.factory import (
            configuration_bicycle)
        from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
        from oscar_mpc_planner_mr_modification_tpu.utils import (
            default_settings)

        N = 15
        settings = default_settings(N=N, max_obstacles=2)
        model, mm = configuration_bicycle(settings)
        ocp = build_ocp(model, mm, settings)
        idx = ocp.registry.save_map()
        P = np.zeros((N, ocp.npar))
        w = settings["weights"]
        for name in ("acceleration", "angular_velocity", "slack", "velocity",
                     "reference_velocity", "contour", "lag", "terminal_angle",
                     "terminal_contouring"):
            P[:, idx[name]] = w[name]
        for i in range(settings["contouring"]["num_segments"]):
            P[:, idx[f"spline_x{i}_c"]] = 1.0
            P[:, idx[f"spline{i}_start"]] = 8.0 * i
        P[:, idx["ego_disc_radius"]] = 1.0
        for i, (ox, oy) in enumerate([(12.0, 1.0), (20.0, -1.5)]):
            P[:, idx[f"ellipsoid_obst_{i}_x"]] = ox
            P[:, idx[f"ellipsoid_obst_{i}_y"]] = oy
            P[:, idx[f"ellipsoid_obst_{i}_chi"]] = 1.0
            P[:, idx[f"ellipsoid_obst_{i}_r"]] = 0.5
        x0 = np.array([0.0, 0.0, 0.0, 3.0, 0.0, 0.0])
        z_init = np.zeros((N + 1, ocp.nvar))
        z_init[:, ocp.nu:] = x0
        return ocp, P, x0, z_init

    return [
        ("goal_tracking_3obs",
         lambda: goal_tracking_setup(N=20, n_obstacles=3),
         SQPConfig(n_sqp=10, n_qp_iter=20, mu_min=1e-10)),
        ("contouring_2obs",
         lambda: contouring_setup(N=15, n_obstacles=2),
         SQPConfig(n_sqp=30, n_qp_iter=20, mu_min=1e-10)),
        ("bicycle_contouring",
         bicycle_setup,
         SQPConfig(n_sqp=15, n_qp_iter=15)),
    ]


def solve_case(setup, config):
    ocp, P, x0, z_init = setup()
    solve = make_sqp_solver(ocp, config, dtype=jnp.float64)
    result = solve(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))
    return P, x0, z_init, result


@pytest.mark.parametrize("name,setup,config",
                         _case_specs(), ids=lambda v: v if isinstance(v, str)
                         else "")
def test_golden_fixture_drift(name, setup, config):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden fixture {path}; run tests/golden/generate.py")
    gold = np.load(path)
    P, x0, z_init, result = solve_case(setup, config)
    # Inputs must be identical to what the golden was generated from —
    # otherwise the comparison is meaningless (setup drifted, not the solver).
    np.testing.assert_array_equal(P, gold["P"], err_msg="setup params drifted")
    np.testing.assert_array_equal(x0, gold["x0"])
    np.testing.assert_array_equal(z_init, gold["z_init"])

    assert bool(result.success)
    np.testing.assert_allclose(np.asarray(result.z), gold["Z"], atol=1e-6,
                               err_msg=f"{name}: solution drifted")
    np.testing.assert_allclose(float(result.cost), float(gold["cost"]),
                               atol=1e-8, rtol=1e-8)
