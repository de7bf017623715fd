"""CPU-suite coverage of the shipped Pallas QP kernel (interpret mode).

The fused kernel (ops/qp_pallas.py) is the single most load-bearing file for the
headline throughput number; these tests run the EXACT kernel body through the
Pallas interpreter so a kernel regression fails the CPU suite instead of only
surfacing in on-hardware runs. Reference analog: the solver integration test
exercises the actual shipped solver (solver_generator/test/test_acados.py:48-77).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.qp import QPData, solve_qp
from oscar_mpc_planner_mr_modification_tpu.ops.qp_pallas import solve_qp_batched
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
    SQPConfig, make_fleet_sqp_solver)

from test_qp import random_qp
from test_sqp import goal_tracking_setup


def test_pallas_kernel_matches_xla_qp_interpret():
    """solve_qp_batched(interpret=True) vs per-instance ops/qp.solve_qp on the
    random stagewise QP generators, including active-constraint instances."""
    seeds = [0, 1, 2, 3]
    raws = []
    for seed in seeds:
        _, raw = random_qp(seed)
        raws.append(raw)
    # Tightened variants: z=0 inequality-infeasible, several rows active
    for seed, tighten in ((7, 0.5), (11, 0.8)):
        _, raw = random_qp(seed)
        H, g, A, B, c, D, e, mask, r0 = raw
        e = np.where(mask > 0, e - tighten, e)
        raws.append((H, g, A, B, c, D, e, mask, r0))

    batch = [np.stack([raw[i] for raw in raws]) for i in range(9)]
    H, g, A, B, c, D, e, mask, r0 = [jnp.asarray(x) for x in batch]

    z_pallas = solve_qp_batched(
        H, g, A, B, c, D, e, mask, r0, nu=2, n_iters=30, mu_min=1e-11,
        w_max=1e14, s_floor=1e-12, tol_freeze=1e-10, interpret=True)
    assert np.isfinite(np.asarray(z_pallas)).all()

    for b, raw in enumerate(raws):
        qp = QPData(*[jnp.asarray(x) for x in raw])
        sol = solve_qp(qp, nu=2, n_iters=30, mu_min=1e-11)
        z_ref = np.asarray(sol.z)
        z_k = np.asarray(z_pallas[b])
        # Terminal dummy u differs by construction; compare everything else
        np.testing.assert_allclose(z_k[:-1], z_ref[:-1], atol=5e-5,
                                   err_msg=f"batch element {b}")
        np.testing.assert_allclose(z_k[-1, 2:], z_ref[-1, 2:], atol=5e-5)


def test_fleet_sqp_pallas_backend_matches_xla_backend():
    """Full SQP parity through make_fleet_sqp_solver with the pallas backend in
    interpret mode vs the XLA backend, on the BASELINE config-1 OCP."""
    # Keep T = N+1 tiny: interpret-mode emulation cost blows up nonlinearly
    # with T and the row count (T=6/m=14 is ~145 s PER CALL on XLA:CPU; T=4 is
    # ~5 s). The kernel body is identical at any T, so small-T coverage still
    # catches kernel regressions.
    N = 3
    ocp, P, x0, z_init = goal_tracking_setup(N=N, n_obstacles=1)
    B = 3
    Pb = np.tile(P[None], (B, 1, 1))
    # Vary the instances: different goals and starts
    for b in range(B):
        Pb[b, :, ocp.registry.index("goal_y")] = 1.5 - 0.6 * b
    x0b = np.tile(x0[None], (B, 1))
    x0b[:, 1] = np.array([0.0, 0.15, -0.2])
    zb = np.tile(z_init[None], (B, 1, 1))
    zb[..., ocp.nu:] = x0b[:, None, :]

    cfg = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10)
    solve_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                      backend="xla")
    solve_pal = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                      backend="pallas", interpret=True)

    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))
    r_xla = solve_xla(*args)
    r_pal = solve_pal(*args)

    assert bool(np.all(np.asarray(r_xla.success)))
    assert bool(np.all(np.asarray(r_pal.success)))
    # Same SQP fixed point through either QP backend
    np.testing.assert_allclose(np.asarray(r_pal.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_pal.cost), np.asarray(r_xla.cost),
                               rtol=1e-5, atol=1e-6)
