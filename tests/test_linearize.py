"""Lane-layout linearizer (ops/linearize.py) + lane fleet solver coverage.

The lane pipeline computes the SAME QP fields as ops/sqp._make_machinery's
``build_qp`` but with the batch on the trailing (VPU-lane) axis, feeding the
Pallas kernel with zero relayout. These tests pin exact parity of every QP
field and full-solve parity of the ``backend="lanes"`` fleet solver against
the XLA reference backend. Reference analog: the linearization half of the
acados SQP-RTI preparation phase (acados_solver_interface.cpp:86-204).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
    build_tmpc_fleet, tmpc_bench_ocp)
from oscar_mpc_planner_mr_modification_tpu.ops.linearize import (
    make_lane_linearizer, make_lane_merit)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
    SQPConfig, _make_machinery, make_fleet_sqp_solver)

from test_sqp import goal_tracking_setup


def _bench_instances(N=8, B=5, seed=0):
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=2)
    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, 2)
    P = params.shape[1]
    params = np.asarray(params).reshape(2 * P, *params.shape[2:])[:B]
    xinit = np.repeat(np.asarray(xinit), P, axis=0)[:B]
    z_init = np.asarray(z_init).reshape(2 * P, *z_init.shape[2:])[:B]
    rng = np.random.default_rng(seed)
    z_init = z_init + 0.01 * rng.standard_normal(z_init.shape)
    return ocp, params, xinit, z_init


def test_lane_linearizer_matches_vmapped_build_qp():
    """Exact parity of every QP field on the bench OCP (contouring unicycle +
    ellipsoid obstacles + topology halfspaces), active rows/stages."""
    ocp, params, xinit, z_init = _bench_instances()
    dtype = jnp.float64
    config = SQPConfig(n_sqp=2, n_qp_iter=8, reg_eps=1e-4,
                       regularization="gershgorin")
    mach = _make_machinery(ocp, config, dtype)

    params_j = jnp.asarray(params, dtype)
    xinit_j = jnp.asarray(xinit, dtype)
    z_j = jnp.asarray(z_init, dtype)
    T = z_init.shape[1]
    P_full = jnp.concatenate([params_j, params_j[:, -1:]], axis=1)
    qp = jax.vmap(mach.build_qp)(z_j, P_full, xinit_j)

    lin = make_lane_linearizer(ocp, config, dtype)
    lane = lin(jnp.transpose(P_full, (2, 1, 0)),
               jnp.transpose(z_j, (1, 2, 0)),
               jnp.transpose(xinit_j, (1, 0)))

    def to_bm(x):  # (..., B) -> (B, ...)
        return np.moveaxis(np.asarray(x), -1, 0)

    np.testing.assert_allclose(to_bm(lane.H), np.asarray(qp.H), atol=1e-9)
    np.testing.assert_allclose(to_bm(lane.g), np.asarray(qp.g), atol=1e-9)
    np.testing.assert_allclose(to_bm(lane.A), np.asarray(qp.A), atol=1e-9)
    np.testing.assert_allclose(to_bm(lane.B), np.asarray(qp.B), atol=1e-9)
    np.testing.assert_allclose(to_bm(lane.c), np.asarray(qp.c), atol=1e-9)
    np.testing.assert_allclose(to_bm(lane.r0), np.asarray(qp.r0), atol=1e-9)
    # D carries compacted generic rows; e placeholders sit at masked stages
    h_rows = [r for r, meta in enumerate(mach.row_meta) if meta[0] == "h"]
    mask_h = np.asarray(mach.stage_mask)[:, h_rows] > 0
    np.testing.assert_allclose(
        to_bm(lane.D)[:, mask_h],
        np.asarray(qp.D)[:, :, h_rows, :][:, mask_h], atol=1e-9)
    mask = np.asarray(mach.stage_mask) > 0
    np.testing.assert_allclose(to_bm(lane.e)[:, mask],
                               np.asarray(qp.e)[:, mask], atol=1e-9)


def test_lane_merit_matches_fleet_merit_semantics():
    """Lane merit = cost + w*max(eq defects, xinit residual); inf when
    non-finite (same definition as the fleet solver's merit_of)."""
    ocp, params, xinit, z_init = _bench_instances(B=4)
    dtype = jnp.float64
    config = SQPConfig()
    merit = make_lane_merit(ocp, config, dtype)

    params_j = jnp.asarray(params, dtype)
    P_full = jnp.concatenate([params_j, params_j[:, -1:]], axis=1)
    z_j = jnp.asarray(z_init, dtype)
    # Poison one instance with a NaN
    z_j = z_j.at[2, 3, 1].set(jnp.nan)
    m, cost, eq_res, finite = merit(
        jnp.transpose(P_full, (2, 1, 0)), jnp.transpose(z_j, (1, 2, 0)),
        jnp.transpose(jnp.asarray(xinit, dtype), (1, 0)))
    assert m.shape == (4,)
    assert not bool(finite[2]) and np.isinf(float(m[2]))
    for b in (0, 1, 3):
        zb, pb = z_j[b], P_full[b]
        f = jax.vmap(ocp.dynamics, in_axes=(0, 0, 0))(
            zb[:-1, ocp.nu:], zb[:-1, :ocp.nu], pb[:-1])
        eq = max(float(jnp.max(jnp.abs(f - zb[1:, ocp.nu:]))),
                 float(jnp.max(jnp.abs(
                     jnp.asarray(xinit[b], dtype) - zb[0, ocp.nu:]))))
        c = float(sum(ocp.cost_stage(zb[k], pb[k])
                      for k in range(z_init.shape[1] - 1))
                  + ocp.cost_terminal(zb[-1, ocp.nu:], pb[-1]))
        np.testing.assert_allclose(float(eq_res[b]), eq, rtol=1e-9)
        np.testing.assert_allclose(float(cost[b]), c, rtol=1e-9)
        np.testing.assert_allclose(
            float(m[b]), c + config.merit_eq_weight * eq, rtol=1e-9)


@pytest.mark.slow
def test_lane_fleet_solver_matches_xla_backend():
    """Full SQP parity: backend="lanes" (lane linearizer + lane kernel entry,
    interpret mode) vs backend="xla" on the BASELINE config-1 OCP."""
    N = 3
    ocp, P, x0, z_init = goal_tracking_setup(N=N, n_obstacles=1)
    B = 3
    Pb = np.tile(P[None], (B, 1, 1))
    for b in range(B):
        Pb[b, :, ocp.registry.index("goal_y")] = 1.5 - 0.6 * b
    x0b = np.tile(x0[None], (B, 1))
    x0b[:, 1] = np.array([0.0, 0.15, -0.2])
    zb = np.tile(z_init[None], (B, 1, 1))
    zb[..., ocp.nu:] = x0b[:, None, :]

    cfg = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10,
                    regularization="gershgorin", reg_eps=1e-4)
    solve_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                      backend="xla")
    solve_lane = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                       backend="lanes", interpret=True)

    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))
    r_xla = solve_xla(*args)
    r_lane = solve_lane(*args)

    assert bool(np.all(np.asarray(r_xla.success)))
    assert bool(np.all(np.asarray(r_lane.success)))
    np.testing.assert_allclose(np.asarray(r_lane.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_lane.cost),
                               np.asarray(r_xla.cost), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_lane_backend_falls_back_on_unsupported_ocp():
    """An OCP whose functions are not elementwise-polymorphic must fall back
    to the batch-major pallas path with a warning, not crash."""
    import dataclasses

    ocp, _, _, _ = _bench_instances(N=3, B=1)

    def bad_cost(z, p):  # forces a scalar-only shape: breaks lane tracing
        return jnp.reshape(z[0], ()) ** 2

    bad = dataclasses.replace(ocp, cost_stage=bad_cost)
    with pytest.warns(UserWarning, match="lane-layout"):
        solve = make_fleet_sqp_solver(bad, SQPConfig(
            n_sqp=1, n_qp_iter=2, regularization="gershgorin"),
            dtype=jnp.float64, backend="lanes", interpret=True)
    assert solve is not None
