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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_pallas_kernel_large_m_with_box_rows():
    """SH-MPC-sized row count (24 generic halfspaces + 16 box rows = m=40,
    the scenario_constraints sizing, reference scripts/scenario_constraints.py:
    14-94) through the kernel's box-row specialization + static-mask path.
    Parity vs the XLA solver in interpret mode."""
    rng = np.random.default_rng(3)
    T, nx, nu, m_h, m_box = 5, 3, 2, 24, 16
    nz = nu + nx
    m = m_h + m_box
    _, raw = random_qp(3, T=T, nx=nx, nu=nu, m=m_h)
    H, g, A, B, c, D_h, e_h, mask_h, r0 = raw
    # 24 random halfspaces with unscaled normals make the feasible set empty/
    # degenerate (neither solver converges and stall points differ): scale the
    # normals down and pad the offsets so the set is comfortably nonempty with
    # a few active rows — the SH-MPC geometry (halfspaces bound a free-space
    # polytope AROUND the trajectory, never a random arrangement).
    D_h = 0.25 * D_h
    e_h = e_h + 1.0
    # Append box rows: alternating lower/upper bounds on each variable
    D = np.zeros((T, m, nz))
    e = np.ones((T, m))
    mask = np.ones((T, m))
    D[:, :m_h] = D_h
    e[:, :m_h] = e_h
    mask[:, :m_h] = mask_h
    row_meta = [("h", 0)] * m_h
    bounds = rng.uniform(1.0, 3.0, size=m_box)
    for j in range(m_box):
        col = j % nz
        sign = 1.0 if j % 2 == 0 else -1.0
        D[:, m_h + j, col] = sign
        e[:, m_h + j] = bounds[j]  # z=0 feasible
        row_meta.append(("box", col, sign))
    mask[-1] = 0.0
    mask[0, [m_h + 2, m_h + 3]] = 0.0  # a partially-masked box row pair

    raws = [(H, g, A, B, c, D, e, mask, r0)]
    # A second instance with a handful of tightened rows (active at optimum)
    _, raw2 = random_qp(5, T=T, nx=nx, nu=nu, m=m_h)
    H2, g2, A2, B2, c2, D_h2, e_h2, _, r02 = raw2
    D2, e2 = D.copy(), e.copy()
    D2[:, :m_h] = 0.25 * D_h2
    e2[:, :m_h] = e_h2 + 1.0
    e2[:, :4] = np.where(mask_h[:, :4] > 0, e_h2[:, :4] - 0.45,
                         e2[:, :4])
    raws.append((H2, g2, A2, B2, c2, D2, e2, mask, r02))

    batch = [np.stack([raw[i] for raw in raws]) for i in range(9)]
    Hb, gb, Ab, Bb, cb, Db, eb, maskb, r0b = [jnp.asarray(x) for x in batch]

    z_pallas = solve_qp_batched(
        Hb, gb, Ab, Bb, cb, Db, eb, mask, r0b, nu=nu, n_iters=30,
        mu_min=1e-11, w_max=1e14, s_floor=1e-12, tol_freeze=1e-10,
        interpret=True, row_meta=tuple(row_meta))
    for b, raw in enumerate(raws):
        qp = QPData(*[jnp.asarray(x) for x in raw])
        sol = solve_qp(qp, nu=nu, n_iters=30, mu_min=1e-11)
        assert float(sol.comp) < 1e-6, (
            f"reference solve did not converge (element {b}): ill-posed test")
        z_ref = np.asarray(sol.z)
        z_k = np.asarray(z_pallas[b])
        np.testing.assert_allclose(z_k[:-1], z_ref[:-1], atol=1e-4,
                                   err_msg=f"batch element {b}")
        # Box-row feasibility at the solution (active stages)
        for j, meta in enumerate(row_meta):
            if meta[0] != "box":
                continue
            col, sign = meta[1], meta[2]
            slack = sign * z_k[:, col] + np.asarray(eb[b])[:, j]
            act = mask[:, j] > 0
            assert (slack[act] > -1e-6).all(), f"box row {j} violated"


@pytest.mark.slow
def test_warm_started_duals_reach_cold_solution():
    """solve_qp_batched_duals: a warm restart from the cold solve's own duals
    must reproduce the cold solution in far fewer IP iterations, including on
    a perturbed QP (the SQP re-linearization situation)."""
    from oscar_mpc_planner_mr_modification_tpu.ops.qp_pallas import (
        solve_qp_batched_duals)

    raws = []
    for seed, tighten in ((0, 0.0), (7, 0.5)):
        _, raw = random_qp(seed)
        H, g, A, B, c, D, e, mask, r0 = raw
        e = np.where(mask > 0, e - tighten, e)
        raws.append((H, g, A, B, c, D, e, mask, r0))
    batch = [np.stack([raw[i] for raw in raws]) for i in range(9)]
    H, g, A, B, c, D, e, mask, r0 = [jnp.asarray(x) for x in batch]

    kw = dict(nu=2, mu_min=1e-11, w_max=1e14, s_floor=1e-12,
              tol_freeze=1e-10, interpret=True)
    z_cold, lam = solve_qp_batched_duals(
        H, g, A, B, c, D, e, mask, r0, n_iters=30, **kw)
    assert np.isfinite(np.asarray(lam)).all()
    assert (np.asarray(lam) >= 0).all()

    # Same QP, warm from its own duals, a third of the iterations
    z_warm, _ = solve_qp_batched_duals(
        H, g, A, B, c, D, e, mask, r0, lam0=lam, n_iters=10, **kw)
    np.testing.assert_allclose(np.asarray(z_warm), np.asarray(z_cold),
                               atol=5e-5)

    # Perturbed QP (the re-linearized-subproblem case): warm restart with 10
    # iterations matches that QP's own 30-iteration cold solve
    g2 = g + 0.05
    e2 = e + jnp.where(mask > 0, 0.02, 0.0)
    z2_cold, _ = solve_qp_batched_duals(
        H, g2, A, B, c, D, e2, mask, r0, n_iters=30, **kw)
    z2_warm, _ = solve_qp_batched_duals(
        H, g2, A, B, c, D, e2, mask, r0, lam0=lam, n_iters=10, **kw)
    np.testing.assert_allclose(np.asarray(z2_warm), np.asarray(z2_cold),
                               atol=1e-4)


@pytest.mark.slow
def test_fleet_sqp_dual_warm_start_matches_cold():
    """make_fleet_sqp_solver with n_qp_iter_warm reaches the same SQP fixed
    point as the all-cold pallas path and the XLA backend (interpret mode)."""
    N = 3
    ocp, P, x0, z_init = goal_tracking_setup(N=N, n_obstacles=1)
    B = 2
    Pb = np.tile(P[None], (B, 1, 1))
    Pb[1, :, ocp.registry.index("goal_y")] = 0.6
    x0b = np.tile(x0[None], (B, 1))
    x0b[1, 1] = 0.15
    zb = np.tile(z_init[None], (B, 1, 1))
    zb[..., ocp.nu:] = x0b[:, None, :]
    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))

    cfg_cold = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10)
    cfg_warm = cfg_cold._replace(n_qp_iter_warm=8)
    r_xla = make_fleet_sqp_solver(ocp, cfg_cold, dtype=jnp.float64,
                                  backend="xla")(*args)
    r_warm = make_fleet_sqp_solver(ocp, cfg_warm, dtype=jnp.float64,
                                   backend="pallas", interpret=True)(*args)

    assert bool(np.all(np.asarray(r_xla.success)))
    assert bool(np.all(np.asarray(r_warm.success)))
    np.testing.assert_allclose(np.asarray(r_warm.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=2e-4)
    np.testing.assert_allclose(np.asarray(r_warm.cost),
                               np.asarray(r_xla.cost), rtol=1e-5, atol=1e-6)


def test_kernel_capacity_cliffs_are_explicit():
    """The kernel's nu<=3 closed-form-inverse limit must fail loudly (not
    silently wrong) — the config-dependent fast-path edge from round 1."""
    import pytest as _pytest

    from oscar_mpc_planner_mr_modification_tpu.ops.qp_pallas import _spd_inv

    with _pytest.raises(NotImplementedError):
        _spd_inv([[1.0] * 4] * 4)
    # All reference models fit: nu=2 (unicycle), nu=3 (slack variants)
    for n in (1, 2, 3):
        out = _spd_inv([[2.0 if i == j else 0.0 for j in range(n)]
                        for i in range(n)])
        assert len(out) == n


def test_pallas_kernel_unconstrained_and_all_masked():
    """m == 0 and all-masked stage masks short-circuit to one exact Riccati
    solve. Round-2 ADVICE: these shapes crashed at trace time
    (comp/feas/alpha_aff stayed None); the wrappers now pad m == 0 to one
    all-masked row and the kernel solves the equality-constrained QP directly.
    """
    from test_qp import scipy_reference

    _, raw = random_qp(3)
    H, g, A, B, c, _, _, _, r0 = raw
    T, nz = g.shape
    no_rows = (np.zeros((T, 0, nz)), np.zeros((T, 0)), np.zeros((T, 0)))
    z_ref = scipy_reference(H, g, A, B, c, *no_rows, r0, nu=2)

    def kernel_solve(Dv, ev, maskv):
        args = [jnp.asarray(x)[None] for x in (H, g, A, B, c, Dv, ev)]
        return np.asarray(solve_qp_batched(
            *args, jnp.asarray(maskv), jnp.asarray(r0)[None], nu=2,
            interpret=True))[0]

    # m == 0: no inequality rows at all
    z0 = kernel_solve(*no_rows)
    np.testing.assert_allclose(z0, z_ref, atol=1e-6)

    # m > 0 but every row masked out at every stage
    z1 = kernel_solve(np.random.default_rng(0).normal(size=(T, 2, nz)),
                      np.ones((T, 2)), np.zeros((T, 2)))
    np.testing.assert_allclose(z1, z_ref, atol=1e-6)


def test_pallas_duals_reject_zero_rows():
    from oscar_mpc_planner_mr_modification_tpu.ops.qp_pallas import (
        solve_qp_batched_duals)

    _, raw = random_qp(3)
    H, g, A, B, c, _, _, _, r0 = raw
    T, nz = g.shape
    args = [jnp.asarray(x)[None]
            for x in (H, g, A, B, c, np.zeros((T, 0, nz)), np.zeros((T, 0)))]
    with pytest.raises(ValueError, match="m == 0"):
        solve_qp_batched_duals(*args, jnp.zeros((T, 0)),
                               jnp.asarray(r0)[None], nu=2, interpret=True)


@pytest.mark.slow
def test_fused_sqp_kernel_matches_xla_backend():
    """Whole-SQP fused kernel (linearization + IP in one pallas_call,
    ops/sqp_fused.py) vs the XLA backend in interpret mode, on the BASELINE
    config-1 OCP, both track_best settings."""
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
    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))

    for track_best in (False, True):
        cfg = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10,
                        regularization="gershgorin", track_best=track_best)
        r_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                      backend="xla")(*args)
        r_fused = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                        backend="fused", interpret=True)(*args)
        assert bool(np.all(np.asarray(r_xla.success))), track_best
        assert bool(np.all(np.asarray(r_fused.success))), track_best
        np.testing.assert_allclose(np.asarray(r_fused.z)[:, :-1],
                                   np.asarray(r_xla.z)[:, :-1], atol=1e-4,
                                   err_msg=f"track_best={track_best}")
        np.testing.assert_allclose(np.asarray(r_fused.cost),
                                   np.asarray(r_xla.cost),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_sqp_kernel_gaussian_config():
    """CC-MPC chance constraints (erfinv-Newton with the Cody-rational erf)
    through the fused whole-SQP kernel in interpret mode, parity vs the XLA
    backend - erf was the last shipped-module primitive Mosaic could not
    lower."""
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        GaussianConstraintModule, GoalModule, ModuleManager, MPCBaseModule)
    from oscar_mpc_planner_mr_modification_tpu.models import (
        SecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    N = 3
    settings = default_settings(N=N, max_obstacles=1)
    model = SecondOrderUnicycleModel()
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(GaussianConstraintModule(settings))
    ocp = build_ocp(model, mm, settings)

    idx = ocp.registry.save_map()
    P = np.zeros((N, ocp.npar))
    P[:, idx["acceleration"]] = 0.34
    P[:, idx["angular_velocity"]] = 0.85
    P[:, idx["goal_weight"]] = 1.0
    P[:, idx["goal_x"]] = 3.0
    P[:, idx["goal_y"]] = 0.8
    P[:, idx["ego_disc_radius"]] = 0.325
    P[:, idx["ego_disc_0_offset"]] = 0.0
    P[:, idx["gaussian_obst_0_x"]] = 1.5
    P[:, idx["gaussian_obst_0_y"]] = 0.5
    P[:, idx["gaussian_obst_0_major"]] = 0.2
    P[:, idx["gaussian_obst_0_minor"]] = 0.15
    P[:, idx["gaussian_obst_0_risk"]] = 0.05
    P[:, idx["gaussian_obst_0_r"]] = 0.3

    B = 2
    Pb = np.tile(P[None], (B, 1, 1))
    Pb[1, :, idx["goal_y"]] = -0.8
    x0 = np.array([0.0, 0.0, 0.0, 0.5])
    x0b = np.tile(x0[None], (B, 1))
    zb = np.zeros((B, N + 1, ocp.nvar))
    zb[..., ocp.nu:] = x0b[:, None, :]
    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))

    cfg = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10,
                    regularization="gershgorin", track_best=False)
    r_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                  backend="xla")(*args)
    r_fused = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                    backend="fused", interpret=True)(*args)
    assert bool(np.all(np.asarray(r_xla.success)))
    assert bool(np.all(np.asarray(r_fused.success)))
    np.testing.assert_allclose(np.asarray(r_fused.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=1e-4)


@pytest.mark.slow
def test_fused_sqp_kernel_qp_iter_schedule():
    """Inexact-SQP schedule (SQPConfig.qp_iter_schedule) through the fused
    kernel in interpret mode: parity vs the XLA backend running the same
    schedule — the per-phase fori_loops must compose identically."""
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
    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))

    cfg = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10,
                    regularization="gershgorin", track_best=False,
                    qp_iter_schedule=((2, 6), (2, 12)))
    r_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                  backend="xla")(*args)
    r_fused = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                    backend="fused", interpret=True)(*args)
    assert bool(np.all(np.asarray(r_xla.success)))
    assert bool(np.all(np.asarray(r_fused.success)))
    np.testing.assert_allclose(np.asarray(r_fused.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_fused.cost),
                               np.asarray(r_xla.cost), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_periteration_pallas_qp_iter_schedule():
    """The schedule must also work through the per-iteration pallas backend
    (the fused kernel's runtime fallback): interpret-mode parity vs XLA."""
    N = 3
    ocp, P, x0, z_init = goal_tracking_setup(N=N, n_obstacles=1)
    B = 2
    Pb = np.tile(P[None], (B, 1, 1))
    Pb[1, :, ocp.registry.index("goal_y")] = 0.4
    x0b = np.tile(x0[None], (B, 1))
    zb = np.tile(z_init[None], (B, 1, 1))
    args = (jnp.asarray(Pb), jnp.asarray(x0b), jnp.asarray(zb))

    cfg = SQPConfig(n_sqp=4, n_qp_iter=12, mu_min=1e-10,
                    regularization="gershgorin", track_best=False,
                    qp_iter_schedule=((2, 6), (2, 12)))
    r_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                  backend="xla")(*args)
    r_pal = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                  backend="pallas", interpret=True)(*args)
    assert bool(np.all(np.asarray(r_pal.success)))
    np.testing.assert_allclose(np.asarray(r_pal.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=1e-6)
