"""SQP engine parity: BASELINE config 1 (goal-tracking + ellipsoidal obstacles).

The acados reference cannot run here (no casadi/acados in the image), so parity is
checked against an independent optimizer (scipy SLSQP, single-shooting on the SAME
cost/constraint/dynamics functions) - this validates the solver, while module math
is validated separately against hand-computed values (test_modules.py). BASELINE.md
gate: control-sequence error <= 1e-3 at N=20.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.utils import default_settings
from oscar_mpc_planner_mr_modification_tpu.models import SecondOrderUnicycleModel
from oscar_mpc_planner_mr_modification_tpu.modules import (
    ModuleManager, MPCBaseModule, GoalModule, EllipsoidConstraintModule)
from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import make_sqp_solver, SQPConfig


def goal_tracking_setup(N=20, n_obstacles=3):
    settings = default_settings(N=N, max_obstacles=n_obstacles)
    model = SecondOrderUnicycleModel()
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(EllipsoidConstraintModule(settings))
    ocp = build_ocp(model, mm, settings)

    idx = ocp.registry.save_map()
    P = np.zeros((N, ocp.npar))
    P[:, idx["acceleration"]] = 0.34
    P[:, idx["angular_velocity"]] = 0.85
    P[:, idx["goal_weight"]] = 1.0
    P[:, idx["goal_x"]] = 5.0
    P[:, idx["goal_y"]] = 1.5
    P[:, idx["ego_disc_radius"]] = 0.325
    P[:, idx["ego_disc_0_offset"]] = 0.0
    obstacles = [(2.0, 0.4), (3.5, 1.2), (4.5, 0.2)][:n_obstacles]
    for i, (ox, oy) in enumerate(obstacles):
        P[:, idx[f"ellipsoid_obst_{i}_x"]] = ox
        P[:, idx[f"ellipsoid_obst_{i}_y"]] = oy
        P[:, idx[f"ellipsoid_obst_{i}_psi"]] = 0.0
        P[:, idx[f"ellipsoid_obst_{i}_major"]] = 0.0
        P[:, idx[f"ellipsoid_obst_{i}_minor"]] = 0.0
        P[:, idx[f"ellipsoid_obst_{i}_chi"]] = 1.0
        P[:, idx[f"ellipsoid_obst_{i}_r"]] = 0.3

    x0 = np.array([0.0, 0.0, 0.0, 0.5])
    z_init = np.zeros((N + 1, ocp.nvar))
    z_init[:, ocp.nu :] = x0  # initializeWithState-style warmstart
    return ocp, P, x0, z_init


def scipy_single_shooting(ocp, P, x0, N):
    """Independent reference: SLSQP over the control sequence, exact rollout."""
    from scipy.optimize import minimize

    nu, nx = ocp.nu, ocp.nx
    Pj = jnp.asarray(np.concatenate([P, P[-1:]], axis=0))

    def rollout(U):
        def step(x, inp):
            u, p = inp
            xn = ocp.dynamics(x, u, p)
            return xn, xn
        _, X = jax.lax.scan(step, jnp.asarray(x0), (U, Pj[:-1]))
        return jnp.concatenate([jnp.asarray(x0)[None], X], axis=0)  # (N+1, nx)

    def objective(Uf):
        U = Uf.reshape(N, nu)
        X = rollout(U)
        Z = jnp.concatenate([U, X[:-1]], axis=1)
        stage = jax.vmap(ocp.cost_stage)(Z, Pj[:-1])
        return jnp.sum(stage) + ocp.cost_terminal(X[-1], Pj[-1])

    def ineq_all(Uf):
        """All inequality values >= 0: h-lh at k=0..N-1 plus x bounds at 1..N-1."""
        U = Uf.reshape(N, nu)
        X = rollout(U)
        Z = jnp.concatenate([U, X[:-1]], axis=1)
        h = jax.vmap(ocp.ineq)(Z, Pj[:-1])  # (N, nh)
        vals = [ (h - jnp.asarray(ocp.lh)[None, :]).ravel() ]
        xb = X[1:-1]  # stages 1..N-1
        vals.append((xb - jnp.asarray(ocp.lbz)[None, ocp.nu:]).ravel())
        vals.append((jnp.asarray(ocp.ubz)[None, ocp.nu:] - xb).ravel())
        return jnp.concatenate(vals)

    obj_j = jax.jit(objective)
    grad_j = jax.jit(jax.grad(objective))
    ineq_j = jax.jit(ineq_all)
    jac_j = jax.jit(jax.jacrev(ineq_all))

    bounds = [(ocp.lbz[i], ocp.ubz[i]) for i in range(nu)] * N
    res = minimize(
        lambda v: float(obj_j(v)), np.zeros(N * nu),
        jac=lambda v: np.asarray(grad_j(v)),
        method="SLSQP", bounds=bounds,
        constraints=[{"type": "ineq", "fun": lambda v: np.asarray(ineq_j(v)),
                      "jac": lambda v: np.asarray(jac_j(v))}],
        options={"maxiter": 400, "ftol": 1e-12},
    )
    assert res.success, res.message
    return res.x.reshape(N, nu), float(res.fun)


def test_goal_tracking_with_obstacles_matches_independent_solver():
    N = 20
    ocp, P, x0, z_init = goal_tracking_setup(N=N)
    cfg = SQPConfig(n_sqp=25, n_qp_iter=20, mu_min=1e-10)
    solve = make_sqp_solver(ocp, cfg, dtype=jnp.float64)
    result = solve(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))

    assert bool(result.success)
    assert float(result.eq_res) < 1e-8

    U_ref, cost_ref = scipy_single_shooting(ocp, P, x0, N)
    U = np.asarray(result.z[:-1, : ocp.nu])

    # BASELINE gate: control sequence within 1e-3 of the independent solution
    assert np.max(np.abs(U - U_ref)) < 1e-3, (
        f"control error {np.max(np.abs(U - U_ref)):.2e}\n{U[:5]}\nvs\n{U_ref[:5]}")
    assert abs(float(result.cost) - cost_ref) < 1e-5 * max(1.0, abs(cost_ref))


def test_stale_warmstart_cannot_win_best_iterate():
    """Regression: a dynamically-consistent warmstart from the WRONG start point
    must not be returned as the solution. The best-iterate merit has to include
    the initial-condition residual |xinit - x_0| (the acados analog pins
    lbx_0 = ubx_0 = xinit), otherwise hold-mode warmstarts
    (shift_previous_solution_forward: false, the reference default) freeze the
    output forever in closed loop."""
    N = 20
    ocp, P, x0, z_init = goal_tracking_setup(N=N)
    solve = make_sqp_solver(ocp, SQPConfig(n_sqp=10), dtype=jnp.float64)

    # Build a stale-but-feasible warmstart: roll the dynamics from a point 5 m
    # away from xinit with zero inputs -> zero dynamics defect, plausible cost.
    x_stale = np.array([-5.0, -2.0, 0.0, 0.8])
    z_stale = np.zeros((N + 1, ocp.nvar))
    xk = jnp.asarray(x_stale)
    z_stale[0, ocp.nu:] = x_stale
    for k in range(N):
        xk = ocp.dynamics(xk, jnp.zeros(ocp.nu), jnp.asarray(P[k]))
        z_stale[k + 1, ocp.nu:] = np.asarray(xk)

    result = solve(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_stale))
    x_start = np.asarray(result.z)[0, ocp.nu: ocp.nu + 2]
    if bool(result.success):
        # A successful result must start at xinit, not at the stale start
        assert np.linalg.norm(x_start - x0[:2]) < 1e-3, x_start
    else:
        assert float(result.eq_res) > 1e-2  # honest failure reporting


def test_solver_respects_obstacle_constraints():
    N = 20
    ocp, P, x0, z_init = goal_tracking_setup(N=N)
    solve = make_sqp_solver(ocp, SQPConfig(n_sqp=15), dtype=jnp.float64)
    result = solve(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))
    Z = np.asarray(result.z)
    Pj = np.concatenate([P, P[-1:]], axis=0)
    h = np.stack([np.asarray(ocp.ineq(jnp.asarray(Z[k]), jnp.asarray(Pj[k])))
                  for k in range(N)])
    assert h.min() > 1.0 - 1e-6  # ellipsoid constraint lower bound

    # The straight line to the goal passes through obstacles; verify the plan moves
    # and ends near the goal
    assert np.asarray(result.z)[-1, ocp.nu] > 3.0  # made progress in x


def test_infeasible_start_recovers():
    """Start inside an obstacle: the solver should still return finite output and
    report via exit code (graceful degradation, reference braking fallback)."""
    N = 20
    ocp, P, x0, z_init = goal_tracking_setup(N=N)
    P2 = P.copy()
    idx = ocp.registry.save_map()
    P2[:, idx["ellipsoid_obst_0_x"]] = 0.0  # obstacle on top of the robot
    P2[:, idx["ellipsoid_obst_0_y"]] = 0.0
    solve = make_sqp_solver(ocp, SQPConfig(n_sqp=10), dtype=jnp.float64)
    result = solve(jnp.asarray(P2), jnp.asarray(x0), jnp.asarray(z_init))
    assert np.all(np.isfinite(np.asarray(result.z)))
    assert int(result.exit_code) in (0, 1)


def test_fleet_solver_matches_per_instance():
    """Fleet (batched) solver with the XLA backend reproduces the per-instance
    solver; gershgorin regularization converges to the same solution as mirror."""
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import make_fleet_sqp_solver

    N = 20
    ocp, P, x0, z_init = goal_tracking_setup(N=N)
    cfg = SQPConfig(n_sqp=20, n_qp_iter=18, mu_min=1e-9)
    single = make_sqp_solver(ocp, cfg, dtype=jnp.float64)
    ref = single(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))

    Bt = 3
    fleet = make_fleet_sqp_solver(
        ocp, SQPConfig(n_sqp=20, n_qp_iter=18, mu_min=1e-9,
                       regularization="gershgorin"),
        dtype=jnp.float64, backend="xla")
    out = fleet(jnp.asarray(np.tile(P[None], (Bt, 1, 1))),
                jnp.asarray(np.tile(x0[None], (Bt, 1))),
                jnp.asarray(np.tile(z_init[None], (Bt, 1, 1))))
    assert bool(out.success.all())
    for b in range(Bt):
        np.testing.assert_allclose(np.asarray(out.z[b, :-1, :2]),
                                   np.asarray(ref.z[:-1, :2]), atol=1e-4)


def test_track_best_false_is_fixed_step_semantics():
    """track_best=False (acados FIXED_STEP exactly: return the LAST iterate,
    no best-merit selection) converges to the same solution as the tracked
    variant on a well-behaved problem, for both the single-instance and the
    fleet solver. This is the bench operating point (the merit re-rollout
    costs ~30 ms per 512-plan step on hardware)."""
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import make_fleet_sqp_solver

    N = 12
    ocp, P, x0, z_init = goal_tracking_setup(N=N)
    cfg = SQPConfig(n_sqp=12, n_qp_iter=15, mu_min=1e-9)
    ref = make_sqp_solver(ocp, cfg, dtype=jnp.float64)(
        jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))
    fast = make_sqp_solver(ocp, cfg._replace(track_best=False),
                           dtype=jnp.float64)(
        jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))
    assert bool(ref.success) and bool(fast.success)
    np.testing.assert_allclose(np.asarray(fast.z), np.asarray(ref.z),
                               atol=1e-6)

    Bt = 2
    fleet = make_fleet_sqp_solver(
        ocp, cfg._replace(track_best=False, regularization="gershgorin"),
        dtype=jnp.float64, backend="xla")
    out = fleet(jnp.asarray(np.tile(P[None], (Bt, 1, 1))),
                jnp.asarray(np.tile(x0[None], (Bt, 1))),
                jnp.asarray(np.tile(z_init[None], (Bt, 1, 1))))
    assert bool(out.success.all())
    np.testing.assert_allclose(np.asarray(out.z[0, :-1, :2]),
                               np.asarray(ref.z[:-1, :2]), atol=1e-4)


def test_best_iterate_tracking_recovers_cold_start_failures():
    """Full-step SQP cycles on hard cold-start instances; best-iterate merit
    tracking must recover them at the SAME iteration budget (measured on the
    CC-MPC random-scene set: 0.898 -> 1.000 success at 10x8 f32). This pins
    the robustness property the track_best knob exists for."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    import bench_matrix as bm

    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        make_fleet_sqp_solver)

    rng = np.random.default_rng(0)
    ocp, P, x0, z0 = bm.build_ccmpc(14, 48, rng)
    args = (jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z0))
    base = SQPConfig(n_sqp=10, n_qp_iter=8, mu_min=1e-6, w_max=1e6,
                     reg_eps=1e-4, regularization="gershgorin")
    r_fixed = make_fleet_sqp_solver(
        ocp, base._replace(track_best=False), dtype=jnp.float32,
        backend="xla")(*args)
    r_track = make_fleet_sqp_solver(
        ocp, base, dtype=jnp.float32, backend="xla")(*args)
    ok_fixed = np.asarray(r_fixed.success)
    ok_track = np.asarray(r_track.success)
    # Tracking never loses an instance the fixed-step path solves...
    assert not np.any(ok_fixed & ~ok_track)
    # ...and solves this whole benign-random set
    assert ok_track.all(), f"tracking success {ok_track.mean():.3f}"


def contouring_setup(N=15, n_obstacles=2):
    """BASELINE config-2 flavor: MPCC contouring + ellipsoidal obstacles on a
    straight reference spline."""
    from oscar_mpc_planner_mr_modification_tpu.factory import configuration_basic
    from oscar_mpc_planner_mr_modification_tpu.models import (
        ContouringSecondOrderUnicycleModel)

    settings = default_settings(N=N, max_obstacles=n_obstacles)
    model, mm = configuration_basic(settings)
    ocp = build_ocp(model, mm, settings)
    idx = ocp.registry.save_map()
    P = np.zeros((N, ocp.npar))
    w = settings["weights"]
    for name in ("acceleration", "angular_velocity", "velocity",
                 "reference_velocity", "contour", "lag", "terminal_angle",
                 "terminal_contouring"):
        P[:, idx[name]] = w[name]
    for i in range(settings["contouring"]["num_segments"]):
        P[:, idx[f"spline_x{i}_c"]] = 1.0  # straight path x(s)=s
        P[:, idx[f"spline{i}_start"]] = 5.0 * i
    P[:, idx["ego_disc_radius"]] = 0.325
    for i, (ox, oy) in enumerate([(2.5, 0.3), (4.5, -0.4)][:n_obstacles]):
        P[:, idx[f"ellipsoid_obst_{i}_x"]] = ox
        P[:, idx[f"ellipsoid_obst_{i}_y"]] = oy
        P[:, idx[f"ellipsoid_obst_{i}_chi"]] = 1.0
        P[:, idx[f"ellipsoid_obst_{i}_r"]] = 0.3
    x0 = np.array([0.0, 0.0, 0.0, 1.0, 0.0])
    z_init = np.zeros((N + 1, ocp.nvar))
    z_init[:, ocp.nu:] = x0
    return ocp, P, x0, z_init


def test_contouring_config_matches_independent_solver():
    N = 15
    ocp, P, x0, z_init = contouring_setup(N=N)
    solve = make_sqp_solver(ocp, SQPConfig(n_sqp=30, n_qp_iter=20,
                                           mu_min=1e-10), dtype=jnp.float64)
    result = solve(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))
    assert bool(result.success)

    U_ref, cost_ref = scipy_single_shooting(ocp, P, x0, N)
    U = np.asarray(result.z[:-1, : ocp.nu])
    assert np.max(np.abs(U - U_ref)) < 1e-3, (
        f"control error {np.max(np.abs(U - U_ref)):.2e}")
    assert abs(float(result.cost) - cost_ref) < 1e-4 * max(1.0, abs(cost_ref))


def test_bicycle_configuration_solves():
    """nu=3 (bicycle/Prius) path: exercises the 3x3 SPD solves and the
    slack-input plumbing end to end."""
    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_bicycle)

    N = 15
    settings = default_settings(N=N, max_obstacles=2)
    model, mm = configuration_bicycle(settings)
    ocp = build_ocp(model, mm, settings)
    assert ocp.nu == 3 and ocp.nx == 6

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
    solve = make_sqp_solver(ocp, SQPConfig(n_sqp=15, n_qp_iter=15),
                            dtype=jnp.float64)
    result = solve(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z_init))
    assert bool(result.success), float(result.eq_res)
    Z = np.asarray(result.z)
    # Moves forward, steering within bounds, obstacles avoided
    assert Z[-1, ocp.nu] > 5.0
    assert np.all(np.abs(Z[:-1, ocp.nu + 4]) <= 0.55 + 1e-6)  # delta bounds
    Pj = np.concatenate([P, P[-1:]], axis=0)
    for k in range(1, N):
        h = np.asarray(ocp.ineq(jnp.asarray(Z[k]), jnp.asarray(Pj[k])))
        assert h.min() > 1.0 - 1e-6


def test_buffered_packed_solve_roundtrip():
    """make_buffered_packed_solve (one upload + one packed readback per tick)
    returns bit-identical results to the plain batched solve."""
    import jax

    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        make_buffered_packed_solve, make_sqp_solver, unpack_results)

    N = 6
    ocp, P, x0, z_init = goal_tracking_setup(N=N, n_obstacles=1)
    cfg = SQPConfig(n_sqp=3, n_qp_iter=8, mu_min=1e-10)
    raw = make_sqp_solver(ocp, cfg, dtype=jnp.float64)
    batched = jax.vmap(raw, in_axes=(0, None, 0))

    Pn = 3
    Pb = np.tile(P[None], (Pn, 1, 1))
    Pb[1, :, ocp.registry.index("goal_y")] = -1.0
    zb = np.tile(z_init[None], (Pn, 1, 1))

    ref = batched(jnp.asarray(Pb), jnp.asarray(x0), jnp.asarray(zb))
    solve = make_buffered_packed_solve(
        batched, Pn, N, ocp.npar, ocp.nx, ocp.nvar, jnp.float64)
    out = unpack_results(solve(Pb, x0, zb), N + 1, ocp.nvar)
    np.testing.assert_array_equal(out.z, np.asarray(ref.z))
    np.testing.assert_array_equal(out.cost, np.asarray(ref.cost))
    np.testing.assert_array_equal(out.success, np.asarray(ref.success))
    np.testing.assert_array_equal(out.exit_code, np.asarray(ref.exit_code))


def test_qp_iter_schedule_matches_chained_uniform_solves():
    """An inexact-SQP schedule ((n1, q1), (n2, q2)) must equal running a
    uniform (n1, q1) solve and feeding its iterate into a uniform (n2, q2)
    solve: the SQP iteration is Markov in z with track_best off and no dual
    warm starts, so the schedule is pure control flow, not new math."""
    ocp, P, x0, z_init = goal_tracking_setup(N=10, n_obstacles=2)
    kw = dict(mu_min=1e-9, w_max=1e14, track_best=False)
    sched = make_sqp_solver(
        ocp, SQPConfig(qp_iter_schedule=((3, 5), (3, 9)), **kw),
        dtype=jnp.float64)
    s1 = make_sqp_solver(ocp, SQPConfig(n_sqp=3, n_qp_iter=5, **kw),
                         dtype=jnp.float64)
    s2 = make_sqp_solver(ocp, SQPConfig(n_sqp=3, n_qp_iter=9, **kw),
                         dtype=jnp.float64)

    res_sched = sched(P, x0, z_init)
    res_chain = s2(P, x0, np.asarray(s1(P, x0, z_init).z))
    np.testing.assert_allclose(np.asarray(res_sched.z),
                               np.asarray(res_chain.z), atol=1e-12)
    assert bool(res_sched.success)


def test_scale_iterations_drops_loose_phases_first():
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import scale_iterations

    cfg = SQPConfig(n_sqp=8, n_qp_iter=8, qp_iter_schedule=((4, 4), (4, 8)))
    assert scale_iterations(cfg, 6).qp_iter_schedule == ((2, 4), (4, 8))
    assert scale_iterations(cfg, 4).qp_iter_schedule == ((4, 8),)
    assert scale_iterations(cfg, 2).qp_iter_schedule == ((2, 8),)
    # n above the schedule total: schedule unchanged (it IS the full count)
    assert scale_iterations(cfg, 12).qp_iter_schedule == ((4, 4), (4, 8))
    # plain configs: n_sqp replacement only
    plain = SQPConfig(n_sqp=10, n_qp_iter=8)
    assert scale_iterations(plain, 5) == plain._replace(n_sqp=5)
