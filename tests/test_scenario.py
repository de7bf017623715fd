"""SH-MPC scenario optimization + decomp free-space + CA-MPC tests
(BASELINE configs 2/5 coverage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.factory import (
    build_planner, configuration_safe_horizon)
from oscar_mpc_planner_mr_modification_tpu.ops.decomp import EllipsoidDecomp2D
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    define_robot_area, ensure_obstacle_size, get_constant_velocity_prediction)
from oscar_mpc_planner_mr_modification_tpu.solver import State
from oscar_mpc_planner_mr_modification_tpu.types import (DynamicObstacle,
                                                         RealTimeData)
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings


# ---------------------------------------------------------------------------
# SH-MPC (scenario constraints, parallel solvers)
# ---------------------------------------------------------------------------
def make_sh_planner(N=15):
    settings = default_settings(
        N=N, max_obstacles=2,
        probabilistic={"enable": True, "risk": 0.1},
        scenario_constraints={"parallel_solvers": 4, "n_samples": 32})
    model, modules = configuration_safe_horizon(settings)
    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=6, n_qp_iter=12))
    return planner, model, settings


def make_sh_data(settings, state, N, dt):
    data = RealTimeData()
    n_discs = settings["n_discs"]
    data.robot_area = define_robot_area(0.65 * n_discs, 0.65, n_discs)
    path_x = np.linspace(0.0, 20.0, 25)
    data.reference_path.x = list(path_x)
    data.reference_path.y = [0.0] * 25
    obstacles = []
    for i, pos in enumerate([np.array([4.0, 0.8]), np.array([6.0, -0.8])]):
        obs = DynamicObstacle(index=i, position=pos, radius=0.3)
        obs.prediction = get_constant_velocity_prediction(
            pos, np.array([-0.3, 0.0]), dt, N, probabilistic=True)
        obstacles.append(obs)
    data.dynamic_obstacles = ensure_obstacle_size(
        obstacles, state, settings["max_obstacles"], N, dt, probabilistic=True)
    return data


def test_scenario_optimizer_solves_and_selects():
    N, dt = 15, 0.2
    planner, model, settings = make_sh_planner(N=N)
    state = State(model)
    state.set("v", 0.8)
    data = make_sh_data(settings, state, N, dt)
    planner.on_data_received(data, "reference_path")
    planner.on_data_received(data, "dynamic obstacles")  # triggers sampling
    out = planner.solve_mpc(state, data)
    assert out.success, planner.solver.explain_exit_flag()

    from oscar_mpc_planner_mr_modification_tpu.modules import (
        ScenarioConstraintModule)

    smod = next(m for m in planner.modules
                if isinstance(m, ScenarioConstraintModule))
    assert smod._optimizer.best_solver_index >= 0
    # Slack state stays small on a feasible problem
    islack = model.state_index("slack")
    slack_vals = [planner.solver.get_output(k, "slack") for k in range(1, N)]
    assert max(slack_vals) < 1.0


def test_scenario_closed_loop_avoids():
    N, dt = 15, 0.2
    planner, model, settings = make_sh_planner(N=N)
    state = State(model)
    state.set("v", 0.8)
    obstacles_pos = [np.array([4.0, 0.4]), np.array([7.0, -0.5])]
    min_dist = np.inf
    n_ok = 0
    for step in range(25):
        data = RealTimeData()
        data.robot_area = define_robot_area(0.65, 0.65, 1)
        data.reference_path.x = list(np.linspace(0.0, 20.0, 25))
        data.reference_path.y = [0.0] * 25
        obstacles = []
        for i, pos in enumerate(obstacles_pos):
            obs = DynamicObstacle(index=i, position=pos.copy(), radius=0.3)
            obs.prediction = get_constant_velocity_prediction(
                pos, np.zeros(2), dt, N, probabilistic=True)
            obstacles.append(obs)
        data.dynamic_obstacles = ensure_obstacle_size(
            obstacles, state, settings["max_obstacles"], N, dt,
            probabilistic=True)
        if step == 0:
            planner.on_data_received(data, "reference_path")
        planner.on_data_received(data, "dynamic obstacles")
        out = planner.solve_mpc(state, data)
        if out.success:
            n_ok += 1
            a, w = planner.get_solution(0, "a"), planner.get_solution(0, "w")
        else:
            a, w = -3.0, 0.0
        u = np.zeros(model.nu)
        u[0], u[1] = a, w
        x = np.array(model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray(u), dt))
        x[model.state_index("v")] = max(x[model.state_index("v")], 0.0)
        state.set_array(x)
        for pos in obstacles_pos:
            min_dist = min(min_dist,
                           np.linalg.norm(state.get_position() - pos))
    assert n_ok >= 18, f"solved only {n_ok}/25"
    assert state.get("x") > 3.0
    assert min_dist > 0.6, f"too close: {min_dist:.2f}"


# ---------------------------------------------------------------------------
# Decomp (static free-space polytopes)
# ---------------------------------------------------------------------------
def test_decomp_polytope_separates_obstacles():
    decomp = EllipsoidDecomp2D(local_range=3.0, max_constraints=8)
    obstacles = np.array([[2.0, 1.0], [2.0, -1.0], [3.0, 0.8], [1.0, -0.9]])
    p1, p2 = np.array([0.0, 0.0]), np.array([4.0, 0.0])
    halfspaces = decomp.dilate_segment(p1, p2, obstacles)
    assert len(halfspaces) >= 1
    # The segment endpoints satisfy all halfspaces; obstacle points violate
    # at least one each
    for a, b in halfspaces:
        assert a @ p1 <= b + 1e-9
        assert a @ p2 <= b + 1e-9
    for obs in obstacles:
        assert any(a @ obs > b - 1e-9 for a, b in halfspaces), obs


def test_decomp_path_dilation():
    decomp = EllipsoidDecomp2D(local_range=2.0, max_constraints=6)
    path = np.stack([np.linspace(0, 5, 11), np.zeros(11)], axis=1)
    obstacles = np.array([[2.5, 0.6], [2.5, -0.6]])
    polys = decomp.dilate_path(path, obstacles)
    assert len(polys) == 11
    assert all(len(p) >= 1 for p in polys[1:])


# ---------------------------------------------------------------------------
# CA-MPC (curvature-aware contouring)
# ---------------------------------------------------------------------------
def test_curvature_aware_cost_and_dynamics():
    from oscar_mpc_planner_mr_modification_tpu.models import (
        ContouringSecondOrderUnicycleModelCurvatureAware)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        CurvatureAwareContouringModule, ModuleManager)
    from oscar_mpc_planner_mr_modification_tpu.utils import ParameterRegistry

    settings = default_settings()
    model = ContouringSecondOrderUnicycleModelCurvatureAware()
    mm = ModuleManager()
    mm.add_module(CurvatureAwareContouringModule(settings))
    reg = ParameterRegistry()
    mm.define_parameters(reg)

    p = np.zeros(reg.npar)
    p[reg.index("contour")] = 0.1
    p[reg.index("velocity")] = 0.5
    p[reg.index("reference_velocity")] = 2.0
    for i in range(5):  # straight path x(s)=s
        p[reg.index(f"spline_x{i}_c")] = 1.0
        p[reg.index(f"spline{i}_start")] = 5.0 * i

    # On-path, aligned, at reference speed: cost ~ 0
    z = np.array([0.0, 0.0, 2.0, 0.0, 0.0, 2.0, 2.0])
    cost = float(mm.objective(model, jnp.asarray(z), reg.view(jnp.asarray(p)),
                              settings, 1))
    assert abs(cost) < 1e-9
    # Off-path: contour cost = w * dist^2
    z2 = z.copy()
    z2[3] = 0.5
    cost2 = float(mm.objective(model, jnp.asarray(z2), reg.view(jnp.asarray(p)),
                               settings, 1))
    assert abs(cost2 - 0.1 * 0.25) < 1e-6

    # CA discrete dynamics: spline state advances by projected progress
    ctx = {"params": reg.view(jnp.asarray(p)), "num_segments": 5}
    x0 = jnp.asarray([0.0, 0.0, 0.0, 2.0, 1.0])
    xn = np.asarray(model.discrete_dynamics(x0, jnp.zeros(2), 0.2, ctx=ctx))
    assert abs(xn[0] - 0.4) < 1e-9  # x advances v*dt
    assert abs(xn[4] - 1.4) < 1e-6  # straight path: s_dot = v


def test_decomp_constraints_with_costmap_end_to_end():
    """rosnavigation-style flow: occupancy points -> EllipsoidDecomp2D ->
    per-stage halfspace parameters -> solve stays inside the free corridor."""
    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_no_obstacles)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        DecompConstraintModule)
    from oscar_mpc_planner_mr_modification_tpu.planner import Planner
    from oscar_mpc_planner_mr_modification_tpu.solver import (State, Solver,
                                                              build_ocp)

    N, dt = 12, 0.2
    settings = default_settings(N=N, max_obstacles=2)
    model, mm = configuration_no_obstacles(settings)
    mm.add_module(DecompConstraintModule(settings))
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=8, n_qp_iter=12))
    planner = Planner(solver, mm, settings)

    data = RealTimeData()
    data.robot_area = define_robot_area(0.65, 0.65, 1)
    data.reference_path.x = list(np.linspace(0, 15, 16))
    data.reference_path.y = [0.0] * 16
    # Occupied cells: two walls forming a corridor of half-width 1.0
    xs = np.linspace(0, 8, 33)
    wall = np.concatenate([
        np.stack([xs, np.full_like(xs, 1.0)], axis=1),
        np.stack([xs, np.full_like(xs, -1.0)], axis=1)])
    data.costmap = wall
    planner.on_data_received(data, "reference_path")

    state = State(model)
    state.set("v", 1.0)
    out = planner.solve_mpc(state, data)
    assert out.success

    dmod = next(m for m in mm if isinstance(m, DecompConstraintModule))
    # Decomp produced non-dummy halfspaces
    assert dmod._b is not None and np.any(dmod._b[0, 1:] < 999.0)
    # The plan stays within the corridor (plus robot radius margin inside)
    traj = np.asarray(out.trajectory.positions)
    assert np.all(np.abs(traj[:, 1]) < 1.0)
    assert traj[-1, 0] > 1.5  # still makes progress down the corridor


# ---------------------------------------------------------------------------
# Scenario-optimization machinery (sample-size calibration, support selection,
# empirical risk) - the external scenario_module's role
# (scenario_constraints.cpp:85,110-130)
# ---------------------------------------------------------------------------
def test_scenario_calibration_bounds():
    from oscar_mpc_planner_mr_modification_tpu.parallel.scenario import (
        posterior_epsilon, scenario_sample_size)

    # Closed-form check at k=0: eps = 1 - (beta/S)^(1/S)
    S = 100
    assert posterior_epsilon(S, 0, 0.01) == pytest.approx(
        1.0 - (0.01 / S) ** (1.0 / S), rel=1e-12)
    # Monotone: more samples -> lower risk; more support -> higher risk
    assert posterior_epsilon(200, 5, 0.01) < posterior_epsilon(100, 5, 0.01)
    assert posterior_epsilon(200, 10, 0.01) > posterior_epsilon(200, 5, 0.01)
    # Degenerate: support = sample count gives no generalization
    assert posterior_epsilon(50, 50, 0.01) == 1.0

    # The returned S is minimal for the requested (eps, beta, support)
    for d in (1, 5, 10):
        S = scenario_sample_size(0.1, 0.01, d)
        assert posterior_epsilon(S, d, 0.01) <= 0.1
        assert posterior_epsilon(S - 1, d, 0.01) > 0.1


def test_support_selection_prunes_dominated_discs():
    from oscar_mpc_planner_mr_modification_tpu.parallel.scenario import (
        select_support_halfspaces)

    pos = np.zeros(2)
    # A line of discs behind one another: the nearest halfspace excludes all
    centers = np.array([[2.0, 0.0], [3.0, 0.0], [4.5, 0.0], [6.0, 0.0]])
    margins = np.full(4, 0.4)
    a, b, sel, n_unc = select_support_halfspaces(pos, centers, margins, 24)
    assert len(b) == 1 and sel[0] == 0 and n_unc == 0
    # The surviving constraint is the nearest disc's tangent halfspace
    np.testing.assert_allclose(a[0], [1.0, 0.0], atol=1e-12)
    assert b[0] == pytest.approx(2.0 - 0.4)

    # Two clusters -> one facet each
    centers2 = np.vstack([centers, -centers + [[0.0, 1.0]] * 4])
    margins2 = np.full(8, 0.4)
    a2, b2, sel2, n_unc2 = select_support_halfspaces(pos, centers2, margins2, 24)
    assert len(b2) == 2 and n_unc2 == 0


def test_under_coverage_is_detected_not_silent():
    """A ring of mutually non-dominated scenario discs larger than the row
    budget must be REPORTED as under-coverage - the round-1 closest-24
    heuristic dropped the remainder silently."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.scenario import (
        select_support_halfspaces)

    pos = np.zeros(2)
    n = 60
    ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    centers = 3.0 * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    margins = np.full(n, 0.05)  # tiny discs: nothing dominates anything
    a, b, sel, n_unc = select_support_halfspaces(pos, centers, margins, 24)
    assert len(b) == 24
    assert n_unc > 0, "under-coverage went undetected"
    # With a sufficient row budget everything is covered
    _, _, _, n_unc_all = select_support_halfspaces(pos, centers, margins, n)
    assert n_unc_all == 0


def test_scenario_empirical_risk_within_certificate():
    """Monte-Carlo validation of the SH-MPC guarantee: solve with a calibrated
    sample count, then measure the collision probability of the returned
    trajectory against FRESH scenario draws; it must not exceed the risk bound
    (epsilon + MC noise)."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.scenario import (
        scenario_sample_size)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        ScenarioConstraintModule)

    N, dt = 15, 0.2
    eps, beta, max_support = 0.2, 0.05, 10
    S = scenario_sample_size(eps, beta, max_support)
    settings = default_settings(
        N=N, max_obstacles=2,
        probabilistic={"enable": True, "risk": eps},
        scenario_constraints={"parallel_solvers": 4, "n_samples": 0,
                              "confidence": beta, "max_support": max_support})
    model, modules = configuration_safe_horizon(settings)
    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=8, n_qp_iter=15))
    smod = next(m for m in planner.modules
                if isinstance(m, ScenarioConstraintModule))
    opt = smod._optimizer
    assert opt.n_samples == S  # calibrated, not hard-coded

    state = State(model)
    state.set("v", 0.8)
    data = make_sh_data(settings, state, N, dt)
    planner.on_data_received(data, "reference_path")
    planner.on_data_received(data, "dynamic obstacles")
    out = planner.solve_mpc(state, data)
    assert out.success, planner.solver.explain_exit_flag()
    assert opt.last_uncovered == 0, (
        f"{opt.last_uncovered} scenarios dropped - guarantee void")
    assert opt.last_certificate <= eps + 1e-9, (
        f"posterior certificate {opt.last_certificate:.3f} > eps")

    # Planned positions (stage k constrained against prediction step k-1)
    plan = np.array([[planner.solver.get_output(k, "x"),
                      planner.solver.get_output(k, "y")]
                     for k in range(1, N)])
    slack = max(planner.solver.get_output(k, "slack") for k in range(1, N))
    assert slack < 1e-3, f"slack active ({slack:.3f}): soft violation"

    # Fresh MC draws through the same integrated-noise sampler
    M = 4000
    opt2 = type(opt)(planner.solver, settings, seed=1234)
    opt2.n_solvers, opt2.n_samples = 1, M
    opt2.sample_scenarios(data)
    fresh = opt2._samples[0]  # (M, n_obs, N, 2)
    margins = opt2._sample_radii + opt2.robot_radius  # (n_obs,)
    d = np.linalg.norm(fresh[:, :, : N - 1] - plan[None, None], axis=-1)
    violated = np.any(d < margins[None, :, None], axis=(1, 2))  # (M,)
    rate = float(np.mean(violated))
    mc_noise = 3.0 * np.sqrt(eps * (1 - eps) / M)
    assert rate <= eps + mc_noise, (
        f"empirical violation {rate:.3f} > eps {eps} + {mc_noise:.3f}")


def test_support_selection_batch_matches_scalar():
    """select_support_halfspaces_batch is the vectorized twin of the scalar
    greedy selection (same halfspaces, same under-coverage counts)."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.scenario import (
        select_support_halfspaces, select_support_halfspaces_batch)

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(6, 2))
    centers = rng.normal(scale=3.0, size=(6, 40, 2))
    margins = rng.uniform(0.1, 0.6, size=40)
    a, b, valid, n_unc = select_support_halfspaces_batch(
        pos, centers, margins, 8)
    assert a.shape == (6, 8, 2) and b.shape == (6, 8)
    for c in range(6):
        a_s, b_s, _, n_unc_s = select_support_halfspaces(
            pos[c], centers[c], margins, 8)
        n = len(b_s)
        assert valid[c, :n].all() and not valid[c, n:].any()
        np.testing.assert_allclose(a[c, :n], a_s, atol=1e-12)
        np.testing.assert_allclose(b[c, :n], b_s, atol=1e-12)
        assert (b[c, n:] == 1.0e4).all()
        assert int(n_unc[c]) == n_unc_s


def test_scenario_two_disc_end_to_end():
    """n_discs=2 SH-MPC: per-disc polytopes with LINEAR parameter scaling.

    The reference's own LinearConstraints re-loops its disc-scaled row count
    per disc (scripts/scenario_constraints.py:33-47: quadratic parameters,
    bound count mismatching emitted rows at n_discs > 1) — it only ever ships
    n_discs = 1. This build fixes the accounting; both discs' halfspace rows
    are filled and the solve succeeds."""
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        ScenarioConstraintModule)

    N, dt = 12, 0.2
    settings = default_settings(
        N=N, max_obstacles=2, n_discs=2,
        probabilistic={"enable": True, "risk": 0.1},
        scenario_constraints={"parallel_solvers": 2, "n_samples": 16})
    model, modules = configuration_safe_horizon(settings)
    smod = next(m for m in modules if isinstance(m, ScenarioConstraintModule))
    assert smod.nh == 48  # 24 per disc
    assert len(smod.get_upper_bound()) == 48

    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=6, n_qp_iter=12))
    reg = planner.solver.ocp.registry
    assert reg.has_parameter("disc_1_scenario_constraint_23_b")
    # Per-disc count is 24, not 24*n_discs (the reference's quadratic blowup)
    assert not reg.has_parameter("disc_0_scenario_constraint_24_a1")

    state = State(model)
    state.set("v", 0.8)
    data = make_sh_data(settings, state, N, dt)
    planner.on_data_received(data, "reference_path")
    planner.on_data_received(data, "dynamic obstacles")
    out = planner.solve_mpc(state, data)
    assert out.success, planner.solver.explain_exit_flag()

    # Both discs received real (non-dummy) halfspaces at interior stages
    opt = smod._optimizer
    assert opt.best_solver_index >= 0
    pdata = planner.solver.params.data
    for d in range(2):
        filled = pdata[1:N, opt._b_idx[d]] < 0.9e4
        assert filled.any(), f"disc {d} got no scenario halfspaces"
    # Disc offsets differ (two-disc robot): constraints are disc-specific
    offs = pdata[0, opt._off_idx]
    assert abs(offs[0] - offs[1]) > 1e-6


def test_scenario_budget_adaptive_iterations():
    """The SH-MPC parallel optimize adapts its iteration count to the
    remaining tick budget through the solver's precompiled n_sqp ladder —
    the reference sets solver_timeout per parallel scenario solver
    (scenario_constraints.cpp:58-108; budget from planner.cpp:168-169)."""
    import time

    N, dt = 15, 0.2
    planner, model, settings = make_sh_planner(N=N)
    solver = planner.solver
    state = State(model)
    state.set("v", 0.8)
    data = make_sh_data(settings, state, N, dt)
    planner.on_data_received(data, "reference_path")
    planner.on_data_received(data, "dynamic obstacles")

    # Normal tick (no budget stamp): full count through the scenario path
    out = planner.solve_mpc(state, data)
    assert out.success
    assert solver.last_iterations_run == 6

    # Late-started tick: only ~12 ms of the 50 ms budget remains -> reduced
    # ladder variant, still a usable command
    planner.on_data_received(data, "dynamic obstacles")  # fresh samples
    solver._iter_time_ema = 0.004
    data.planning_start_time = time.monotonic() - 0.038
    out = planner.solve_mpc(state, data)
    assert out.success
    assert solver.last_iterations_run < 6
