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
    data.robot_area = define_robot_area(0.65, 0.65, 1)
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
