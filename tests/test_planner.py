"""Closed-loop planner test: the minimum end-to-end slice (SURVEY §7.3).

Goal-tracking Jackal with ellipsoidal obstacles in a toy 20 Hz simulation loop:
Planner.solve_mpc orchestration (warmstart policies, module updates, parameter
fill, solve, output extraction), obstacle data preparation, and goal reaching.
"""

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.utils import default_settings
from oscar_mpc_planner_mr_modification_tpu.models import SecondOrderUnicycleModel
from oscar_mpc_planner_mr_modification_tpu.modules import (
    ModuleManager, MPCBaseModule, GoalModule, EllipsoidConstraintModule)
from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp, Solver, State
from oscar_mpc_planner_mr_modification_tpu.planner import Planner
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    define_robot_area, ensure_obstacle_size, get_constant_velocity_prediction)
from oscar_mpc_planner_mr_modification_tpu.types import (
    RealTimeData, DynamicObstacle)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig


def make_planner(N=20, max_obstacles=3):
    # goal weight raised: the reference's normalized goal cost (goal_module.py:34)
    # is weak for a 5 m goal; 5.0 gives a crisp approach within the test horizon
    settings = default_settings(N=N, max_obstacles=max_obstacles,
                                weights={"goal": 5.0})
    model = SecondOrderUnicycleModel()
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(EllipsoidConstraintModule(settings))
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=8, n_qp_iter=15))
    planner = Planner(solver, mm, settings)
    return planner, model, settings


def make_data(settings, state, obstacle_specs, N, dt):
    data = RealTimeData()
    data.robot_area = define_robot_area(
        settings["robot"]["length"], settings["robot"]["width"],
        settings["n_discs"])
    data.goal = np.array([5.0, 0.5])
    data.goal_received = True
    obstacles = []
    for i, (pos, vel) in enumerate(obstacle_specs):
        obs = DynamicObstacle(index=i, position=np.asarray(pos, dtype=float),
                              radius=0.3)
        obs.prediction = get_constant_velocity_prediction(pos, vel, dt, N)
        obstacles.append(obs)
    data.dynamic_obstacles = ensure_obstacle_size(
        obstacles, state, settings["max_obstacles"], N, dt)
    return data


def test_data_ready_gate():
    planner, model, settings = make_planner()
    state = State(model)
    state.set("v", 0.1)
    data = RealTimeData()  # no goal, no obstacles
    out = planner.solve_mpc(state, data)
    assert not out.success


def test_closed_loop_reaches_goal():
    N, dt = 20, 0.2
    planner, model, settings = make_planner(N=N)
    state = State(model)
    state.set("x", 0.0)
    state.set("v", 0.3)

    obstacle_specs = [(np.array([2.5, 0.1]), np.zeros(2))]
    reached = False
    n_success = 0
    for step in range(60):
        data = make_data(settings, state, obstacle_specs, N, dt)
        out = planner.solve_mpc(state, data)
        if out.success:
            n_success += 1
            a = planner.get_solution(0, "a")
            w = planner.get_solution(0, "w")
        else:
            a, w = -settings["deceleration_at_infeasible"], 0.0
        # Simulate the robot with the model dynamics
        x = jnp.asarray(state.as_array())
        u = jnp.asarray([a, w])
        x_next = model.discrete_dynamics(x, u, dt)
        state.set_array(np.asarray(x_next))
        if np.linalg.norm(state.get_position() - data.goal) < 0.4:
            reached = True
            break

    assert n_success > 10, "planner should solve most cycles"
    assert reached, f"did not reach goal; final state {state}"
    # Check the robot avoided the obstacle throughout (static obstacle)
    # (closed-loop check happens implicitly: crash would keep distance ~0)


def test_closed_loop_avoids_obstacle():
    N, dt = 20, 0.2
    planner, model, settings = make_planner(N=N)
    state = State(model)
    state.set("v", 0.5)
    # Obstacle directly on the straight-line path to the goal
    obstacle_specs = [(np.array([2.5, 0.25]), np.zeros(2))]
    min_dist = np.inf
    for step in range(60):
        data = make_data(settings, state, obstacle_specs, N, dt)
        out = planner.solve_mpc(state, data)
        a = planner.get_solution(0, "a") if out.success else -3.0
        w = planner.get_solution(0, "w") if out.success else 0.0
        x_next = model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt)
        state.set_array(np.asarray(x_next))
        min_dist = min(min_dist,
                       np.linalg.norm(state.get_position() - obstacle_specs[0][0]))
        if np.linalg.norm(state.get_position() - data.goal) < 0.4:
            break
    # combined radius = 0.3 (obstacle) + 0.325 (robot); some margin
    assert min_dist > 0.55, f"got too close: {min_dist:.3f} m"


def test_braking_warmstart_after_failure():
    planner, model, settings = make_planner()
    state = State(model)
    state.set("x", 1.0)
    state.set("v", 1.5)
    # First cycle fails (no data) -> next cycle uses braking init
    planner.output.success = False
    planner.solver.initialize_with_braking(state)
    v_vals = [planner.solver.get_ego_prediction(k, "v") for k in range(21)]
    assert v_vals[0] == 1.5
    assert all(v_vals[i + 1] <= v_vals[i] + 1e-12 for i in range(20))
    assert v_vals[-1] == 0.0  # fully braked
    x_vals = [planner.solver.get_ego_prediction(k, "x") for k in range(21)]
    assert x_vals[-1] > 1.0  # moved forward while braking


def test_solver_clone_independent():
    planner, model, settings = make_planner()
    s1 = planner.solver
    s1.params.set("goal_x", 3.0)
    s2 = s1.clone()
    s2.params.set("goal_x", 7.0)
    assert s1.get_parameter(0, "goal_x") == 3.0
    assert s2.get_parameter(0, "goal_x") == 7.0


def test_ensure_obstacle_size_pads_and_prunes():
    settings = default_settings(max_obstacles=2)
    model = SecondOrderUnicycleModel()
    state = State(model)
    state.set("v", 1.0)
    # Too many obstacles: keeps the 2 closest over the horizon
    specs = [([10.0, 10.0], [0.0, 0.0]), ([1.0, 0.0], [0.0, 0.0]),
             ([2.0, 0.0], [0.0, 0.0])]
    obstacles = []
    for i, (pos, vel) in enumerate(specs):
        o = DynamicObstacle(index=i, position=np.asarray(pos, dtype=float))
        o.prediction = get_constant_velocity_prediction(pos, vel, 0.2, 20)
        obstacles.append(o)
    kept = ensure_obstacle_size(obstacles, state, 2, 20, 0.2)
    assert len(kept) == 2
    assert all(np.linalg.norm(o.position) < 5 for o in kept)
    # Too few: pads with dummies 100m away
    kept2 = ensure_obstacle_size(kept[:1], state, 3, 20, 0.2)
    assert len(kept2) == 3
    assert np.linalg.norm(kept2[-1].position) > 100


def test_constant_velocity_prediction_values_and_cache():
    """The vectorized construction must place step k at p + v*dt*k, seed the
    mode_positions cache with the SAME array (rows are views of it), and
    propagate sigma_k = sqrt(k+1)*(0.3*dt) in the probabilistic branch
    (data_preparation.cpp:60-82,175-191)."""
    pred = get_constant_velocity_prediction(
        np.array([1.0, 2.0]), np.array([0.5, -0.25]), 0.2, 5)
    mp = pred.mode_positions(0)
    expect = np.array([[1.0 + 0.1 * k, 2.0 - 0.05 * k] for k in range(5)])
    np.testing.assert_allclose(mp, expect)
    np.testing.assert_allclose(pred.modes[0][3].position, expect[3])
    # The cached array and the step objects share memory (views)
    assert pred.modes[0][2].position.base is mp

    pg = get_constant_velocity_prediction(np.zeros(2), np.zeros(2), 0.2, 4,
                                          probabilistic=True)
    sig = [s.major_radius for s in pg.modes[0]]
    np.testing.assert_allclose(
        sig, [np.sqrt(k + 1.0) * 0.06 for k in range(4)])


def test_ensure_obstacle_size_time_scaled_ordering():
    """The closest-N metric is min_k (k+1)*0.6*||obs_k - (p + v*k*dir)||
    (data_preparation.cpp:97-173): an obstacle CONVERGING with the ego over
    the horizon must out-rank a static one that is nearer at k=0."""
    model = SecondOrderUnicycleModel()
    state = State(model)
    state.set("v", 1.0)  # psi=0 -> ego advances +x by v*k per step index
    # min_k metric by hand: static at y=2.5 -> (0+1)*0.6*2.5 = 1.5 at k=0
    # (grows with k as the ego drives away)
    static_near = DynamicObstacle(index=0,
                                  position=np.array([0.0, 2.5]))
    static_near.prediction = get_constant_velocity_prediction(
        static_near.position, np.zeros(2), 0.2, 20)
    # Converging: gap 4-1.16k -> at k=3 gap 0.52, (3+1)*0.6*0.52 = 1.248 < 1.5
    converging = DynamicObstacle(index=1, position=np.array([4.0, 0.0]))
    converging.prediction = get_constant_velocity_prediction(
        converging.position, np.array([-0.8, 0.0]), 0.2, 20)
    far = DynamicObstacle(index=2, position=np.array([50.0, 50.0]))
    far.prediction = get_constant_velocity_prediction(
        far.position, np.zeros(2), 0.2, 20)
    kept = ensure_obstacle_size([far, static_near, converging], state, 1,
                                20, 0.2)
    assert len(kept) == 1
    # 1.248 (converging, min at k=3) < 1.5 (static, min at k=0): the
    # time-scaled metric prefers the obstacle that crosses the ego's path
    assert np.allclose(kept[0].position, [4.0, 0.0])


def test_shift_forward_warmstart_semantics():
    """acados_solver_interface.cpp:346-376: [state, x2, ..., x_{N-1}, x_{N-1}]."""
    planner, model, settings = make_planner()
    s = planner.solver
    # Fabricate an output trajectory
    s._output_z = np.arange((s.N + 1) * s.nvar, dtype=float).reshape(
        s.N + 1, s.nvar)
    from oscar_mpc_planner_mr_modification_tpu.solver import State

    state = State(model)
    state.set("x", -1.0)
    state.set("v", 0.7)
    s.initialize_warmstart(state, shift_forward=True)
    # k=0: states from current state, inputs from output stage 0
    assert s.get_ego_prediction(0, "x") == -1.0
    assert s.get_ego_prediction(0, "v") == 0.7
    # 0 < k < N-1: from output k+1
    for name in ("x", "y", "v", "a", "w"):
        assert s.get_ego_prediction(3, name) == s.get_output(4, name)
    # k = N-1 and k = N: from output N-1
    for k in (s.N - 1, s.N):
        assert s.get_ego_prediction(k, "x") == s.get_output(s.N - 1, "x")

    # Hold (shift=False): identical to output
    s.initialize_warmstart(state, shift_forward=False)
    for k in (0, 5, s.N):
        assert s.get_ego_prediction(k, "y") == s.get_output(k, "y")


def test_contouring_road_constraints_feed_linearized():
    """Contouring road halfspaces (contouring.cpp:183-237) populate
    module_data.static_obstacles and gate the corridor."""
    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_no_obstacles)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp, Solver
    from oscar_mpc_planner_mr_modification_tpu.types import ModuleData

    settings = default_settings(N=10)
    settings["contouring"]["add_road_constraints"] = True
    model, mm = configuration_no_obstacles(settings)
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=4, n_qp_iter=10))
    from oscar_mpc_planner_mr_modification_tpu.planner import Planner

    planner = Planner(solver, mm, settings)
    data = RealTimeData()
    data.robot_area = define_robot_area(0.65, 0.65, 1)
    data.reference_path.x = list(np.linspace(0, 20, 20))
    data.reference_path.y = [0.0] * 20
    planner.on_data_received(data, "reference_path")

    from oscar_mpc_planner_mr_modification_tpu.solver import State

    state = State(model)
    state.set("v", 1.0)
    # Prime the warmstart so road constraints have stage positions
    solver.initialize_with_braking(state)
    md = ModuleData()
    mm.update_all(state, data, md)
    assert md.static_obstacles is not None
    assert len(md.static_obstacles[1]) == 2  # left + right halfspace
    # Road width 6, robot radius 0.325: center is feasible, 4m offset is not
    for hs in md.static_obstacles[1]:
        assert hs.A @ np.array([0.2, 0.0]) <= hs.b + 1e-9
    assert any(hs.A @ np.array([0.2, 4.0]) > hs.b for hs in md.static_obstacles[1])
    assert any(hs.A @ np.array([0.2, -4.0]) > hs.b for hs in md.static_obstacles[1])


def test_road_constraints_from_bounds_keep_robot_radius_inside():
    """Bound-based road halfspaces must keep the robot CENTER a radius r inside
    the physical edge (contouring.cpp:253-263: left b = A@(p + A*r) with
    halfspace (-A,-b); right b = A@(p - A*r))."""
    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_no_obstacles)
    from oscar_mpc_planner_mr_modification_tpu.solver import (State, Solver,
                                                              build_ocp)
    from oscar_mpc_planner_mr_modification_tpu.types import ModuleData
    from oscar_mpc_planner_mr_modification_tpu.planner import Planner

    settings = default_settings(N=10)
    settings["contouring"]["add_road_constraints"] = True
    model, mm = configuration_no_obstacles(settings)
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=4, n_qp_iter=10))
    planner = Planner(solver, mm, settings)

    data = RealTimeData()
    data.robot_area = define_robot_area(0.65, 0.65, 1)
    r = data.robot_area[0].radius
    xs = list(np.linspace(0, 20, 20))
    data.reference_path.x = xs
    data.reference_path.y = [0.0] * 20
    data.left_bound.x = xs
    data.left_bound.y = [3.0] * 20
    data.right_bound.x = xs
    data.right_bound.y = [-3.0] * 20
    planner.on_data_received(data, "reference_path")

    state = State(model)
    state.set("v", 1.0)
    solver.initialize_with_braking(state)
    md = ModuleData()
    mm.update_all(state, data, md)
    hs = md.static_obstacles[1]
    assert len(hs) == 2
    eps = 1e-3
    # Center r inside the bound: feasible. r past that: infeasible.
    for y in (3.0 - r - eps, -(3.0 - r - eps)):
        assert all(h.A @ np.array([0.2, y]) <= h.b + 1e-9 for h in hs), y
    for y in (3.0 - r + eps, -(3.0 - r + eps)):
        assert any(h.A @ np.array([0.2, y]) > h.b for h in hs), y


def test_contouring_follows_curved_path():
    """Closed-loop MPCC on an arc (validates the spline machinery beyond
    straight lines: segment windows, blending, curvature)."""
    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_basic)
    from oscar_mpc_planner_mr_modification_tpu.planner import Planner
    from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import curve_path
    from oscar_mpc_planner_mr_modification_tpu.solver import (State, Solver,
                                                              build_ocp)

    N, dt = 15, 0.2
    settings = default_settings(N=N, max_obstacles=2)
    model, mm = configuration_basic(settings)
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=6, n_qp_iter=12))
    planner = Planner(solver, mm, settings)

    # Sparse waypoints (reference roadmap style): the contouring module uploads
    # a num_segments=5 window starting at the closest segment, so segments must
    # be long enough for the window to cover the lookahead horizon
    path = curve_path(radius=8.0, angle=np.pi / 2, n_points=10)
    state = State(model)
    state.set("x", path.x[0])
    state.set("y", path.y[0])
    state.set("psi", path.psi[0])
    state.set("v", 1.0)

    from oscar_mpc_planner_mr_modification_tpu.ops.spline_fit import (
        CubicSpline2D)

    ref_spline = CubicSpline2D(path.x, path.y)
    max_lateral = 0.0
    n_ok = 0
    for step in range(45):
        data = make_data(settings, state, [], N, dt)
        data.reference_path = path
        if step == 0:
            planner.on_data_received(data, "reference_path")
        out = planner.solve_mpc(state, data)
        a = planner.get_solution(0, "a") if out.success else -3.0
        w = planner.get_solution(0, "w") if out.success else 0.0
        n_ok += out.success
        x = np.array(model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt))
        state.set_array(x)
        s = ref_spline.closest_s(state.get_position())
        if s < ref_spline.length - 1.0:
            max_lateral = max(max_lateral, float(np.linalg.norm(
                ref_spline.at(s) - state.get_position())))
        if planner.is_objective_reached(state, data):  # end of path (1.5 m)
            break

    assert n_ok >= 30, f"solved {n_ok}"
    # Progressed well around the arc (arc length = 8 * pi/2 = 12.6 m)
    s_final = ref_spline.closest_s(state.get_position())
    assert s_final > 10.0, f"progress {s_final:.1f} m"
    assert max_lateral < 0.2, f"lateral error {max_lateral:.2f} m"


def test_budget_adaptive_iteration_control():
    """Reference semantics: the solve runs fewer RTI iterations when the tick
    budget is nearly spent (acados_solver_interface.cpp:86-119, budget from
    planner.cpp:168-169). A late-started tick provably runs a reduced ladder
    variant and still emits a usable command."""
    import time

    planner, model, settings = make_planner(N=10, max_obstacles=2)
    solver = planner.solver
    assert solver.adaptive_iterations
    assert solver._iter_ladder == [8, 4, 2]

    # Deterministic selection unit checks
    solver._iter_time_ema = 0.004
    solver.solver_timeout = 0.050
    assert solver.select_iterations() == 8   # 8*4ms = 32 <= 50
    solver.solver_timeout = 0.020
    assert solver.select_iterations() == 4   # 16 <= 20 < 32
    solver.solver_timeout = 0.009
    assert solver.select_iterations() == 2   # floor: always >= 1 iteration
    solver.solver_timeout = 0.0              # no budget info -> full count
    assert solver.select_iterations() == 8
    solver._iter_time_ema = 0.0              # no timing info -> full count
    solver.solver_timeout = 0.020
    assert solver.select_iterations() == 8

    state = State(model)
    state.set("v", 0.5)
    dt = planner.solver.dt
    data = make_data(settings, state, [([3.0, 2.5], [0.0, 0.0])], 10, dt)

    # Normal tick (no budget stamp): full iteration count
    out = planner.solve_mpc(state, data)
    assert out.success
    assert solver.last_iterations_run == 8

    # Late-started tick: stamp planning_start_time on the monotonic clock so
    # only ~14 ms of the 50 ms budget remains -> the 2-iteration variant
    solver._iter_time_ema = 0.004
    data.planning_start_time = time.monotonic() - 0.030
    out = planner.solve_mpc(state, data)
    assert out.success, "reduced-iteration solve must still emit a command"
    assert solver.last_iterations_run < 8
    v_cmd = planner.get_solution(1, "v")
    assert np.isfinite(v_cmd)
