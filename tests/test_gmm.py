"""GMM multi-mode obstacle predictions, end-to-end.

The reference carries GMMs in its message format (mpc_planner_msgs/msg/
ObstacleGMM.msg) but rejects >1 mode at the callback
(ros1_jackalsimulator.cpp:346-349). The TPU build consumes them: per-mode
constraint rows with probability-aware risk allocation
(modules/base.py::mode_risk_allocation).
"""

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.utils import default_settings
from oscar_mpc_planner_mr_modification_tpu.models import SecondOrderUnicycleModel
from oscar_mpc_planner_mr_modification_tpu.modules import (
    ModuleManager, MPCBaseModule, GoalModule, EllipsoidConstraintModule,
    GaussianConstraintModule)
from oscar_mpc_planner_mr_modification_tpu.modules.base import (
    mode_risk_allocation)
from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp, Solver, State
from oscar_mpc_planner_mr_modification_tpu.planner import Planner
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    define_robot_area, ensure_obstacle_size, get_gmm_prediction,
    propagate_prediction_uncertainty)
from oscar_mpc_planner_mr_modification_tpu.types import (
    RealTimeData, DynamicObstacle, Prediction, PredictionType)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig


def test_mode_risk_allocation():
    # Single mode: full risk (reference behavior)
    p = get_gmm_prediction([0, 0], [[1, 0]], [1.0], 0.2, 5)
    assert mode_risk_allocation(p, 0.05, 1) == [0.05]
    # Two equal modes: risk/2 each -> total p-weighted violation = risk
    p2 = get_gmm_prediction([0, 0], [[1, 0], [0, 1]], [0.5, 0.5], 0.2, 5)
    risks = mode_risk_allocation(p2, 0.05, 2)
    assert np.allclose(risks, [0.05, 0.05])  # risk/(2*0.5)
    # Skewed: low-probability mode gets looser risk, bounded total
    p3 = get_gmm_prediction([0, 0], [[1, 0], [0, 1]], [0.9, 0.1], 0.2, 5)
    r3 = mode_risk_allocation(p3, 0.05, 2)
    assert r3[1] > r3[0]
    assert 0.9 * r3[0] + 0.1 * r3[1] <= 0.05 + 1e-12
    # Clipping keeps erfinv/quantile domains safe
    p4 = get_gmm_prediction([0, 0], [[1, 0], [0, 1]], [0.999, 0.001], 0.2, 5)
    assert max(mode_risk_allocation(p4, 0.3, 2)) <= 0.49


def test_gmm_row_and_param_counts():
    settings = default_settings(max_obstacles=2,
                                probabilistic={"max_modes": 3})
    mod = EllipsoidConstraintModule(settings)
    assert mod.nh == 2 * 3 * settings["n_discs"]
    gmod = GaussianConstraintModule(settings)
    assert gmod.nh == 2 * 3 * settings["n_discs"]
    from oscar_mpc_planner_mr_modification_tpu.utils.params import (
        ParameterRegistry)
    reg = ParameterRegistry()
    mod.define_parameters(reg)
    names = set(reg.save_map().keys())
    assert "ellipsoid_obst_0_x" in names  # mode 0 = reference names
    assert "ellipsoid_obst_1_m2_chi" in names
    # ego_disc_radius + n_discs offsets + per-obstacle (6 per mode * 3 + r)
    assert len(names) == 1 + settings["n_discs"] + 2 * (6 * 3 + 1)


def test_propagate_uncertainty_all_modes():
    pred = get_gmm_prediction([0, 0], [[1, 0], [-1, 0]], [0.5, 0.5], 0.2, 10,
                              noise=0.3)
    # get_gmm_prediction already propagates; check monotone growth in BOTH modes
    for mode in pred.modes:
        radii = [s.major_radius for s in mode]
        assert all(radii[i + 1] > radii[i] for i in range(len(radii) - 1))


def _make_gmm_planner(module_cls, N=15, probabilistic_extra=None):
    prob = {"max_modes": 2, "enable": True}
    prob.update(probabilistic_extra or {})
    settings = default_settings(N=N, max_obstacles=1, weights={"goal": 5.0},
                                probabilistic=prob)
    model = SecondOrderUnicycleModel()
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(module_cls(settings))
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=8, n_qp_iter=15))
    return Planner(solver, mm, settings), model, settings


def _two_mode_obstacle(position, dt, N, noise=0.0):
    """Pedestrian at a fork: mode 0 veers up-left, mode 1 veers down-left
    (toward the robot's natural avoidance side)."""
    obs = DynamicObstacle(index=0, position=np.asarray(position, float),
                          radius=0.3)
    obs.prediction = get_gmm_prediction(
        position, [[-0.3, 0.45], [-0.3, -0.45]], [0.5, 0.5], dt, N,
        noise=noise)
    return obs


def test_gmm_constraints_see_second_mode():
    """The stage-constraint function must flag a point that only violates
    mode 1 (a single-mode planner would accept it)."""
    planner, model, settings = _make_gmm_planner(EllipsoidConstraintModule)
    solver = planner.solver
    N, dt = solver.N, solver.ocp.dt
    data = RealTimeData()
    data.robot_area = define_robot_area(0.65, 0.65, settings["n_discs"])
    data.goal = np.array([5.0, 0.0])
    data.goal_received = True
    obs = _two_mode_obstacle([3.0, 0.0], dt, N)
    data.dynamic_obstacles = [obs]

    state = State(model)
    state.set("v", 0.5)
    from oscar_mpc_planner_mr_modification_tpu.types import ModuleData
    md = ModuleData()
    planner.modules.update_all(state, data, md)
    planner.modules.set_all_parameters(solver.params, data, md)

    k = 6  # stage where the modes have forked (step k-1 of the prediction)
    p_k = solver.params.data[k]
    mode1_pos = obs.prediction.modes[1][k - 1].position
    z = np.zeros(solver.nvar)
    ix = model.var_index("x")  # index into z=(u, x), nu offset included
    iy = model.var_index("y")
    z[ix] = mode1_pos[0]
    z[iy] = mode1_pos[1]
    h = np.asarray(solver.ocp.ineq(jnp.asarray(z), jnp.asarray(p_k)))
    # Rows: [obs0-mode0, obs0-mode1]; ellipsoid constraint is h >= 1
    assert h[1] < 1.0, "point at mode-1 center must violate the mode-1 row"
    assert h[0] > 1.0, "mode-0 row alone would NOT catch it"


def test_gmm_closed_loop_avoids_both_modes():
    """Closed loop vs a 2-mode pedestrian whose TRUE motion follows mode 1;
    with max_modes=2 the planner keeps clearance from the realized path."""
    N, dt = 15, 0.2
    planner, model, settings = _make_gmm_planner(EllipsoidConstraintModule, N=N)
    state = State(model)
    state.set("v", 0.5)
    ped_pos = np.array([3.0, 0.0])
    ped_vel = np.array([-0.3, -0.45])  # realizes mode 1
    min_dist = np.inf
    n_ok = 0
    for step in range(50):
        data = RealTimeData()
        data.robot_area = define_robot_area(0.65, 0.65, settings["n_discs"])
        data.goal = np.array([6.0, 0.0])
        data.goal_received = True
        obs = _two_mode_obstacle(ped_pos, dt, N)
        data.dynamic_obstacles = ensure_obstacle_size(
            [obs], state, 1, N, dt)
        out = planner.solve_mpc(state, data)
        n_ok += out.success
        a = planner.get_solution(0, "a") if out.success else -3.0
        w = planner.get_solution(0, "w") if out.success else 0.0
        x_next = model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt)
        state.set_array(np.asarray(x_next))
        ped_pos = ped_pos + ped_vel * dt
        min_dist = min(min_dist,
                       float(np.linalg.norm(state.get_position() - ped_pos)))
        if np.linalg.norm(state.get_position() - data.goal) < 0.4:
            break
    assert n_ok > 25, f"solved {n_ok}"
    # combined radius 0.3 + 0.325
    assert min_dist > 0.6, f"got too close to the realized mode: {min_dist:.3f}"


def test_gmm_gaussian_chance_constraints_run():
    """CC-MPC module with 2 modes: solves and keeps margin from both modes."""
    N, dt = 15, 0.2
    planner, model, settings = _make_gmm_planner(GaussianConstraintModule, N=N)
    state = State(model)
    state.set("v", 0.5)
    data = RealTimeData()
    data.robot_area = define_robot_area(0.65, 0.65, settings["n_discs"])
    data.goal = np.array([6.0, 0.0])
    data.goal_received = True
    obs = _two_mode_obstacle([3.0, 0.0], dt, N, noise=0.1)
    data.dynamic_obstacles = [obs]
    out = planner.solve_mpc(state, data)
    assert out.success
    # The planned trajectory keeps chance-constraint margin from BOTH modes
    for k in range(3, N):
        pos = np.array([planner.solver.get_output(k, "x"),
                        planner.solver.get_output(k, "y")])
        for j in (0, 1):
            c = obs.prediction.modes[j][k - 1].position
            assert np.linalg.norm(pos - c) > 0.55, (k, j)
