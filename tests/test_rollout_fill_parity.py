"""Evaluator <-> planner parameter-fill parity pins (round-4 VERDICT weak #4).

The closed-loop evaluators (parallel/rollout.py) re-implement the host
modules' ``set_parameters`` uploads in-graph. These tests pin, per flavor,
the exact parameter tensor the evaluator's FIRST tick dispatches against the
buffer the host module path (``Module.set_parameters`` into a
``ParameterBuffer``) produces for the same scene, so the evaluator cannot
silently drift from the planner it claims to measure.

Documented (asserted) divergences between the two paths:

- **Stage-time base.** The host keeps the reference's convention — stage k
  reads prediction step k-1 (ellipsoid_constraints.cpp:34-90), i.e. the
  obstacle's position at (k-1)*dt for a constant-velocity prediction whose
  step i sits at i*dt (data_preparation.cpp:60-82). The evaluator measures
  against exact ground truth, so its stage k reads k*dt. The pins therefore
  feed the host a prediction advanced by one step (step i at (i+1)*dt),
  which makes host stage k == evaluator stage k for k >= 1 EXACTLY.
- **k=0 rows.** The host writes dummies at stage 0 (obstacle at ego+50 m,
  radius 0.1 — ellipsoid_constraints.cpp:50,62); the goal/contouring
  evaluators constrain stage 0 against the obstacle's current position with
  its true radius (stage 0 is the fixed initial state, so the row is inert
  either way). Asserted explicitly below.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.modules import (
    ContouringModule, EllipsoidConstraintModule, GaussianConstraintModule,
    GoalModule, ModuleManager, MPCBaseModule)
from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
    make_batch_rollout, make_contouring_rollout, make_multirobot_rollout,
    make_tmpc_rollout)
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    get_constant_velocity_prediction)
from oscar_mpc_planner_mr_modification_tpu.solver.state import State
from oscar_mpc_planner_mr_modification_tpu.types import (
    Disc, DynamicObstacle, ModuleData, PredictionType, RealTimeData,
    ReferencePath)
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

N = 10
DT = None  # resolved from the ocp per test


def _shifted_cv_prediction(pos, vel, dt, steps, majors=None):
    """Constant-velocity prediction advanced one step (step i at (i+1)*dt)
    so host stage k (reading step k-1) lands on the evaluator's k*dt."""
    pos = np.asarray(pos, float)
    vel = np.asarray(vel, float)
    pred = get_constant_velocity_prediction(pos + vel * dt, vel, dt, steps)
    if majors is not None:
        pred.type = PredictionType.GAUSSIAN
        for i, step in enumerate(pred.modes[0]):
            step.major_radius = majors[i]
            step.minor_radius = majors[i]
    return pred


def _data_for(goal, obstacles, robot_radius):
    data = RealTimeData()
    data.robot_area = [Disc(0.0, robot_radius)]
    if goal is not None:
        data.goal = np.asarray(goal, float)
        data.goal_received = True
    data.dynamic_obstacles = obstacles
    return data


def _host_fill(ocp, modules, state, data):
    """Run the host module path: update + set_parameters into a fresh
    (N, npar) ParameterBuffer (the planner.solveMPC sequence,
    planner/planner.py:252)."""
    buf = ocp.registry.new_buffer(ocp.N)
    md = ModuleData()
    for m in modules:
        m.update(state, data, md)
    for m in modules:
        m.set_parameters(buf, data, md)
    return np.asarray(buf.data, float)


def _cols(idx, names):
    return np.asarray([idx[n] for n in names], int)


def _assert_rows_equal(host, evalr, idx, obstacle_xy_cols, k0_diverging_cols,
                       skip_cols=()):
    """host/evaluator (N, npar): exact equality except the documented k=0
    divergences (and explicitly skipped inert columns)."""
    npar = host.shape[1]
    mask = np.ones(npar, bool)
    mask[list(k0_diverging_cols)] = False
    if len(skip_cols):
        skip = np.asarray(list(skip_cols), int)
        host = host.copy()
        evalr = evalr.copy()
        host[:, skip] = 0.0
        evalr[:, skip] = 0.0
    # Stages 1..N-1: every column must agree exactly
    np.testing.assert_allclose(evalr[1:], host[1:], rtol=0, atol=1e-9,
                               err_msg="stages 1..N-1 disagree")
    # Stage 0: everything except the documented dummy rows
    np.testing.assert_allclose(evalr[0, mask], host[0, mask], rtol=0,
                               atol=1e-9, err_msg="stage 0 disagrees outside "
                               "the documented dummy columns")


def test_goal_flavor_fill_matches_host_modules():
    n_obs = 2
    settings = default_settings(N=N, max_obstacles=n_obs)
    rollout, ocp = make_batch_rollout(n_obstacles=n_obs, N=N,
                                      dtype=jnp.float64, backend="xla",
                                      settings=settings, obstacle_radius=0.3)
    dt = ocp.dt
    idx = ocp.registry.save_map()
    robot_radius = float(settings["robot_radius"])

    x0 = np.array([[0.4, -0.2, 0.1, 0.6]])
    goal = np.array([[7.0, 0.5]])
    obs0 = np.array([[[3.0, 1.0], [4.5, -1.2]]])
    vel = np.array([[[0.0, -0.6], [0.15, 0.45]]])

    evalr = np.asarray(rollout.first_tick_params(
        jnp.asarray(x0), jnp.asarray(goal), jnp.asarray(obs0),
        jnp.asarray(vel)))[0]

    # Host path: same module set as the evaluator's _goal_ellipsoid_ocp
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(EllipsoidConstraintModule(settings))
    state = State(ocp.model)
    state.set("x", x0[0, 0]); state.set("y", x0[0, 1])
    state.set("psi", x0[0, 2]); state.set("v", x0[0, 3])
    obstacles = []
    for i in range(n_obs):
        o = DynamicObstacle(index=i, position=obs0[0, i].copy(), radius=0.3)
        o.prediction = _shifted_cv_prediction(obs0[0, i], vel[0, i], dt, N)
        obstacles.append(o)
    host = _host_fill(ocp, mm, state,
                      _data_for(goal[0], obstacles, robot_radius))

    xy_cols = _cols(idx, [f"ellipsoid_obst_{i}_{c}" for i in range(n_obs)
                          for c in ("x", "y")])
    r_cols = _cols(idx, [f"ellipsoid_obst_{i}_r" for i in range(n_obs)])
    _assert_rows_equal(host, evalr, idx, xy_cols,
                       k0_diverging_cols=np.concatenate([xy_cols, r_cols]))
    # The documented k=0 divergence, pinned on both sides:
    assert np.all(host[0, r_cols] == 0.1)  # host dummy radius
    np.testing.assert_allclose(evalr[0, r_cols], 0.3)  # evaluator: true r
    np.testing.assert_allclose(  # host dummy at ego+50
        host[0, xy_cols.reshape(n_obs, 2)],
        np.tile(x0[0, :2] + 50.0, (n_obs, 1)))
    np.testing.assert_allclose(  # evaluator: obstacle at t=0
        evalr[0, xy_cols.reshape(n_obs, 2)], obs0[0])


def _straight_reference_path(length=50.0, step=5.0):
    xs = np.arange(0.0, length + step, step)
    return ReferencePath(x=list(xs), y=[0.0] * len(xs))


def _contouring_state(model, x0):
    state = State(model)
    for name, val in zip(("x", "y", "psi", "v", "spline"), x0):
        state.set(name, float(val))
    return state


def _contouring_host_modules(settings, gaussian=False):
    # Road constraints write module_data halfspaces through the wired solver
    # (not parameter columns) — out of scope for a fill pin.
    settings["contouring"]["add_road_constraints"] = False
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable("v", ["velocity", "reference_velocity"],
                        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)
    mm.add_module(ContouringModule(settings))
    mm.add_module(GaussianConstraintModule(settings) if gaussian
                  else EllipsoidConstraintModule(settings))
    return mm


@pytest.mark.parametrize("constraints", ["ellipsoid", "gaussian"])
def test_contouring_flavor_fill_matches_host_modules(constraints):
    n_obs = 2
    gaussian = constraints == "gaussian"
    risk, sigma_step = 0.05, 0.05
    settings = default_settings(N=N, max_obstacles=n_obs)
    if gaussian:
        settings["probabilistic"]["risk"] = risk
    rollout, ocp = make_contouring_rollout(
        n_obstacles=n_obs, N=N, dtype=jnp.float64, backend="xla",
        settings=settings, obstacle_radius=0.3, constraints=constraints,
        risk=risk, sigma_step=sigma_step)
    dt = ocp.dt
    idx = ocp.registry.save_map()
    robot_radius = float(settings["robot_radius"])

    x0 = np.array([[1.2, 0.3, 0.05, 0.8, 1.2]])  # x,y,psi,v,spline
    obs0 = np.array([[[4.0, 0.8], [6.0, -1.0]]])
    vel = np.array([[[-0.1, -0.5], [0.0, 0.4]]])
    evalr = np.asarray(rollout.first_tick_params(
        jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(vel)))[0]

    mm = _contouring_host_modules(settings, gaussian)
    data = _data_for(None, [], robot_radius)
    data.reference_path = _straight_reference_path()
    for m in mm:
        m.on_data_received(data, "reference_path")
    obstacles = []
    # Evaluator stage k reads sigma_step*sqrt(k+1); host stage k reads step
    # k-1 -> shifted prediction step i carries sqrt(i+2)
    majors = sigma_step * np.sqrt(np.arange(N) + 2.0) if gaussian else None
    for i in range(n_obs):
        o = DynamicObstacle(index=i, position=obs0[0, i].copy(), radius=0.3)
        o.prediction = _shifted_cv_prediction(obs0[0, i], vel[0, i], dt, N,
                                              majors=majors)
        obstacles.append(o)
    data.dynamic_obstacles = obstacles
    state = _contouring_state(ocp.model, x0[0])
    host = _host_fill(ocp, mm, state, data)

    obst = "gaussian_obst" if gaussian else "ellipsoid_obst"
    xy_cols = _cols(idx, [f"{obst}_{i}_{c}" for i in range(n_obs)
                          for c in ("x", "y")])
    if gaussian:
        # Host floors k=0 sigma at 1e-3 (dummy stage) vs evaluator's exact
        # sigma_step*sqrt(1); host k=0 position is the ego+50 dummy.
        sig_cols = _cols(idx, [f"{obst}_{i}_{c}" for i in range(n_obs)
                               for c in ("major", "minor")])
        k0_cols = np.concatenate([xy_cols, sig_cols])
    else:
        r_cols = _cols(idx, [f"{obst}_{i}_r" for i in range(n_obs)])
        k0_cols = np.concatenate([xy_cols, r_cols])
    _assert_rows_equal(host, evalr, idx, xy_cols, k0_diverging_cols=k0_cols)


def test_multirobot_flavor_fill_matches_host_modules():
    R = 3
    margin = 0.15
    rollout, ocp = make_multirobot_rollout(n_robots=R, N=N,
                                           dtype=jnp.float64, backend="xla",
                                           margin=margin)
    idx = ocp.registry.save_map()
    settings = default_settings(N=N, max_obstacles=R - 1)
    robot_radius = float(settings["robot_radius"])

    x0 = np.zeros((1, R, 4))
    x0[0, :, 0] = [0.0, 4.0, 2.0]
    x0[0, :, 1] = [0.0, 0.5, -3.0]
    goals = np.array([[[4.0, 0.0], [0.0, 0.5], [2.0, 3.0]]])
    evalr = np.asarray(rollout.first_tick_params(
        jnp.asarray(x0), jnp.asarray(goals)))  # (1, R, N, npar)

    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(EllipsoidConstraintModule(settings))

    xy_cols = _cols(idx, [f"ellipsoid_obst_{i}_{c}" for i in range(R - 1)
                          for c in ("x", "y")])
    r_cols = _cols(idx, [f"ellipsoid_obst_{i}_r" for i in range(R - 1)])
    for r in range(R):
        state = State(ocp.model)
        state.set("x", x0[0, r, 0]); state.set("y", x0[0, r, 1])
        # Peer plans on tick 0 are the stationary initial broadcast: every
        # prediction step sits at the peer's start pose. The margin-inflated
        # radius mirrors the evaluator's staleness allowance.
        obstacles = []
        for j, other in enumerate(o for o in range(R) if o != r):
            o = DynamicObstacle(index=other,
                                position=x0[0, other, :2].copy(),
                                radius=robot_radius + margin)
            o.prediction = _shifted_cv_prediction(
                x0[0, other, :2], np.zeros(2), ocp.dt, N)
            obstacles.append(o)
        host = _host_fill(ocp, mm, state,
                          _data_for(goals[0, r], obstacles, robot_radius))
        _assert_rows_equal(host, evalr[0, r], idx, xy_cols,
                           k0_diverging_cols=np.concatenate([xy_cols,
                                                             r_cols]))


def test_tmpc_flavor_fill_matches_host_modules():
    """T-MPC++ evaluator fill vs the host paths it stands in for:

    - weights/spline/ellipsoid columns vs the host Contouring +
      EllipsoidConstraints + MPCBase ``set_parameters``;
    - topology halfspace rows vs the REAL host
      ``TMPCOptimizer._fill_topology_constraints`` (parallel/tmpc.py:459),
      invoked on the evaluator's own seed bundle;
    - consistency weight off on the first tick on both sides.
    """
    from types import SimpleNamespace

    from oscar_mpc_planner_mr_modification_tpu.parallel.tmpc import (
        TMPCOptimizer)

    n_obs, n_paths = 3, 2
    rollout, ocp = make_tmpc_rollout(n_obstacles=n_obs, N=N,
                                     n_paths=n_paths, dtype=jnp.float64,
                                     backend="xla", obstacle_radius=0.3)
    dt = ocp.dt
    reg = ocp.registry
    idx = reg.save_map()
    settings = default_settings(N=N, max_obstacles=n_obs)
    robot_radius = float(settings["robot_radius"])
    P = n_paths + 1

    x0 = np.zeros((1, 5))
    x0[0, 3] = 1.0
    x0[0, 4] = x0[0, 0]
    obs0 = np.array([[[4.0, 0.6], [5.5, -0.9], [7.0, 0.2]]])
    vel = np.array([[[-0.2, -0.4], [0.0, 0.35], [-0.3, 0.0]]])

    args = (jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(vel))
    evalr = np.asarray(rollout.first_tick_params(*args))[0]  # (P, N, npar)
    seeds = np.asarray(rollout.first_tick_seeds(*args))[0]  # (P, N+1, nvar)

    # --- Host modules for the shared columns ---------------------------
    mm = _contouring_host_modules(settings, gaussian=False)
    data = _data_for(None, [], robot_radius)
    data.reference_path = _straight_reference_path()
    for m in mm:
        m.on_data_received(data, "reference_path")
    obstacles = []
    for i in range(n_obs):
        o = DynamicObstacle(index=i, position=obs0[0, i].copy(), radius=0.3)
        o.prediction = _shifted_cv_prediction(obs0[0, i], vel[0, i], dt, N)
        obstacles.append(o)
    data.dynamic_obstacles = obstacles
    state = _contouring_state(ocp.model, x0[0])
    host = _host_fill(ocp, mm, state, data)

    xy_cols = _cols(idx, [f"ellipsoid_obst_{i}_{c}" for i in range(n_obs)
                          for c in ("x", "y")])
    r_cols = _cols(idx, [f"ellipsoid_obst_{i}_r" for i in range(n_obs)])
    topo_cols = np.concatenate([
        np.asarray(reg.bundle_indices("lin_constraint_a1")),
        np.asarray(reg.bundle_indices("lin_constraint_a2")),
        np.asarray(reg.bundle_indices("lin_constraint_b"))])
    # prev-trajectory columns are inert on tick 0 (consistency weight 0 on
    # both sides — asserted below); the evaluator parks the placeholder
    # previous trajectory there, the host leaves zeros.
    prev_cols = _cols(idx, ["prev_traj_x", "prev_traj_y"])
    skip = np.concatenate([topo_cols, prev_cols])
    i_wc = idx["consistency_weight"]
    assert np.all(evalr[:, :, i_wc] == 0.0)
    assert np.all(host[:, i_wc] == 0.0)
    for p in range(P):
        # Evaluator k=0 obstacle rows are +50 m dummies (like the host's,
        # but at absolute +50 rather than ego-relative) with true radius.
        _assert_rows_equal(
            host, evalr[p], idx, xy_cols,
            k0_diverging_cols=np.concatenate([xy_cols, r_cols]),
            skip_cols=skip)

    # --- Topology rows vs the REAL host fill ---------------------------
    a1 = np.asarray(reg.bundle_indices("lin_constraint_a1"))
    a2 = np.asarray(reg.bundle_indices("lin_constraint_a2"))
    bb = np.asarray(reg.bundle_indices("lin_constraint_b"))
    stub = SimpleNamespace(
        solver=SimpleNamespace(N=N, ocp=ocp),
        robot_radius=robot_radius,
        _lin_a1=a1, _lin_a2=a2, _lin_b=bb)
    # Inactive-row baseline for every planner, as the host
    # GuidanceConstraintModule.set_parameters writes it
    # (modules/guidance_constraints.py:87-89) before the per-planner fill.
    host[:, a1] = 1.0
    host[:, a2] = 0.0
    host[:, bb] = 1.0e4
    host_params = np.tile(host[None], (P, 1, 1))
    TMPCOptimizer._fill_topology_constraints(
        stub, host_params, seeds, data, list(range(n_paths)))
    for cols in (a1, a2, bb):
        np.testing.assert_allclose(
            evalr[:n_paths, 1:, cols], host_params[:n_paths, 1:, cols],
            rtol=0, atol=1e-9,
            err_msg="guided-planner topology rows disagree with the host "
                    "TMPCOptimizer fill")
        # Unguided planner: rows inactive on both sides
        np.testing.assert_allclose(evalr[n_paths, :, cols],
                                   host_params[n_paths, :, cols],
                                   rtol=0, atol=1e-9)
