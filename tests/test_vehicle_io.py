"""Real-vehicle IO adapter tests (the `mpc_planner_jackal` role):
external pose source, Vicon-style tracked-object updates for
non-communicating obstacles, and velocity-command output.
Reference: mpc_planner_jackal/src/jules_ros1_real_jackalplanner.cpp.
"""

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.factory import (
    build_planner, configuration_goal_tmpc)
from oscar_mpc_planner_mr_modification_tpu.multirobot import (
    MockViconIO, PoseMeasurement, RealVehicleAgent, TrackedObject,
    update_noncommunicating_obstacles)
from oscar_mpc_planner_mr_modification_tpu.multirobot.driver import MessageBus
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    get_constant_velocity_prediction)
from oscar_mpc_planner_mr_modification_tpu.types import (DynamicObstacle,
                                                         PlannerState,
                                                         RealTimeData)
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_update_noncommunicating_obstacles_vicon_semantics():
    """Reference :532-620: robots (id < n_robot_ids) skipped; body-frame
    twist rotated by R(+yaw) into the global frame (the reference's
    rotationMatrixFromHeading(-yaw) is the body->global rotation, since
    rotationMatrixFromHeading(h) is global->body — see its use at
    mpc_planner_dingo/src/ros1_planner.cpp:131); prediction refreshed."""
    data = RealTimeData()
    for idx in (0, 7):  # id 0 = a robot, id 7 = a Vicon bundle object
        obs = DynamicObstacle(index=idx, position=np.zeros(2), radius=0.3)
        obs.prediction = get_constant_velocity_prediction(
            np.zeros(2), np.zeros(2), 0.2, 10)
        data.dynamic_obstacles.append(obs)

    yaw = np.pi / 2
    objs = [
        TrackedObject(id=0, position=np.array([9.0, 9.0]), yaw=0.0,
                      body_velocity=np.array([1.0, 0.0])),
        TrackedObject(id=7, position=np.array([2.0, 1.0]), yaw=yaw,
                      body_velocity=np.array([0.5, 0.0])),
    ]
    n = update_noncommunicating_obstacles(data, objs, n_robot_ids=1,
                                          dt=0.2, N=10)
    assert n == 1
    # Robot entry untouched
    np.testing.assert_allclose(data.dynamic_obstacles[0].position, 0.0)
    obs7 = data.dynamic_obstacles[1]
    np.testing.assert_allclose(obs7.position, [2.0, 1.0])
    # R(+pi/2) @ [0.5, 0] = [0, +0.5]: object facing +y moving forward is
    # predicted moving +y
    p0 = obs7.prediction.modes[0][0].position
    p3 = obs7.prediction.modes[0][3].position
    np.testing.assert_allclose(p3 - p0, [0.0, 0.5 * 0.2 * 3], atol=1e-9)
    # Moving object: orientation aligned with motion direction
    assert abs(obs7.angle - (yaw + 0.0 + np.pi / 2)) < 1e-9


def test_real_vehicle_agent_closed_loop():
    """RealVehicleAgent consumes external poses, plans, and pushes (v, w)
    commands; the vehicle 'moves' only through the scripted pose stream."""
    clock = FakeClock()
    bus = MessageBus()
    settings = default_settings(
        N=15, max_obstacles=2, weights={"goal": 5.0},
        guidance={"n_samples": 30, "longitudinal_goals": 2,
                  "vertical_goals": 3})
    model, modules = configuration_goal_tmpc(settings)
    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=5, n_qp_iter=10),
                            clock=clock)
    # Scripted localization: vehicle creeping forward along x
    poses = [PoseMeasurement(np.array([0.1 * k, 0.0]), 0.0, 0.8, 0.1 * k)
             for k in range(30)]
    # One Vicon object crossing from the side
    frames = [[TrackedObject(id=5, position=np.array([3.0, 2.0 - 0.1 * k]),
                             yaw=-np.pi / 2,
                             body_velocity=np.array([0.5, 0.0]))]
              for k in range(30)]
    io = MockViconIO(poses=poses, object_frames=frames)
    agent = RealVehicleAgent("jackal_real", 0, planner, model, settings,
                             goal=np.array([6.0, 0.0]), bus=bus, clock=clock,
                             start_pose=(0.0, 0.0, 0.0), io=io,
                             n_robot_ids=1)
    agent.set_peers(["jackal_real"])

    for k in range(12):
        agent.tick()
        clock.t += 0.2
    assert agent.fsm == PlannerState.PLANNING_ACTIVE
    assert len(io.commands) >= 8, "velocity commands must be pushed"
    v_cmds = [c[0] for c in io.commands]
    assert all(np.isfinite(v) for v, w in io.commands)
    assert max(v_cmds) > 0.1, "vehicle should be commanded forward"
    # Ego state tracks the external pose stream, not integration
    assert abs(agent.state.get("x") - poses[11].position[0]) < 0.11
    # The Vicon object must survive prepare_obstacle_data's rebuild and reach
    # the planner's obstacle set (regression: updates applied to
    # data.dynamic_obstacles directly were wiped every plan cycle)
    vicon = [o for o in agent.data.dynamic_obstacles if o.index == 5]
    assert vicon, "tracked object must be planned against"
    q0 = vicon[0].prediction.modes[0][0].position
    q1 = vicon[0].prediction.modes[0][1].position
    vv = (q1 - q0) / planner.solver.dt
    # Object facing -y moving forward in body frame -> global -y motion
    np.testing.assert_allclose(vv, [0.0, -0.5], atol=1e-6)


def test_real_vehicle_agent_brakes_on_missing_plan():
    """Infeasible/missing plan -> braking ramp command (reference
    :1169-1218 command fallback)."""
    clock = FakeClock()
    bus = MessageBus()
    settings = default_settings(
        N=10, max_obstacles=2,
        guidance={"n_samples": 20, "longitudinal_goals": 2,
                  "vertical_goals": 3})
    model, modules = configuration_goal_tmpc(settings)
    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=3, n_qp_iter=8),
                            clock=clock)
    io = MockViconIO(poses=[PoseMeasurement(np.zeros(2), 0.0, 1.2, 0.0)])
    agent = RealVehicleAgent("r", 0, planner, model, settings,
                             goal=np.array([5.0, 0.0]), bus=bus, clock=clock,
                             io=io, n_robot_ids=1)
    agent.set_peers(["r"])
    # No goal data ready: force the planner into the gate-failure path by
    # removing the goal
    agent.data.goal_received = False
    agent.data.goal = None
    for _ in range(5):
        agent.tick()
        clock.t += 0.2
    assert len(io.commands) >= 1
    v0 = io.commands[-1][0]
    dec = abs(settings["deceleration_at_infeasible"])
    assert v0 <= 1.2 - dec * 0.2 + 1e-9, "braking ramp expected"
