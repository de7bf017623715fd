"""Simulation environment tests: pedestrian simulator + closed-loop episode."""

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.factory import (
    build_planner, configuration_goal_tmpc)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.sim import (Pedestrian,
                                                       PedestrianSimulator,
                                                       SimEnvironment)
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_pedestrians_walk_to_goals_and_repel():
    peds = [
        Pedestrian(position=np.array([0.0, 0.0]), goal=np.array([5.0, 0.0])),
        Pedestrian(position=np.array([0.4, 0.0]), goal=np.array([-5.0, 0.0])),
    ]
    sim = PedestrianSimulator(peds, dt=0.1)
    for _ in range(40):
        sim.step()
    assert peds[0].position[0] > 1.5  # moving toward its goal
    assert peds[1].position[0] < -0.5
    obstacles = sim.get_obstacles(N=10)
    assert len(obstacles) == 2
    assert len(obstacles[0].prediction.modes[0]) == 10


def test_sim_environment_episode_completes():
    clock = FakeClock()
    # probabilistic mode: Gaussian predictions with uncertainty propagation and
    # chi-quantile inflation absorb the social-force prediction mismatch
    settings = default_settings(
        N=15, max_obstacles=2, weights={"goal": 5.0},
        probabilistic={"enable": True, "risk": 0.05},
        guidance={"n_samples": 30, "longitudinal_goals": 2, "vertical_goals": 3})
    model, modules = configuration_goal_tmpc(settings)
    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=5, n_qp_iter=10),
                            clock=clock)
    peds = [Pedestrian(position=np.array([4.0, 2.5]), goal=np.array([4.0, -4.0]))]
    env = SimEnvironment(planner, model, settings,
                         pedestrian_sim=PedestrianSimulator(peds, dt=0.2),
                         goal=np.array([7.0, 0.5]), clock=clock)
    start = np.zeros(model.nx)
    start[model.state_index("x")] = 1.0
    start[model.state_index("v")] = 0.5
    result = env.run_episode(max_cycles=80, start_state=start)
    assert result.completed, f"episode failed: {result}"
    assert result.collisions == 0
    assert result.min_obstacle_distance > 0.6


def test_roadmap_paths():
    from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import (
        curve_path, path_with_bounds, s_bend_path, straight_path)

    p = straight_path(length=20.0, velocity=1.5)
    assert p.has_velocity() and p.has_distance()
    assert abs(p.s[-1] - 20.0) < 1e-9
    c = curve_path(radius=5.0)
    assert abs(np.hypot(c.x[0] - 0.0, c.y[0] - 0.0)) < 1e-9
    s = s_bend_path(amplitude=2.0)
    assert max(s.y) > 1.9 and min(s.y) < -1.9
    left, right = path_with_bounds(p, width=6.0)
    assert abs(left.y[0] - 3.0) < 1e-9 and abs(right.y[0] + 3.0) < 1e-9
