#!/usr/bin/env python
"""Multi-robot demo: 3 robots + a crossing pedestrian with event-triggered
trajectory communication. Prints the fleet dashboard and communication stats.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/demo_multirobot.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.dashboard import render_dashboard
from oscar_mpc_planner_mr_modification_tpu.factory import (
    build_planner, configuration_goal_tmpc)
from oscar_mpc_planner_mr_modification_tpu.multirobot.driver import (
    MessageBus, MultiRobotDriver, RobotAgent)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.sim import (Pedestrian,
                                                       PedestrianSimulator)
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings


class Clock:
    t = 0.0

    def __call__(self):
        return self.t


def main():
    clock = Clock()
    bus = MessageBus()

    def agent(ns, i, start, goal):
        settings = default_settings(
            N=12, max_obstacles=3, weights={"goal": 5.0},
            guidance={"n_samples": 25, "longitudinal_goals": 2,
                      "vertical_goals": 3})
        model, modules = configuration_goal_tmpc(settings)
        planner = build_planner(model, modules, settings, dtype=jnp.float64,
                                sqp_config=SQPConfig(n_sqp=5, n_qp_iter=10),
                                clock=clock)
        return RobotAgent(ns, i, planner, model, settings,
                          goal=np.asarray(goal, float), bus=bus, clock=clock,
                          start_pose=start)

    agents = [agent("r1", 0, (2.0, 0.0, 0.0), (11.0, 0.0)),
              agent("r2", 1, (11.0, 1.3, np.pi), (2.0, 1.3)),
              agent("r3", 2, (6.5, -4.0, np.pi / 2), (6.5, 4.0))]
    peds = [Pedestrian(np.array([6.5, 5.0]), np.array([6.5, -6.0]))]
    psim = PedestrianSimulator(peds, dt=0.2)

    driver = MultiRobotDriver(agents, clock=clock)

    def obstacle_provider(cycle):
        psim.step([a.state.get_position() for a in agents])
        return psim.get_obstacles(12)

    log = driver.run(n_cycles=60, obstacle_provider=obstacle_provider)
    print(render_dashboard(log))
    for a in agents:
        print(f"{a.ns}: sent {a.comm.n_sent} trajectories over "
              f"{a.comm.n_cycles} planning cycles "
              f"(saved {100 * (1 - log.communication_rate(a.ns)):.0f}% bandwidth)")


if __name__ == "__main__":
    main()
