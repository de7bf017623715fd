#!/usr/bin/env python
"""Single-robot T-MPC demo: plan through crossing pedestrians along a reference
path, record the scene and render a figure.

Run (CPU):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/demo_single_robot.py
Run (TPU):  python examples/demo_single_robot.py   (uses the Pallas fleet path)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.factory import (
    build_planner, configuration_tmpc_consistency_cost)
from oscar_mpc_planner_mr_modification_tpu.metrics import MetricsLog, MPCMetrics
from oscar_mpc_planner_mr_modification_tpu.dashboard import render_dashboard
from oscar_mpc_planner_mr_modification_tpu.modules import GuidanceConstraintModule
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    define_robot_area, ensure_obstacle_size)
from oscar_mpc_planner_mr_modification_tpu.sim import (Pedestrian,
                                                       PedestrianSimulator)
from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import straight_path
from oscar_mpc_planner_mr_modification_tpu.solver import State
from oscar_mpc_planner_mr_modification_tpu.types import RealTimeData
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings
from oscar_mpc_planner_mr_modification_tpu.utils.visualization import SceneRecorder


def main():
    N, dt = 20, 0.2
    on_tpu = jax.devices()[0].platform == "tpu"
    settings = default_settings(N=N, max_obstacles=3)
    model, modules = configuration_tmpc_consistency_cost(settings)

    class Clock:
        t = 0.0

        def __call__(self):
            return self.t

    clock = Clock()
    cfg = SQPConfig(n_sqp=8, n_qp_iter=12, mu_min=1e-6, w_max=1e6, reg_eps=1e-4,
                    regularization="gershgorin" if on_tpu else "mirror")
    planner = build_planner(model, modules, settings,
                            dtype=jnp.float32 if on_tpu else jnp.float64,
                            sqp_config=cfg, clock=clock)
    gmod = next(m for m in modules if isinstance(m, GuidanceConstraintModule))

    state = State(model)
    state.set("v", 0.8)
    peds = [Pedestrian(np.array([5.0, 3.0]), np.array([5.0, -4.0])),
            Pedestrian(np.array([9.0, -3.0]), np.array([9.0, 4.0])),
            Pedestrian(np.array([13.0, 2.5]), np.array([13.0, -4.0]))]
    psim = PedestrianSimulator(peds, dt=dt)
    ref_path = straight_path(length=25.0)

    recorder = SceneRecorder()
    log = MetricsLog()

    for step in range(60):
        data = RealTimeData()
        data.robot_area = define_robot_area(0.65, 0.65, 1)
        data.reference_path = ref_path
        data.dynamic_obstacles = ensure_obstacle_size(
            psim.get_obstacles(N), state, settings["max_obstacles"], N, dt)
        if step == 0:
            planner.on_data_received(data, "reference_path")

        out = planner.solve_mpc(state, data)
        a = planner.get_solution(0, "a") if out.success else -3.0
        w = planner.get_solution(0, "w") if out.success else 0.0
        x = np.array(model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt))
        x[model.state_index("v")] = max(x[model.state_index("v")], 0.0)
        state.set_array(x)
        psim.step([state.get_position()])
        clock.t += dt

        recorder.capture(clock.t, state, data, planner=planner, output=out,
                         guidance=gmod._optimizer.global_guidance)
        log.add(MPCMetrics(
            stamp=clock.t, robot_ns="jackal", planner_state="PLANNING_ACTIVE",
            solver_success=out.success, objective=out.objective,
            selected_topology_id=out.selected_topology_id,
            num_guidance_found=out.num_of_guidance_found,
            velocity=state.get("v"), position_x=state.get("x"),
            position_y=state.get("y")))
        if state.get("x") > 20.0:
            break

    print(render_dashboard(log))
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    png = recorder.render(os.path.join(out_dir, "demo_single_robot.png"),
                          frame_index=len(recorder.frames) // 2)
    js = recorder.save_json(os.path.join(out_dir, "demo_single_robot.json"))
    print(f"rendered {png}\nscene log {js}")


if __name__ == "__main__":
    main()
