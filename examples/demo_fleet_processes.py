#!/usr/bin/env python
"""Multi-process fleet over the socket transport + live web dashboard.

The deployment shape of the reference (one ROS node per robot, roscore in
the middle, rqt dashboard watching): three ``RobotAgent`` processes exchange
serialized trajectories through a :class:`~...transport.TransportBroker`,
while the parent serves a live browser dashboard
(:mod:`oscar_mpc_planner_mr_modification_tpu.dashboard_web`) fed by metric
snapshots the children stream back over a queue.

Run (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/demo_fleet_processes.py
"""

import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def robot_main(ns, index, address, start, goal, duration_s, metrics_q):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.factory import build_planner
    from oscar_mpc_planner_mr_modification_tpu.models import (
        SecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        EllipsoidConstraintModule, GoalModule, ModuleManager, MPCBaseModule)
    from oscar_mpc_planner_mr_modification_tpu.multirobot.driver import (
        RobotAgent)
    from oscar_mpc_planner_mr_modification_tpu.multirobot.transport import (
        SocketBus)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings(N=10, max_obstacles=2,
                                weights={"goal": 5.0},
                                JULES={"synchronized_start": True})
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(EllipsoidConstraintModule(settings))
    planner = build_planner(SecondOrderUnicycleModel(), mm, settings,
                            dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=4, n_qp_iter=8))
    # Compile before joining the fleet — a mid-episode JIT compile would
    # stall this robot's broadcasts and peers would plan on seconds-stale
    # trajectories (factory.prewarm_planner docstring).
    from oscar_mpc_planner_mr_modification_tpu.factory import prewarm_planner
    prewarm_planner(planner, SecondOrderUnicycleModel(), settings,
                    start_pose=start, goal=goal)
    bus = SocketBus(ns, address)
    agent = RobotAgent(ns, index, planner, SecondOrderUnicycleModel(),
                       settings, goal=np.asarray(goal, float), bus=bus,
                       clock=time.monotonic, start_pose=start)
    agent.set_peers([f"robot{i}" for i in range(3)])
    dt = float(settings["integrator_step"])
    t_end = time.monotonic() + duration_s
    while time.monotonic() < t_end:
        m = agent.tick()
        metrics_q.put(m)
        agent.apply_command(dt)
        time.sleep(0.03)
    bus.close()


def main():
    from oscar_mpc_planner_mr_modification_tpu.dashboard import (
        render_dashboard)
    from oscar_mpc_planner_mr_modification_tpu.dashboard_web import (
        DashboardServer)
    from oscar_mpc_planner_mr_modification_tpu.metrics import MetricsLog
    from oscar_mpc_planner_mr_modification_tpu.multirobot.transport import (
        TransportBroker)

    ctx = mp.get_context("spawn")
    broker = TransportBroker()
    q = ctx.Queue()
    starts = [(11.0, 0.0, 0.0), (19.0, 0.8, np.pi), (15.0, 4.0, -np.pi / 2)]
    goals = [(19.0, 0.0), (11.0, 0.8), (15.0, -3.0)]  # comparable ||goal|| norms: the reference normalizes the goal weight by 1/||goal||^2 (goal_module.py), so near-origin goals get ~50x effective weight and under-converge at small n_sqp
    duration = float(os.environ.get("FLEET_SECONDS", "20"))
    procs = [ctx.Process(target=robot_main,
                         args=(f"robot{i}", i, tuple(broker.address),
                               starts[i], goals[i], duration, q))
             for i in range(3)]
    for p in procs:
        p.start()

    log = MetricsLog()
    server = DashboardServer(log).start()
    print(f"live dashboard: {server.url}")
    deadline = time.monotonic() + duration + 60
    try:
        while any(p.is_alive() for p in procs) and time.monotonic() < deadline:
            try:
                log.add(q.get(timeout=0.5))
            except Exception:  # noqa: BLE001 — queue.Empty
                continue
        while not q.empty():
            log.add(q.get_nowait())
    finally:
        for p in procs:
            p.join(timeout=30)
            if p.is_alive():
                p.terminate()
        broker.close()
    print(render_dashboard(log))
    for ns in sorted(log.records):
        print(f"{ns}: {len(log.records[ns])} ticks, "
              f"comm rate {log.communication_rate(ns):.2f}")
    server.stop()


if __name__ == "__main__":
    main()
