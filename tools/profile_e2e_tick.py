#!/usr/bin/env python
"""Profile host-side cost of the e2e single-robot tick (bench.py phase 4).

Runs on CPU (device dispatch is cheap there), so wall time per tick is
approximately host work + CPU compute; cProfile attribution shows where the
host milliseconds go (PRM, param fill, trajectory extraction, ...).
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.factory import (
        build_planner, configuration_tmpc_consistency_cost)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
    from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
        define_robot_area, ensure_obstacle_size)
    from oscar_mpc_planner_mr_modification_tpu.sim import (
        Pedestrian, PedestrianSimulator)
    from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import straight_path
    from oscar_mpc_planner_mr_modification_tpu.solver import State
    from oscar_mpc_planner_mr_modification_tpu.types import RealTimeData
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    N = int(os.environ.get("BENCH_N", "20"))
    dt = 0.2
    settings = default_settings(N=N, max_obstacles=3)
    model, modules = configuration_tmpc_consistency_cost(settings)
    config = SQPConfig(n_sqp=10, n_qp_iter=8, mu_min=1e-6, w_max=1e6,
                       reg_eps=1e-4, regularization="mirror",
                       track_best=False)

    class Clock:
        t = 0.0

        def __call__(self):
            return self.t

    clock = Clock()
    planner = build_planner(model, modules, settings, dtype=jnp.float32,
                            sqp_config=config, clock=clock)

    state = State(model)
    state.set("v", 0.8)
    peds = [Pedestrian(np.array([5.0, 3.0]), np.array([5.0, -4.0])),
            Pedestrian(np.array([9.0, -3.0]), np.array([9.0, 4.0])),
            Pedestrian(np.array([13.0, 2.5]), np.array([13.0, -4.0]))]
    psim = PedestrianSimulator(peds, dt=dt)
    ref_path = straight_path(length=25.0)

    def one_tick(step_i):
        data = RealTimeData()
        data.robot_area = define_robot_area(0.65, 0.65, 1)
        data.reference_path = ref_path
        data.dynamic_obstacles = ensure_obstacle_size(
            psim.get_obstacles(N), state, settings["max_obstacles"], N, dt)
        if step_i == 0:
            planner.on_data_received(data, "reference_path")
        t0 = time.perf_counter()
        out = planner.solve_mpc(state, data)
        tick = time.perf_counter() - t0
        a = planner.get_solution(0, "a") if out.success else -3.0
        w = planner.get_solution(0, "w") if out.success else 0.0
        x = np.array(model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt))
        x[model.state_index("v")] = max(x[model.state_index("v")], 0.0)
        state.set_array(x)
        psim.step([state.get_position()])
        clock.t += dt
        return tick

    # warmup/compile
    for i in range(4):
        t = one_tick(i)
        print(f"warm tick {i}: {t*1e3:.1f} ms", flush=True)

    pr = cProfile.Profile()
    times = []
    pr.enable()
    for i in range(4, 24):
        times.append(one_tick(i))
    pr.disable()
    times = np.asarray(times) * 1e3
    print(f"ticks: median {np.median(times):.2f} ms  "
          f"p90 {np.percentile(times, 90):.2f}  max {times.max():.2f}")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())




def host_only():
    """Measure per-tick HOST overhead: wall time of planner.solve_mpc minus
    the time spent inside the device solve call (the tunnel RTT + device
    compute on TPU). This is the number that adds to 1 RTT in the e2e tick."""
    import time as _t

    import jax.numpy as jnp
    import numpy as _np

    from oscar_mpc_planner_mr_modification_tpu.parallel import tmpc as _tmpc

    orig = _tmpc.TMPCOptimizer._solve_batch
    acc = {"dev": 0.0}

    def timed(self, *a, **k):
        t0 = _t.perf_counter()
        # time ONLY the compiled fn call: re-implement the cached fast path
        n = self.solver.select_iterations() if self._packed_solve else None
        fn = self._packed_solve.get(n) if self._packed_solve else None
        if fn is None:
            return orig(self, *a, **k)
        T, nz = self.solver.N + 1, self.solver.nvar
        t1 = _t.perf_counter()
        out = fn(*a)
        acc["dev"] += _t.perf_counter() - t1
        self.solver.note_solve_time(n, _t.perf_counter() - t1, compile_call=False)
        from oscar_mpc_planner_mr_modification_tpu.ops.sqp import unpack_results
        return unpack_results(out, T, nz)

    _tmpc.TMPCOptimizer._solve_batch = timed
    try:
        globals()["_HOST_ACC"] = acc
        main_host(acc)
    finally:
        _tmpc.TMPCOptimizer._solve_batch = orig


def main_host(acc):
    # duplicate of main()'s setup but reporting host-only numbers
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.factory import (
        build_planner, configuration_tmpc_consistency_cost)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
    from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
        define_robot_area, ensure_obstacle_size)
    from oscar_mpc_planner_mr_modification_tpu.sim import (
        Pedestrian, PedestrianSimulator)
    from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import straight_path
    from oscar_mpc_planner_mr_modification_tpu.solver import State
    from oscar_mpc_planner_mr_modification_tpu.types import RealTimeData
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    N = int(os.environ.get("BENCH_N", "20"))
    dt = 0.2
    settings = default_settings(N=N, max_obstacles=3)
    model, modules = configuration_tmpc_consistency_cost(settings)
    config = SQPConfig(n_sqp=10, n_qp_iter=8, mu_min=1e-6, w_max=1e6,
                       reg_eps=1e-4, regularization="mirror",
                       track_best=False)

    class Clock:
        t = 0.0

        def __call__(self):
            return self.t

    clock = Clock()
    planner = build_planner(model, modules, settings, dtype=jnp.float32,
                            sqp_config=config, clock=clock)
    state = State(model)
    state.set("v", 0.8)
    peds = [Pedestrian(np.array([5.0, 3.0]), np.array([5.0, -4.0])),
            Pedestrian(np.array([9.0, -3.0]), np.array([9.0, 4.0])),
            Pedestrian(np.array([13.0, 2.5]), np.array([13.0, -4.0]))]
    psim = PedestrianSimulator(peds, dt=dt)
    ref_path = straight_path(length=25.0)

    import cProfile, pstats, io
    pr = cProfile.Profile()
    hosts = []
    for step_i in range(40):
        data = RealTimeData()
        data.robot_area = define_robot_area(0.65, 0.65, 1)
        data.reference_path = ref_path
        data.dynamic_obstacles = ensure_obstacle_size(
            psim.get_obstacles(N), state, settings["max_obstacles"], N, dt)
        if step_i == 0:
            planner.on_data_received(data, "reference_path")
        acc["dev"] = 0.0
        if step_i == 4 and os.environ.get("PROFILE"):
            pr.enable()
        t0 = time.perf_counter()
        out = planner.solve_mpc(state, data)
        tick = time.perf_counter() - t0
        if step_i >= 4:
            hosts.append(tick - acc["dev"])
        a = planner.get_solution(0, "a") if out.success else -3.0
        w = planner.get_solution(0, "w") if out.success else 0.0
        x = np.array(model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt))
        x[model.state_index("v")] = max(x[model.state_index("v")], 0.0)
        state.set_array(x)
        psim.step([state.get_position()])
        clock.t += dt
    pr.disable()
    h = np.asarray(hosts) * 1e3
    print(f"HOST-ONLY per tick: median {np.median(h):.2f} ms  "
          f"p90 {np.percentile(h, 90):.2f}  max {h.max():.2f}")
    if os.environ.get("PROFILE"):
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(60)
        print(s.getvalue())


if __name__ == "__main__" and os.environ.get("HOST_ONLY"):
    host_only()
    sys.exit(0)


if __name__ == "__main__" and not os.environ.get("HOST_ONLY"):
    main()
