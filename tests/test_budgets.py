"""Host-side time budgets for the per-tick work outside the device solve.

The reference's 25-35 ms tick includes its host-side equivalents (PRM search
1-5 ms, guidance_constraints.cpp:78-129; setParameters loops :346-359). These
tests pin the TPU build's host costs so they never silently grow to dominate
a tick. Bounds are generous vs typical measurements to stay CI-stable.
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.utils import default_settings


def _median_time(fn, n=7):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def test_scenario_fill_host_budget():
    """SH-MPC support-selection fill (parallel/scenario.py) at the reference
    sizing: 4 parallel solvers x N=30 stages, 128 integrated scenario samples,
    3 obstacles, 24 constraint rows per stage."""
    from oscar_mpc_planner_mr_modification_tpu import factory as F
    from oscar_mpc_planner_mr_modification_tpu.modules.scenario_constraints import (
        ScenarioConstraintModule)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
    from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
        get_constant_velocity_prediction)
    from oscar_mpc_planner_mr_modification_tpu.solver import Solver, build_ocp
    from oscar_mpc_planner_mr_modification_tpu.types import (DynamicObstacle,
                                                             RealTimeData)

    N, dt = 30, 0.2
    settings = default_settings(N=N, max_obstacles=3,
                                probabilistic={"enable": True})
    model, mm = F.configuration_safe_horizon(settings)
    ocp = build_ocp(model, mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64,
                    sqp_config=SQPConfig(n_sqp=2, n_qp_iter=6))
    smod = next(m for m in mm if isinstance(m, ScenarioConstraintModule))
    opt = smod._optimizer(solver) if callable(
        getattr(smod, "_optimizer", None)) else None
    from oscar_mpc_planner_mr_modification_tpu.parallel.scenario import (
        ScenarioOptimizer)

    opt = ScenarioOptimizer(solver, settings, seed=0)

    data = RealTimeData()
    rng = np.random.default_rng(0)
    for i in range(3):
        pos = np.array([2.0 + i, 0.5 - 0.5 * i])
        obs = DynamicObstacle(index=i, position=pos, radius=0.3)
        obs.prediction = get_constant_velocity_prediction(
            pos, rng.uniform(-0.3, 0.3, 2), dt, N, probabilistic=True)
        data.dynamic_obstacles.append(obs)

    opt.sample_scenarios(data)
    assert opt._samples is not None
    P = opt.n_solvers
    params = np.repeat(solver.params.data[None], P, axis=0)
    warmstarts = np.zeros((P, N + 1, solver.nvar))
    ix, iy = model.var_index("x"), model.var_index("y")
    warmstarts[:, :, ix] = np.linspace(0, 6, N + 1)[None]

    def fill():
        opt._fill_scenario_constraints(params, warmstarts, ix, iy)

    fill()  # warm caches
    med = _median_time(fill)
    # Typical ~5-10 ms for 4 x 29 greedy selections over 384 discs;
    # generous CI bound: must stay well under a 50 ms control period
    assert med < 0.04, f"scenario fill too slow: {med * 1e3:.1f} ms"


def test_prm_search_budget_native():
    """Native guidance PRM within the reference's search budget
    (1-5 ms, docs/guidance_constraints_documentation.md:1335; generous x2
    bound for CI). Skips when the native backend cannot build."""
    from oscar_mpc_planner_mr_modification_tpu.guidance import cpp_backend
    from oscar_mpc_planner_mr_modification_tpu.guidance.global_guidance import (
        GlobalGuidance, GuidanceConfig, Goal)

    if not cpp_backend.available():
        pytest.skip("native PRM backend unavailable")

    N, dt = 30, 0.2
    cfg = GuidanceConfig(N=N, dt=dt, n_paths=4, n_samples=30, seed=1)
    g = GlobalGuidance(cfg, backend="cpp")
    g.set_start(np.zeros(2), 0.0, 1.0)
    goals = [Goal(np.array([6.0, y]), cost=abs(y)) for y in
             np.linspace(-2.0, 2.0, 6)]
    g.set_goals(goals)
    rng = np.random.default_rng(2)
    trajs = np.zeros((4, N + 1, 2))
    for i in range(4):
        p0 = np.array([2.0 + i, rng.uniform(-1, 1)])
        v = rng.uniform(-0.3, 0.3, 2)
        trajs[i] = p0[None] + v[None] * (np.arange(N + 1) * dt)[:, None]
    g.load_obstacles(trajs, np.full(4, 0.3))

    assert g.update()  # warm (builds the .so on first use)
    med = _median_time(g.update, n=9)
    assert med < 0.010, f"native PRM too slow: {med * 1e3:.2f} ms"
    assert len(g.trajectories) >= 1


def test_prm_python_fallback_bounded():
    """The portable Python PRM stays usable (the reference budget x ~10)."""
    from oscar_mpc_planner_mr_modification_tpu.guidance.global_guidance import (
        GlobalGuidance, GuidanceConfig, Goal)

    N, dt = 20, 0.2
    cfg = GuidanceConfig(N=N, dt=dt, n_paths=4, n_samples=30, seed=1)
    g = GlobalGuidance(cfg, backend="python")
    g.set_start(np.zeros(2), 0.0, 1.0)
    g.set_goals([Goal(np.array([5.0, y]), cost=abs(y)) for y in
                 np.linspace(-1.5, 1.5, 5)])
    g.load_obstacles(np.tile(np.array([2.5, 0.0]), (1, N + 1, 1)),
                     np.array([0.4]))
    assert g.update()
    med = _median_time(g.update, n=5)
    assert med < 0.08, f"python PRM too slow: {med * 1e3:.1f} ms"


def test_solver_settings_qp_iter_schedule_plumbing():
    """solver_settings.qp_iter_schedule reaches the SQPConfig and the ladder
    (the settings-file analog of the reference's solver-option yaml)."""
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.models import (
        SecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        GoalModule, ModuleManager, MPCBaseModule)
    from oscar_mpc_planner_mr_modification_tpu.solver import Solver, build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings(N=6, max_obstacles=0)
    settings["solver_settings"]["qp_iter_schedule"] = [[2, 4], [2, 8]]
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    ocp = build_ocp(SecondOrderUnicycleModel(), mm, settings)
    solver = Solver(ocp, settings, dtype=jnp.float64)
    assert solver.config.qp_iter_schedule == ((2, 4), (2, 8))
    assert solver.config.n_sqp == 4
    # Ladder full count equals the schedule total
    assert max(solver._iter_ladder) == 4
