#!/usr/bin/env python
"""BASELINE configuration matrix on hardware: fleet-solve timing + success for
the five reference workload flavors (SURVEY.md §7 / driver BASELINE configs):

  1. goal      — goal-tracking + 3 ellipsoidal obstacles (nx=4)
  2. contour   — MPCC contouring + ellipsoidal obstacles (nx=5)
  3. ccmpc     — CC-MPC Gaussian chance constraints (contouring model)
  4. tmpc      — T-MPC++ fleet (the bench.py headline config)
  5. shmpc     — SH-MPC safe horizon (24 scenario halfspaces + slack, m=40)

Each runs a B-plan fleet solve (fused whole-SQP kernel, with runtime
fallback to the per-iteration pallas backend; override with
BENCH_MATRIX_BACKEND) and reports median per-call wall time through the
tunnel + success rate. Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _straight_spline(P, idx, settings):
    for i in range(settings["contouring"]["num_segments"]):
        P[..., idx[f"spline_x{i}_c"]] = 1.0
        P[..., idx[f"spline{i}_start"]] = 5.0 * i


def build_goal(N, B, rng):
    from oscar_mpc_planner_mr_modification_tpu.models import (
        SecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        EllipsoidConstraintModule, GoalModule, ModuleManager, MPCBaseModule)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings(N=N, max_obstacles=3)
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mm.add_module(GoalModule(settings))
    mm.add_module(EllipsoidConstraintModule(settings))
    ocp = build_ocp(SecondOrderUnicycleModel(), mm, settings)
    idx = ocp.registry.save_map()
    P = np.zeros((B, N, ocp.npar), dtype=np.float32)
    P[..., idx["acceleration"]] = 0.34
    P[..., idx["angular_velocity"]] = 0.85
    P[..., idx["goal_weight"]] = 1.0
    P[..., idx["goal_x"]] = rng.uniform(4.0, 6.0, B)[:, None]
    P[..., idx["goal_y"]] = rng.uniform(-1.5, 1.5, B)[:, None]
    P[..., idx["ego_disc_radius"]] = 0.325
    for i, (ox, oy) in enumerate([(2.0, 0.4), (3.5, 1.2), (4.5, 0.2)]):
        P[..., idx[f"ellipsoid_obst_{i}_x"]] = ox
        P[..., idx[f"ellipsoid_obst_{i}_y"]] = oy
        P[..., idx[f"ellipsoid_obst_{i}_chi"]] = 1.0
        P[..., idx[f"ellipsoid_obst_{i}_r"]] = 0.3
    x0 = np.tile(np.array([0.0, 0.0, 0.0, 0.5], np.float32), (B, 1))
    z0 = np.zeros((B, N + 1, ocp.nvar), dtype=np.float32)
    z0[:, :, ocp.nu:] = x0[:, None, :]
    return ocp, P, x0, z0


def _contouring_base(N, B, rng, extra_modules):
    from oscar_mpc_planner_mr_modification_tpu.models import (
        ContouringSecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        ContouringModule, ModuleManager, MPCBaseModule)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings(N=N, max_obstacles=3)
    mm = ModuleManager()
    base = mm.add_module(MPCBaseModule(settings))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable("v", ["velocity", "reference_velocity"],
                        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)
    mm.add_module(ContouringModule(settings))
    for mod_cls in extra_modules:
        mm.add_module(mod_cls(settings))
    ocp = build_ocp(ContouringSecondOrderUnicycleModel(), mm, settings)
    idx = ocp.registry.save_map()
    P = np.zeros((B, N, ocp.npar), dtype=np.float32)
    w = settings["weights"]
    P[..., idx["acceleration"]] = w["acceleration"]
    P[..., idx["angular_velocity"]] = w["angular_velocity"]
    P[..., idx["velocity"]] = w["velocity"]
    P[..., idx["reference_velocity"]] = w["reference_velocity"]
    P[..., idx["contour"]] = w["contour"]
    P[..., idx["lag"]] = w["lag"]
    P[..., idx["terminal_angle"]] = w["terminal_angle"]
    P[..., idx["terminal_contouring"]] = w["terminal_contouring"]
    _straight_spline(P, idx, settings)
    P[..., idx["ego_disc_radius"]] = 0.325
    x0 = np.tile(np.array([0.0, 0.0, 0.0, 1.0, 0.0], np.float32), (B, 1))
    z0 = np.zeros((B, N + 1, ocp.nvar), dtype=np.float32)
    z0[:, :, ocp.nu:] = x0[:, None, :]
    z0[:, :, ocp.nu] = np.arange(N + 1)[None] * 0.2
    z0[:, :, ocp.nu + 4] = z0[:, :, ocp.nu]
    return ocp, settings, idx, P, x0, z0


def build_contour(N, B, rng):
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        EllipsoidConstraintModule)

    ocp, settings, idx, P, x0, z0 = _contouring_base(
        N, B, rng, [EllipsoidConstraintModule])
    for i in range(3):
        P[..., idx[f"ellipsoid_obst_{i}_x"]] = rng.uniform(2.0, 7.0, B)[:, None]
        P[..., idx[f"ellipsoid_obst_{i}_y"]] = rng.uniform(-1.2, 1.2, B)[:, None]
        P[..., idx[f"ellipsoid_obst_{i}_chi"]] = 1.0
        P[..., idx[f"ellipsoid_obst_{i}_r"]] = 0.3
        P[:, 0, idx[f"ellipsoid_obst_{i}_x"]] = 50.0
    return ocp, P, x0, z0


def build_ccmpc(N, B, rng):
    from oscar_mpc_planner_mr_modification_tpu.modules import (
        GaussianConstraintModule)

    ocp, settings, idx, P, x0, z0 = _contouring_base(
        N, B, rng, [GaussianConstraintModule])
    for i in range(3):
        P[..., idx[f"gaussian_obst_{i}_x"]] = rng.uniform(2.5, 7.0, B)[:, None]
        P[..., idx[f"gaussian_obst_{i}_y"]] = rng.uniform(-1.2, 1.2, B)[:, None]
        P[..., idx[f"gaussian_obst_{i}_major"]] = 0.2
        P[..., idx[f"gaussian_obst_{i}_minor"]] = 0.15
        P[..., idx[f"gaussian_obst_{i}_risk"]] = 0.05
        P[..., idx[f"gaussian_obst_{i}_r"]] = 0.3
        P[:, 0, idx[f"gaussian_obst_{i}_x"]] = 50.0
    return ocp, P, x0, z0


def build_shmpc(N, B, rng):
    from oscar_mpc_planner_mr_modification_tpu import factory as F
    from oscar_mpc_planner_mr_modification_tpu.modules.scenario_constraints import (
        N_SCENARIO_CONSTRAINTS)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings(N=N)
    model, mm = F.configuration_safe_horizon(settings)
    ocp = build_ocp(model, mm, settings)
    idx = ocp.registry.save_map()
    P = np.zeros((B, N, ocp.npar), dtype=np.float32)
    P[..., idx["acceleration"]] = 0.34
    P[..., idx["angular_velocity"]] = 0.85
    P[..., idx["contour"]] = 0.05
    P[..., idx["lag"]] = 0.75
    P[..., idx["velocity"]] = 0.55
    P[..., idx["reference_velocity"]] = 1.0
    P[..., idx["slack"]] = 1e4
    _straight_spline(P, idx, settings)
    for i in range(N_SCENARIO_CONSTRAINTS):
        P[..., idx[f"disc_0_scenario_constraint_{i}_a1"]] = 1.0
        P[..., idx[f"disc_0_scenario_constraint_{i}_b"]] = 1.0e4
    # Two active walls per instance (random corridor)
    off = rng.uniform(1.2, 2.5, B)[:, None]
    P[..., idx["disc_0_scenario_constraint_0_a1"]] = 0.0
    P[..., idx["disc_0_scenario_constraint_0_a2"]] = 1.0
    P[..., idx["disc_0_scenario_constraint_0_b"]] = off
    P[..., idx["disc_0_scenario_constraint_1_a1"]] = 0.0
    P[..., idx["disc_0_scenario_constraint_1_a2"]] = -1.0
    P[..., idx["disc_0_scenario_constraint_1_b"]] = off
    x0 = np.zeros((B, ocp.nx), dtype=np.float32)
    x0[:, 3] = 1.0
    z0 = np.zeros((B, N + 1, ocp.nvar), dtype=np.float32)
    z0[:, :, ocp.nu + 3] = 1.0
    z0[:, :, ocp.nu] = np.arange(N + 1)[None] * 0.2
    z0[:, :, ocp.nu + 4] = z0[:, :, ocp.nu]
    return ocp, P, x0, z0


def main():
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, make_fleet_sqp_solver)

    log(f"platform={jax.devices()[0].platform}")
    N = int(os.environ.get("BENCH_N", "20"))
    B = int(os.environ.get("BENCH_MATRIX_B", "512"))
    rng = np.random.default_rng(0)
    # Same operating point as bench.py: round-5 3-phase inexact-SQP schedule
    # 2x(qp=3)+2x(qp=5)+2x(qp=8) — hardware-measured better success AND ~2x
    # device rate vs the uniform 10x8 baseline (see docs/PERFORMANCE.md).
    # Override with BENCH_MATRIX_UNIFORM=1 for the old uniform baseline.
    if os.environ.get("BENCH_MATRIX_UNIFORM"):
        cfg = SQPConfig(n_sqp=10, n_qp_iter=8, mu_min=1e-6, w_max=1e6,
                        reg_eps=1e-4, regularization="gershgorin",
                        track_best=False)
    else:
        cfg = SQPConfig(n_sqp=6, n_qp_iter=8, mu_min=1e-6, w_max=1e6,
                        reg_eps=1e-4, regularization="gershgorin",
                        track_best=False,
                        qp_iter_schedule=((2, 3), (2, 5), (2, 8)))

    backends = ([os.environ["BENCH_MATRIX_BACKEND"]]
                if os.environ.get("BENCH_MATRIX_BACKEND")
                else ["fused", "pallas"])

    def build_fleet_with_fallback(ocp, args):
        last = None
        for be in backends:
            try:
                fleet = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float32,
                                              backend=be)
                out = fleet(*args)
                float(jnp.sum(out.cost))
                return fleet, out, be
            except Exception as exc:
                log(f"backend {be} failed: {exc}")
                last = exc
        raise last

    results = {"batch": B, "horizon": N}

    cases = [("goal", build_goal), ("contour", build_contour),
             ("ccmpc", build_ccmpc), ("shmpc", build_shmpc)]
    for name, builder in cases:
        log(f"--- {name}: build + compile ...")
        ocp, P, x0, z0 = builder(N, B, rng)
        args = (jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z0))
        t_c = time.perf_counter()
        fleet, out, be = build_fleet_with_fallback(ocp, args)
        results[f"{name}_backend"] = be
        compile_s = time.perf_counter() - t_c
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            o = fleet(args[0] + 1e-6 * i, args[1], args[2])
            float(jnp.sum(o.cost))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        results[f"{name}_ms"] = round(med * 1e3, 1)
        results[f"{name}_plans_per_s"] = round(B / med, 1)
        results[f"{name}_success"] = round(
            float(np.mean(np.asarray(out.success))), 4)
        results[f"{name}_m_rows"] = len(ocp.ineq_row_spec())
        log(f"{name}: {results[f'{name}_ms']} ms ({B} plans), success "
            f"{results[f'{name}_success']}, compile {compile_s:.0f}s")

    # T-MPC headline config (9 planners per plan)
    log("--- tmpc: build + compile ...")
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=8)
    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, B)
    Pq = params.shape[1]
    fp = jnp.asarray(params.reshape(B * Pq, *params.shape[2:]), jnp.float32)
    fx = jnp.asarray(np.repeat(xinit, Pq, axis=0), jnp.float32)
    fz = jnp.asarray(z_init.reshape(B * Pq, *z_init.shape[2:]), jnp.float32)
    fleet, out, be = build_fleet_with_fallback(ocp, (fp, fx, fz))
    results["tmpc_backend"] = be
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        o = fleet(fp + 1e-6 * i, fx, fz)
        float(jnp.sum(o.cost))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    results["tmpc_ms"] = round(med * 1e3, 1)
    results["tmpc_plans_per_s"] = round(B / med, 1)
    results["tmpc_success"] = round(float(np.mean(np.asarray(out.success))), 4)
    results["tmpc_m_rows"] = len(ocp.ineq_row_spec())
    log(f"tmpc: {results['tmpc_ms']} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
