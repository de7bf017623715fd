#!/usr/bin/env python
"""Validate the restructured QP kernel on hardware:
A. bench-config fleet step timing (vs 124.6 ms / 4109 plans/s on the old body)
B. safe-horizon config (m=40: 24 scenario halfspaces + slack/boxes) compile +
   solve — the configuration that overflowed VMEM with the old kernel.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, make_fleet_sqp_solver)
    from oscar_mpc_planner_mr_modification_tpu.parallel.batch import (
        make_batched_tmpc_step)

    results = {}
    log(f"platform={jax.devices()[0].platform}")
    ocp, settings = tmpc_bench_ocp(N=20, n_paths=8)
    config = SQPConfig(n_sqp=10, n_qp_iter=15, mu_min=1e-6, w_max=1e6,
                       reg_eps=1e-4, regularization="gershgorin")

    # A: bench-config throughput with the new kernel
    import os
    skip_a = os.environ.get("SKIP_A") == "1"
    step = make_batched_tmpc_step(ocp, config, dtype=jnp.float32,
                                  backend="pallas")
    B = 512
    args = tuple(map(jnp.asarray, build_tmpc_fleet(ocp, settings, B)))
    if skip_a:
        args = None
    if not skip_a:
        t_c = time.perf_counter()
        out = step(*args)
        float(jnp.sum(out.best_cost))
        results["bench_compile_s"] = round(time.perf_counter() - t_c, 1)
        log(f"bench compile {results['bench_compile_s']}s")
        ts = []
        for i in range(8):
            a = (args[0] + 1e-6 * i, args[1], args[2], args[3])
            t0 = time.perf_counter()
            o = step(*a)
            float(jnp.sum(o.best_cost))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        results["bench_step_ms"] = round(med * 1e3, 1)
        results["plans_per_s"] = round(B / med, 1)
        results["success"] = round(float(np.mean(np.asarray(o.any_success))), 4)
        log(f"bench step {results['bench_step_ms']} ms -> "
            f"{results['plans_per_s']}/s success={results['success']}")

    # B: safe-horizon m=40 operating point
    from oscar_mpc_planner_mr_modification_tpu import factory as F
    from oscar_mpc_planner_mr_modification_tpu.solver.ocp import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils.config import (
        default_settings)

    s2 = default_settings(N=20)
    model, mm = F.configuration_safe_horizon(s2)
    ocp2 = build_ocp(model, mm, s2)
    m2 = len(ocp2.ineq_row_spec())
    log(f"safe_horizon m={m2} nvar={ocp2.nvar}")
    fleet = make_fleet_sqp_solver(ocp2, config, dtype=jnp.float32,
                                  backend="pallas")
    reg = ocp2.registry
    idx = reg.save_map()
    N = ocp2.N
    Bs = 8
    P = np.zeros((Bs, N, ocp2.npar), dtype=np.float32)
    P[:, :, idx["acceleration"]] = 0.34
    P[:, :, idx["angular_velocity"]] = 0.85
    P[:, :, idx["contour"]] = 0.05
    P[:, :, idx["lag"]] = 0.75
    for i in range(s2["contouring"]["num_segments"]):
        P[:, :, idx[f"spline_x{i}_c"]] = 1.0
        P[:, :, idx[f"spline{i}_start"]] = 5.0 * i
    P[:, :, idx["velocity"]] = 0.55
    P[:, :, idx["reference_velocity"]] = 1.0
    P[:, :, idx["slack"]] = 1e4
    # Scenario halfspace rows: one real wall, rest inactive
    from oscar_mpc_planner_mr_modification_tpu.modules.scenario_constraints import (
        N_SCENARIO_CONSTRAINTS)
    for i in range(N_SCENARIO_CONSTRAINTS):
        P[:, :, idx[f"disc_0_scenario_constraint_{i}_a1"]] = 1.0
        P[:, :, idx[f"disc_0_scenario_constraint_{i}_a2"]] = 0.0
        P[:, :, idx[f"disc_0_scenario_constraint_{i}_b"]] = 1.0e4
    P[:, :, idx["disc_0_scenario_constraint_0_a1"]] = 0.0
    P[:, :, idx["disc_0_scenario_constraint_0_a2"]] = 1.0
    P[:, :, idx["disc_0_scenario_constraint_0_b"]] = 2.0  # y <= 2
    x0 = np.zeros((Bs, ocp2.nx), dtype=np.float32)
    x0[:, 3] = 1.0  # v
    z0 = np.zeros((Bs, N + 1, ocp2.nvar), dtype=np.float32)
    z0[:, :, ocp2.nu + 3] = 1.0
    z0[:, :, ocp2.nu] = np.arange(N + 1)[None] * 0.2  # x along path
    if ocp2.nvar > ocp2.nu + 4:
        z0[:, :, ocp2.nu + 4] = np.arange(N + 1)[None] * 0.2  # spline s
    t_c = time.perf_counter()
    res = fleet(jnp.asarray(P), jnp.asarray(x0), jnp.asarray(z0))
    float(jnp.sum(res.cost))
    results["sh_compile_s"] = round(time.perf_counter() - t_c, 1)
    results["sh_m"] = m2
    results["sh_success"] = round(float(np.mean(np.asarray(res.success))), 3)
    results["sh_finite"] = bool(np.isfinite(np.asarray(res.z)).all())
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        r = fleet(jnp.asarray(P) + 1e-6 * i, jnp.asarray(x0), jnp.asarray(z0))
        float(jnp.sum(r.cost))
        ts.append(time.perf_counter() - t0)
    results["sh_step_ms"] = round(float(np.median(ts)) * 1e3, 1)
    log(f"safe_horizon: {results}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
