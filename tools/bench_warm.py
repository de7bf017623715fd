#!/usr/bin/env python
"""Dual warm-start measurement on the bench shape: pallas cold (n_sqp x
n_qp_iter) vs warm (1 cold + (n_sqp-1) x n_qp_iter_warm). Prints one JSON
line with timings, success rates, and cross-path agreement."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, make_fleet_sqp_solver)

    log(f"platform={jax.devices()[0].platform}")
    B = int(os.environ.get("BENCH_BATCH", "512"))
    N = int(os.environ.get("BENCH_N", "20"))
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=8)
    base = SQPConfig(n_sqp=10, n_qp_iter=15, mu_min=1e-6, w_max=1e6,
                     reg_eps=1e-4, regularization="gershgorin")

    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, B)
    P = params.shape[1]
    fp = jnp.asarray(params.reshape(B * P, *params.shape[2:]), jnp.float32)
    fx = jnp.asarray(np.repeat(xinit, P, axis=0), jnp.float32)
    fz = jnp.asarray(z_init.reshape(B * P, *z_init.shape[2:]), jnp.float32)

    results = {"batch": B * P, "plans": B, "horizon": N}

    def timeit(solve, n=8):
        out = solve(fp, fx, fz)
        float(jnp.sum(out.cost))
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            o = solve(fp + 1e-6 * i, fx, fz)
            float(jnp.sum(o.cost))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    variants = [("cold", base)]
    for k in (8, 6):
        variants.append((f"warm{k}", base._replace(n_qp_iter_warm=k)))

    ref_cost = None
    for name, cfg in variants:
        log(f"compile+run {name} ...")
        solve = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float32,
                                      backend="pallas")
        t, out = timeit(solve)
        cost = np.asarray(out.cost)
        ok = np.asarray(out.success)
        results[f"{name}_ms"] = round(t * 1e3, 2)
        results[f"{name}_plans_per_s"] = round(B / t, 1)
        results[f"{name}_success"] = round(float(np.mean(ok)), 4)
        if ref_cost is None:
            ref_cost, ref_ok = cost, ok
        else:
            both = ref_ok & ok
            rel = np.abs(cost[both] - ref_cost[both]) / (
                1.0 + np.abs(ref_cost[both]))
            results[f"{name}_cost_rel_p99_vs_cold"] = round(
                float(np.percentile(rel, 99)), 6)
        log(f"{name}: {results[f'{name}_ms']} ms "
            f"({results[f'{name}_plans_per_s']} plans/s), "
            f"success {results[f'{name}_success']}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
