#!/usr/bin/env python
"""Phase-timing experiment for the latency-gate work (VERDICT round-1 #1).

Measures, on the real TPU through the tunnel:
  A. small-batch (B=8) Pallas fleet step: compile time + per-call latency
  B. throughput batch (B=512): compile time + per-call time
  C. small-batch XLA-backend step: compile time + per-call latency
  D. single-tick (B=1) Pallas step: compile time + latency

Each phase logs to stderr as it completes so a partial run is still useful.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
    from oscar_mpc_planner_mr_modification_tpu.parallel.batch import (
        make_batched_tmpc_step)

    platform = jax.devices()[0].platform
    log(f"import+devices: {time.perf_counter()-t0:.1f}s platform={platform}")

    N, n_paths = 20, 8
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=n_paths)
    config = SQPConfig(n_sqp=10, n_qp_iter=15, mu_min=1e-6, w_max=1e6,
                       reg_eps=1e-4,
                       regularization="gershgorin" if platform == "tpu"
                       else "mirror")

    results = {}

    def run_phase(name, step, args, n_calls):
        t_c = time.perf_counter()
        out = step(*args)
        float(jnp.sum(out.best_cost))
        compile_s = time.perf_counter() - t_c
        lat = []
        for i in range(n_calls):
            a = (args[0] + 1e-6 * (i + 1), args[1], args[2], args[3])
            t_i = time.perf_counter()
            out = step(*a)
            float(jnp.sum(out.best_cost))
            lat.append(time.perf_counter() - t_i)
        lat_ms = np.asarray(lat) * 1e3
        results[name] = {
            "compile_s": round(compile_s, 1),
            "batch": int(args[0].shape[0]),
            "median_ms": round(float(np.median(lat_ms)), 2),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "min_ms": round(float(np.min(lat_ms)), 2),
            "success": round(float(np.mean(np.asarray(out.any_success))), 4),
        }
        log(f"{name}: {results[name]}")

    step_pallas = make_batched_tmpc_step(ocp, config, dtype=jnp.float32,
                                         backend="pallas")
    big = build_tmpc_fleet(ocp, settings, 512)
    big = tuple(map(jnp.asarray, big))
    small = tuple(a[:8] for a in big)
    one = tuple(a[:1] for a in big)

    run_phase("A_small8_pallas", step_pallas, small, 20)
    run_phase("B_big512_pallas", step_pallas, big, 10)
    thr = 512 / (results["B_big512_pallas"]["median_ms"] / 1e3)
    log(f"throughput: {thr:.0f} plans/s")

    step_xla = make_batched_tmpc_step(ocp, config, dtype=jnp.float32,
                                      backend="xla")
    run_phase("C_small8_xla", step_xla, small, 20)
    run_phase("D_one_pallas", step_pallas, one, 20)

    results["total_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
