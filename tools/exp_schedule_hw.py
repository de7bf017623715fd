#!/usr/bin/env python
"""Hardware confirm of inexact-SQP schedules on the 4608-problem T-MPC fleet.

Round-5 follow-up to tools/exp_iter_schedule.py (the CPU sweep): run the
candidate schedules through the REAL fused kernel on the TPU, measure
success and the on-device fleet step via chained-scan subtraction
((T(K)-T(1))/(K-1) — the tunnel's RTT cancels). Schedules come from
EXP_SCHEDULES (JSON list of [label, [[n,q],...]] pairs).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
    build_tmpc_fleet, tmpc_bench_ocp)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
    SQPConfig, make_fleet_sqp_solver)

BATCH = int(os.environ.get("EXP_BATCH", "512"))
N_PATHS = 8
K_CHAIN = 8

SCHEDULES = json.loads(os.environ.get("EXP_SCHEDULES", """[
  ["cur 4x4+4x8", [[4, 4], [4, 8]]],
  ["3ph 2x3+2x5+2x8", [[2, 3], [2, 5], [2, 8]]]
]"""))


def main():
    platform = jax.devices()[0].platform
    print(f"platform={platform} batch={BATCH}", flush=True)
    ocp, settings = tmpc_bench_ocp(N=20, n_paths=N_PATHS)
    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, BATCH)
    P = N_PATHS + 1
    B = BATCH * P
    fp = jnp.asarray(params.reshape(B, *params.shape[2:]), jnp.float32)
    fx = jnp.asarray(np.repeat(xinit, P, axis=0), jnp.float32)
    fz = jnp.asarray(z_init.reshape(B, *z_init.shape[2:]), jnp.float32)

    backend = "fused" if platform == "tpu" else "xla"
    for label, phases in SCHEDULES:
        n_sqp = sum(p[0] for p in phases)
        config = SQPConfig(
            n_sqp=n_sqp, n_qp_iter=phases[-1][1], mu_min=1e-6, w_max=1e6,
            reg_eps=1e-4,
            regularization="gershgorin" if platform == "tpu" else "mirror",
            track_best=False,
            qp_iter_schedule=tuple((int(n), int(q)) for n, q in phases))
        fleet = make_fleet_sqp_solver(ocp, config, dtype=jnp.float32,
                                      backend=backend)

        def make_chained(K):
            @jax.jit
            def chained(p_, x_, z_):
                def body(Z, k):
                    res = fleet(p_ + 1e-5 * k, x_, Z)
                    return res.z, jnp.sum(res.cost)
                _, costs = jax.lax.scan(
                    body, z_, jnp.arange(K, dtype=jnp.float32))
                return costs
            return chained

        t0 = time.time()
        res = fleet(fp, fx, fz)
        succ = float(np.mean(np.asarray(res.success)))
        plan_succ = float(np.mean(
            np.asarray(res.success).reshape(BATCH, P).any(axis=1)))
        print(f"{label:18s} compile+first {time.time()-t0:.0f}s "
              f"success {succ:.4f} plan_succ {plan_succ:.4f}", flush=True)

        c1, cK = make_chained(1), make_chained(K_CHAIN)
        for f in (c1, cK):
            float(jnp.sum(f(fp, fx, fz)))
        t1s, tKs = [], []
        for i in range(8):
            t0 = time.perf_counter()
            float(jnp.sum(c1(fp + 1e-6 * i, fx, fz)))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(cK(fp + 1e-6 * i, fx, fz)))
            tKs.append(time.perf_counter() - t0)
        step = (float(np.median(tKs)) - float(np.median(t1s))) / (K_CHAIN - 1)
        print(f"{label:18s} on-device fleet step {step*1e3:.2f} ms "
              f"({BATCH/step:.0f} plans/s)", flush=True)


if __name__ == "__main__":
    main()
