#!/usr/bin/env python
"""Inexact-SQP iteration-budget experiment.

Question: can the fused solve spend fewer total QP iterations (the device-time
driver: ~69 us/QP-iter + ~0.3 ms/SQP-iter linearization at B=4608) by running
EARLY SQP iterations with looser QP solves, at unchanged success rate?

Method: chain fleet solvers (backend="xla", f32, CPU) — because the SQP
iteration is Markov in z when dual warm starts are off and track_best=False,
solver(n1, q1) |> solver(n2, q2) is EXACTLY an in-kernel schedule
[q1]*n1 + [q2]*n2. Cold-start T-MPC bench workload (benchmarks.build_tmpc_fleet).
"""

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

BATCH = int(os.environ.get("EXP_BATCH", "128"))
N = 20
N_PATHS = 8


def main():
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=N_PATHS)
    params, xinit, z_init, disabled = build_tmpc_fleet(ocp, settings, BATCH)
    P = N_PATHS + 1
    B = BATCH * P
    fp = jnp.asarray(params.reshape(B, *params.shape[2:]), jnp.float32)
    fx = jnp.asarray(np.repeat(xinit, P, axis=0), jnp.float32)
    fz = jnp.asarray(z_init.reshape(B, *z_init.shape[2:]), jnp.float32)

    base_kw = dict(mu_min=1e-6, w_max=1e6, reg_eps=1e-4,
                   regularization="mirror", track_best=False)

    solvers = {}

    def get_solver(n_sqp, n_qp):
        key = (n_sqp, n_qp)
        if key not in solvers:
            cfg = SQPConfig(n_sqp=n_sqp, n_qp_iter=n_qp, **base_kw)
            solvers[key] = make_fleet_sqp_solver(
                ocp, cfg, dtype=jnp.float32, backend="xla")
        return solvers[key]

    def run_schedule(phases):
        """phases: list of (n_sqp, n_qp). Returns final SQPResult."""
        z = fz
        res = None
        for n_sqp, n_qp in phases:
            res = get_solver(n_sqp, n_qp)(fp, fx, z)
            z = res.z
        return res

    # (label, phases). QP-iteration total and SQP count shown per row.
    import json
    CONFIGS = json.loads(os.environ.get("EXP_CONFIGS", """[
        ["base 10x8", [[10, 8]]],
        ["uniform 10x6", [[10, 6]]],
        ["uniform 10x5", [[10, 5]]],
        ["uniform 8x8", [[8, 8]]],
        ["uniform 6x8", [[6, 8]]],
        ["ramp 5x4+5x8", [[5, 4], [5, 8]]],
        ["ramp 6x4+4x8", [[6, 4], [4, 8]]],
        ["ramp 4x4+4x8", [[4, 4], [4, 8]]],
        ["ramp 5x5+3x10", [[5, 5], [3, 10]]]
    ]"""))

    base = None
    for label, phases in CONFIGS:
        t0 = time.perf_counter()
        res = run_schedule(phases)
        succ = np.asarray(res.success)
        cost = np.asarray(res.cost)
        dt_s = time.perf_counter() - t0
        n_sqp_tot = sum(p[0] for p in phases)
        n_qp_tot = sum(p[0] * p[1] for p in phases)
        # fused-step device-time model (docs/PERFORMANCE.md attribution):
        est_ms = 1.0 + 0.30 * n_sqp_tot + 0.069 * n_qp_tot
        plan_succ = succ.reshape(BATCH, P).any(axis=1).mean()
        line = (f"{label:16s} sqp={n_sqp_tot:2d} qp={n_qp_tot:3d} "
                f"est={est_ms:4.1f}ms succ={succ.mean():.4f} "
                f"plan_succ={plan_succ:.4f}")
        if base is None:
            base = (succ, cost)
            line += "  [baseline]"
        else:
            joint = base[0] & succ
            if joint.any():
                rel = np.abs(cost[joint] - base[1][joint]) / (
                    np.abs(base[1][joint]) + 1e-9)
                line += (f"  cost-vs-base median {np.median(rel):.2e} "
                         f"p99 {np.percentile(rel, 99):.2e}")
        print(line + f"  [{dt_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
