#!/usr/bin/env python
"""Phase split for the lane pipeline vs batch-major on TPU at the bench shape:
(a) lane linearization only, (b) lane kernel only, (c) batch-major
linearization only, (d) batch-major kernel only. 10 chained iterations each.
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
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops import sqp as sqp_mod
    from oscar_mpc_planner_mr_modification_tpu.ops.linearize import (
        make_lane_linearizer)
    from oscar_mpc_planner_mr_modification_tpu.ops.qp_pallas import (
        solve_qp_batched, solve_qp_lanes)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig

    log(f"platform={jax.devices()[0].platform}")
    B = int(os.environ.get("BENCH_BATCH", "512"))
    N = int(os.environ.get("BENCH_N", "20"))
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=8)
    config = sqp_mod._f32_safe(
        SQPConfig(n_sqp=10, n_qp_iter=15, mu_min=1e-6, w_max=1e6, reg_eps=1e-4,
                  regularization="gershgorin"), jnp.float32)
    mach = sqp_mod._make_machinery(ocp, config, jnp.float32)
    lin = make_lane_linearizer(ocp, config, jnp.float32)

    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, B)
    P = params.shape[1]
    fp = jnp.asarray(params.reshape(B * P, *params.shape[2:]), jnp.float32)
    fx = jnp.asarray(np.repeat(xinit, P, axis=0), jnp.float32)
    fz = jnp.asarray(z_init.reshape(B * P, *z_init.shape[2:]), jnp.float32)
    Pfull = jnp.concatenate([fp, fp[:, -1:]], axis=1)
    P_cols = jnp.transpose(Pfull, (2, 1, 0))
    Z_cols = jnp.transpose(fz, (1, 2, 0))
    x_cols = jnp.transpose(fx, (1, 0))

    results = {"batch": B * P, "horizon": N}

    def timeit(fn, *args, n=6):
        out = fn(*args)
        float(jnp.sum(out))
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            o = fn(args[0] + 1e-6 * i, *args[1:])
            float(jnp.sum(o))
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)) * 1e3, 2)

    # (a) lane linearization only (10 chained)
    @jax.jit
    def lane_lin_only(Z, Pc, xc):
        def body(Zc, _):
            qp = lin(Pc, Zc, xc)
            return Zc + 1e-6 * qp.g, None
        Z, _ = jax.lax.scan(body, Z, None, length=10)
        return Z

    results["lane_lin_ms"] = timeit(lane_lin_only, Z_cols, P_cols, x_cols)
    log(f"lane lin x10: {results['lane_lin_ms']} ms")

    # (c) batch-major linearization only
    bq = jax.vmap(mach.build_qp, in_axes=(0, 0, 0))

    @jax.jit
    def bm_lin_only(Z, Pf, x):
        def body(Zc, _):
            qp = bq(Zc, Pf, x)
            return Zc + 1e-6 * qp.g, None
        Z, _ = jax.lax.scan(body, Z, None, length=10)
        return Z

    results["bm_lin_ms"] = timeit(bm_lin_only, fz, Pfull, fx)
    log(f"batch-major lin x10: {results['bm_lin_ms']} ms")

    # (b) lane kernel only (10 chained on fixed QP fields)
    qp_lane = jax.jit(lambda Pc, Zc, xc: lin(Pc, Zc, xc))(
        P_cols, Z_cols, x_cols)

    @jax.jit
    def lane_kernel_only(e, qp):
        def body(ec, _):
            dz = solve_qp_lanes(
                qp._replace(e=ec), mach.stage_mask, nu=mach.nu,
                n_iters=config.n_qp_iter, mu_min=config.mu_min,
                w_max=config.w_max, row_meta=mach.row_meta)
            return ec + 1e-6 * jnp.mean(dz), None
        e, _ = jax.lax.scan(body, e, None, length=10)
        return e

    results["lane_kernel_ms"] = timeit(lane_kernel_only, qp_lane.e, qp_lane)
    log(f"lane kernel x10: {results['lane_kernel_ms']} ms")

    # (d) batch-major kernel only
    qp_bm = jax.jit(lambda Z, Pf, x: bq(Z, Pf, x))(fz, Pfull, fx)

    @jax.jit
    def bm_kernel_only(e, qp):
        def body(ec, _):
            dz = solve_qp_batched(
                qp.H, qp.g, qp.A, qp.B, qp.c, qp.D, ec, mach.stage_mask,
                qp.r0, nu=mach.nu, n_iters=config.n_qp_iter,
                mu_min=config.mu_min, w_max=config.w_max,
                row_meta=mach.row_meta)
            return ec + 1e-6 * jnp.mean(dz), None
        e, _ = jax.lax.scan(body, e, None, length=10)
        return e

    results["bm_kernel_ms"] = timeit(bm_kernel_only, qp_bm.e, qp_bm)
    log(f"batch-major kernel x10: {results['bm_kernel_ms']} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
