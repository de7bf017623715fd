#!/usr/bin/env python
"""Linearization layout experiment: batch-leading vmap (status quo) vs
batch-minor vmap (in_axes/out_axes = -1) for build_qp at the fleet shape.

Hypothesis: (B*P, T, 7)-shaped elementwise chains waste the 128-lane axis on
the tiny minor dim; putting the batch on the minor axis gives full lanes.
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
    from oscar_mpc_planner_mr_modification_tpu.ops import sqp as sqp_mod
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig

    log(f"platform={jax.devices()[0].platform}")
    ocp, settings = tmpc_bench_ocp(N=20, n_paths=8)
    config = sqp_mod._f32_safe(
        SQPConfig(n_sqp=10, n_qp_iter=15, mu_min=1e-6, w_max=1e6, reg_eps=1e-4,
                  regularization="gershgorin"), jnp.float32)
    mach = sqp_mod._make_machinery(ocp, config, jnp.float32)

    B = 512
    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, B)
    P = params.shape[1]
    fp = jnp.asarray(params.reshape(B * P, *params.shape[2:]))
    fx = jnp.asarray(np.repeat(xinit, P, axis=0))
    fz = jnp.asarray(z_init.reshape(B * P, *z_init.shape[2:]))
    Pfull = jnp.concatenate([fp, fp[:, -1:]], axis=1)

    results = {}

    def timeit(fn, *args, n=8):
        out = fn(*args)
        float(jnp.sum(out))
        ts = []
        for i in range(n):
            a0 = args[0] + 1e-6 * i
            t0 = time.perf_counter()
            o = fn(a0, *args[1:])
            float(jnp.sum(o))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # Status quo: batch-leading vmap
    bq_lead = jax.vmap(mach.build_qp, in_axes=(0, 0, 0))

    @jax.jit
    def lin_lead(Z, Pf, x):
        def body(Zc, _):
            qp = bq_lead(Zc, Pf, x)
            return Zc + 1e-6 * qp.g, None
        Z, _ = jax.lax.scan(body, Z, None, length=10)
        return Z

    results["lead_ms"] = round(timeit(lin_lead, fz, Pfull, fx) * 1e3, 1)
    log(f"batch-leading: {results['lead_ms']} ms / 10 iters")

    # Batch-minor vmap
    bq_minor = jax.vmap(mach.build_qp, in_axes=(-1, -1, -1), out_axes=-1)
    fzT = jnp.transpose(fz, (1, 2, 0))
    PfT = jnp.transpose(Pfull, (1, 2, 0))
    fxT = jnp.transpose(fx, (1, 0))

    @jax.jit
    def lin_minor(Z, Pf, x):
        def body(Zc, _):
            qp = bq_minor(Zc, Pf, x)
            return Zc + 1e-6 * qp.g, None
        Z, _ = jax.lax.scan(body, Z, None, length=10)
        return Z

    results["minor_ms"] = round(timeit(lin_minor, fzT, PfT, fxT) * 1e3, 1)
    log(f"batch-minor: {results['minor_ms']} ms / 10 iters")

    # Batch-minor including the transposes a hybrid integration would pay
    @jax.jit
    def lin_minor_with_transpose(Z, Pf, x):
        ZT = jnp.transpose(Z, (1, 2, 0))
        PfT_ = jnp.transpose(Pf, (1, 2, 0))
        xT = jnp.transpose(x, (1, 0))

        def body(Zc, _):
            qp = bq_minor(Zc, PfT_, xT)
            return Zc + 1e-6 * qp.g, None
        ZT, _ = jax.lax.scan(body, ZT, None, length=10)
        return jnp.transpose(ZT, (2, 0, 1))

    results["minor_tr_ms"] = round(
        timeit(lin_minor_with_transpose, fz, Pfull, fx) * 1e3, 1)
    log(f"batch-minor+transposes: {results['minor_tr_ms']} ms / 10 iters")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
