#!/usr/bin/env python
"""Where does the T-MPC step spend its time? (VERDICT round-1 #7 groundwork)

Measures, at the bench fleet shape (B=512 plans x 9 planners = 4608 instances):
  lin:    10x build_qp (linearization: cost quadratics + dynamics jacobians +
          constraint rows) — the XLA side of each SQP iteration
  qp:     10x fused Pallas QP kernel on fixed QP data
  full:   the complete batched T-MPC step (10 SQP iterations + selection)
And the chained-scan latency probe at B=8: K dependent solver calls inside ONE
dispatch -> per-step on-device time = (T(K) - T(1)) / (K - 1); the remainder of
a single call is the tunnel RTT.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timeit(fn, n=8):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops import sqp as sqp_mod
    from oscar_mpc_planner_mr_modification_tpu.ops.qp_pallas import (
        solve_qp_batched)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
    from oscar_mpc_planner_mr_modification_tpu.parallel.batch import (
        make_batched_tmpc_step)

    platform = jax.devices()[0].platform
    log(f"platform={platform}")
    ocp, settings = tmpc_bench_ocp(N=20, n_paths=8)
    config = SQPConfig(n_sqp=10, n_qp_iter=15, mu_min=1e-6, w_max=1e6,
                       reg_eps=1e-4, regularization="gershgorin")
    config = sqp_mod._f32_safe(config, jnp.float32)
    mach = sqp_mod._make_machinery(ocp, config, jnp.float32)

    B = 512
    params, xinit, z_init, disabled = build_tmpc_fleet(ocp, settings, B)
    P = params.shape[1]
    flat_params = jnp.asarray(params.reshape(B * P, *params.shape[2:]))
    flat_x = jnp.asarray(np.repeat(xinit, P, axis=0))
    flat_z = jnp.asarray(z_init.reshape(B * P, *z_init.shape[2:]))

    build_qp_v = jax.vmap(mach.build_qp, in_axes=(0, 0, 0))

    @jax.jit
    def lin_only(fp, fx, fz):
        def body(Z, _):
            qp = build_qp_v(Z, jnp.concatenate([fp, fp[:, -1:]], axis=1), fx)
            # Fold the QP into a cheap update so nothing is dead-code-eliminated
            Z = Z + 1e-6 * qp.g
            return Z, None
        Z, _ = jax.lax.scan(body, fz, None, length=10)
        return Z

    results = {}
    out = lin_only(flat_params, flat_x, flat_z)
    float(jnp.sum(out))
    t = timeit(lambda i: float(jnp.sum(lin_only(flat_params + 1e-6 * i,
                                                flat_x, flat_z))))
    results["lin10_ms"] = round(t * 1e3, 1)
    log(f"lin x10: {results['lin10_ms']} ms")

    # Fixed QP data for the kernel-only loop
    Pfull = jnp.concatenate([flat_params, flat_params[:, -1:]], axis=1)
    qp0 = jax.jit(build_qp_v)(flat_z, Pfull, flat_x)
    qp0 = jax.tree.map(lambda x: jax.device_put(x), qp0)

    @jax.jit
    def qp_only(qp, fz):
        def body(Z, k):
            dz = solve_qp_batched(
                qp.H + 1e-7 * k, qp.g, qp.A, qp.B, qp.c, qp.D, qp.e,
                mach.row_mask, qp.r0, nu=mach.nu, n_iters=config.n_qp_iter,
                mu_min=config.mu_min, w_max=config.w_max)
            return Z + 1e-6 * dz, None
        Z, _ = jax.lax.scan(body, fz, jnp.arange(10, dtype=jnp.float32))
        return Z

    out = qp_only(qp0, flat_z)
    float(jnp.sum(out))
    t = timeit(lambda i: float(jnp.sum(qp_only(
        jax.tree.map(lambda x: x, qp0)._replace(g=qp0.g + 1e-6 * i), flat_z))))
    results["qp10_ms"] = round(t * 1e3, 1)
    log(f"qp x10: {results['qp10_ms']} ms")

    step = make_batched_tmpc_step(ocp, config, dtype=jnp.float32,
                                  backend="pallas")
    args = tuple(map(jnp.asarray, (params, xinit, z_init, disabled)))
    out = step(*args)
    float(jnp.sum(out.best_cost))
    t = timeit(lambda i: float(jnp.sum(step(args[0] + 1e-6 * i, args[1],
                                            args[2], args[3]).best_cost)))
    results["full_ms"] = round(t * 1e3, 1)
    results["plans_per_s"] = round(B / t, 1)
    log(f"full step: {results['full_ms']} ms -> {results['plans_per_s']}/s")

    # ---- chained-scan latency probe (B=8 plans = 72 instances) ----------
    fleet = sqp_mod.make_fleet_sqp_solver(ocp, config, dtype=jnp.float32,
                                          backend="pallas")
    b8 = 8 * P
    sp, sx, sz = flat_params[:b8], flat_x[:b8], flat_z[:b8]

    def make_chained(K):
        @jax.jit
        def chained(fp, fx, fz):
            def body(Z, k):
                res = fleet(fp + 1e-5 * k, fx, Z)
                return res.z, res.cost
            Z, costs = jax.lax.scan(body, fz,
                                    jnp.arange(K, dtype=jnp.float32))
            return Z, costs
        return chained

    c1, c16 = make_chained(1), make_chained(16)
    for f in (c1, c16):
        z, c = f(sp, sx, sz)
        float(jnp.sum(c))
    t1 = timeit(lambda i: float(jnp.sum(c1(sp + 1e-6 * i, sx, sz)[1])), n=12)
    t16 = timeit(lambda i: float(jnp.sum(c16(sp + 1e-6 * i, sx, sz)[1])), n=12)
    per_step = (t16 - t1) / 15.0
    results["chain_t1_ms"] = round(t1 * 1e3, 2)
    results["chain_t16_ms"] = round(t16 * 1e3, 2)
    results["on_device_step_ms"] = round(per_step * 1e3, 2)
    results["rtt_ms"] = round((t1 - per_step) * 1e3, 2)
    log(f"chained: T1={t1*1e3:.1f} T16={t16*1e3:.1f} "
        f"per-step={per_step*1e3:.2f} ms rtt={results['rtt_ms']} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
