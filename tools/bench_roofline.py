#!/usr/bin/env python
"""Roofline / MFU accounting on the real chip (round-4 VERDICT directive #2).

Measures, all via within-run chained subtraction (T(K2)-T(K1))/(K2-K1) so
tunnel RTT and dispatch overhead cancel:

1. **VPU ceiling** — a pure chained-FMA Pallas kernel (f32, (8,128)-tiled
   block resident in VMEM): the empirical elementwise-FLOP roof the fused
   solver kernel lives under (it is gather-free and dot_general-free by
   design, so the MXU is idle and the VPU is the relevant peak).
2. **MXU ceiling** — chained f32 and bf16 square matmuls: the roof the chip
   COULD reach if the workload were matmul-shaped.
3. **Fleet-step achieved FLOP/s** — the shipped fused T-MPC++ fleet step
   (4608 plans, N=20, round-5 schedule), algorithmic FLOPs counted by XLA
   cost analysis of the same algorithm (2.7563 MFLOP/plan, see
   ALGO_FLOPS_PER_PLAN below), divided by the chained on-device step time.
4. **The MXU experiment** — the SAME fleet through ``backend="xla"``: XLA:TPU
   maps the batched stagewise Riccati's dot_generals onto the MXU
   (batched tiny (nz=7) matmuls on 128x128 tiles). Publishing this number
   makes the lanes-vs-MXU layout decision a measurement, not a convention.

Emits one JSON line; archive under docs/artifacts/.
"""

import json
import math
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# Algorithmic FLOPs of one full scheduled SQP solve (N=20, nz=7, nx=5, m=22
# T-MPC++ OCP; shipped schedule 1x(qp=3)+1x(qp=5)+2x(qp=8)): XLA cost
# analysis of the batched "xla" backend on CPU, linear in batch
# (176,404,000 flops at B=64, 88,208,592 at B=32 -> 2.7563e6/plan). The
# fused kernel runs the same
# iteration counts; its lane layout adds padding work this figure does not
# count, so quoted MFU is the honest algorithmic-work convention.
ALGO_FLOPS_PER_PLAN = 2.7563e6


def timed_readback(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(np.asarray(jax_sum(out)))
    dt = time.perf_counter() - t0
    return dt, s


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    global jax_sum
    jax_sum = jnp.sum

    platform = jax.devices()[0].platform
    log(f"platform={platform}")
    result = {"platform": platform}

    # ---------------- 1. VPU ceiling: chained FMA kernel -------------------
    # The Mosaic kernel runs a STATIC inner loop (a dynamic trip count from
    # SMEM compiled pathologically through the relay) over EIGHT independent
    # accumulator blocks — a single dependent chain per element is
    # latency-bound, not throughput-bound (measured 0.886 vs 2.8+ TF/s the
    # solver kernel itself sustains). The chain length K is an XLA-level
    # fori_loop of dependent kernel calls.
    ROWS, COLS = 256, 512
    K_INNER = 256  # larger in-kernel loops (4096) wedge the relay compiler;
    # at 256 the XLA-level call chain adds ~0.1-0.3 ms/call of dispatch
    # overhead, so this measures a conservative dependent-stream rate
    N_ACC = 8

    def fma_kernel(x_ref, o_ref):
        def body(_, ys):
            return tuple(y * 1.000000119 + 1.1920929e-07 for y in ys)

        ys = jax.lax.fori_loop(
            0, K_INNER, body,
            tuple(x_ref[i] for i in range(N_ACC)))
        for i in range(N_ACC):
            o_ref[i] = ys[i]

    fma_call = pl.pallas_call(
        fma_kernel,
        out_shape=jax.ShapeDtypeStruct((N_ACC, ROWS, COLS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=platform != "tpu",  # CPU smoke only; numbers need TPU
    )

    @jax.jit
    def fma_chain(x, K):
        return jax.lax.fori_loop(0, K[0], lambda _, y: fma_call(y), x)

    rng = np.random.default_rng(0)
    K1, K2 = 50, 450
    for K in (K1, K2):  # one compile (K traced); run through once
        float(jnp.sum(fma_chain(
            jnp.asarray(rng.standard_normal((N_ACC, ROWS, COLS)),
                        jnp.float32),
            jnp.asarray([K], jnp.int32))))
    ts = {}
    for K in (K1, K2) * 3:  # interleave to average tunnel weather
        x = jnp.asarray(rng.standard_normal((N_ACC, ROWS, COLS)), jnp.float32)
        dt, _ = timed_readback(fma_chain, x, jnp.asarray([K], jnp.int32))
        ts.setdefault(K, []).append(dt)
    d = min(ts[K2]) - min(ts[K1])
    vpu_flops = N_ACC * ROWS * COLS * K_INNER * (K2 - K1) * 2 / d
    result["vpu_fma_tflops"] = round(vpu_flops / 1e12, 3)
    log(f"VPU chained-FMA: {result['vpu_fma_tflops']} TFLOP/s "
        f"(delta {d*1e3:.1f} ms)")

    # ---------------- 2. MXU ceiling: chained matmuls ----------------------
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        n = 2048

        @jax.jit
        def mm_chain(x, w, K):
            def body(_, y):
                return jnp.dot(y, w, preferred_element_type=dtype) * 0.001
            return jax.lax.fori_loop(0, K[0], body, x)

        # Delta sized >> RTT jitter (±25 ms): 504 extra 2048^3 matmuls =
        # 8.7 TFLOP (~45 ms even at bf16 peak)
        Ks = (8, 512)
        for K in Ks:  # one compile (K is traced)
            float(jnp.sum(mm_chain(
                jnp.asarray(rng.standard_normal((n, n)), dtype),
                jnp.asarray(rng.standard_normal((n, n)), dtype),
                jnp.asarray([K], jnp.int32)).astype(jnp.float32)))
        ts = {}
        for K in Ks * 3:
            x = jnp.asarray(rng.standard_normal((n, n)), dtype)
            w = jnp.asarray(rng.standard_normal((n, n)), dtype)
            t0 = time.perf_counter()
            out = mm_chain(x, w, jnp.asarray([K], jnp.int32))
            float(jnp.sum(out.astype(jnp.float32)))
            ts.setdefault(K, []).append(time.perf_counter() - t0)
        d = min(ts[Ks[1]]) - min(ts[Ks[0]])
        mxu = 2 * n**3 * (Ks[1] - Ks[0]) / d
        result[f"mxu_{name}_tflops"] = round(mxu / 1e12, 2)
        log(f"MXU {name} chained 2048^3 matmul: "
            f"{result[f'mxu_{name}_tflops']} TFLOP/s (delta {d*1e3:.1f} ms)")

    # ---------------- 3+4. Fleet step: fused (lanes) vs xla (MXU) ----------
    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, make_fleet_sqp_solver)

    N = 20
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=8, max_obstacles=4)
    cfg = SQPConfig(n_sqp=4, n_qp_iter=8, mu_min=1e-6, w_max=1e6,
                    reg_eps=1e-4, regularization="gershgorin",
                    track_best=False,
                    qp_iter_schedule=((1, 3), (1, 5), (2, 8)))
    B = 512
    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, B,
                                                dtype=np.float32)
    P = params.shape[1]
    nplan = B * P
    flat = lambda a: a.reshape((nplan,) + a.shape[2:])
    pf = jnp.asarray(flat(params))
    xf = jnp.asarray(np.repeat(xinit, P, axis=0))
    zf = jnp.asarray(flat(z_init))
    flops_step = ALGO_FLOPS_PER_PLAN * nplan
    result["fleet_plans"] = nplan
    result["algo_gflops_per_step"] = round(flops_step / 1e9, 2)

    backends = ["fused", "xla"]
    if os.environ.get("ROOFLINE_BACKENDS"):
        backends = os.environ["ROOFLINE_BACKENDS"].split(",")
    for backend in backends:
        try:
            solve = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float32,
                                          backend=backend)

            def chained(K):
                @jax.jit
                def run(p, x, z):
                    def body(carry, _):
                        z_c, bump = carry
                        r = solve(p, x, z_c)
                        # dependent chain: reuse iterate, nudge to vary
                        return (r.z + bump, bump), r.cost[:1]
                    (_, _), costs = jax.lax.scan(
                        body, (z, jnp.float32(1e-6)), None, length=K)
                    return costs
                return run

            Ks = (1, 9)
            runs = {K: chained(K) for K in Ks}
            for K in Ks:
                float(jnp.sum(runs[K](pf, xf, zf)))
            ts = {}
            for K in Ks + Ks:
                zv = zf + np.float32(rng.uniform(0, 1e-5))
                t0 = time.perf_counter()
                out = runs[K](pf, xf, zv)
                float(jnp.sum(out))
                ts.setdefault(K, []).append(time.perf_counter() - t0)
            step = (min(ts[Ks[1]]) - min(ts[Ks[0]])) / (Ks[1] - Ks[0])
            achieved = flops_step / step
            result[f"{backend}_step_ms"] = round(step * 1e3, 3)
            result[f"{backend}_plans_per_s"] = int(nplan / step)
            result[f"{backend}_achieved_tflops"] = round(achieved / 1e12, 3)
            log(f"{backend}: {step*1e3:.2f} ms/step, "
                f"{result[f'{backend}_achieved_tflops']} TFLOP/s algorithmic")
        except Exception as e:  # noqa: BLE001 — record and continue
            result[f"{backend}_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"{backend} FAILED: {e}")

    if "vpu_fma_tflops" in result and "fused_achieved_tflops" in result:
        result["fused_vpu_fraction"] = round(
            result["fused_achieved_tflops"] / result["vpu_fma_tflops"], 3)
    if "mxu_bf16_tflops" in result and "fused_achieved_tflops" in result:
        result["fused_chip_mfu"] = round(
            result["fused_achieved_tflops"] / result["mxu_bf16_tflops"], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
