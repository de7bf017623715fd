#!/usr/bin/env python
"""T-MPC benchmark (driver entry point): throughput + real-time latency.

Each plan is the BASELINE config-4 workload — N=20 contouring MPC with 4
ellipsoidal obstacles, 8 homotopy-distinct guidance planners + 1 unguided
planner solved in parallel and reduced by on-device best-trajectory selection.
The reference achieves ~25-35 ms per plan on an 8-core CPU
(docs/guidance_constraints_documentation.md:1339-1343), i.e. ~30 plans/s; the
v5p-16 target is >=10,000 plans/s with p99 per-plan latency <= 33 ms.

Phases (each ends with a progress-complete JSON line on stdout, so the LAST
line is always the most complete result even if the run is cut short):
  1. throughput: B=512 fleet step, fused Pallas QP kernel
  2. small-batch latency: B=8 fleet tick, per-call wall clock through the
     host<->device tunnel (p99 over 30 calls)
  3. on-device step time: K dependent solves chained in ONE dispatch
     (lax.scan) -> per-step = (T(K)-T(1))/(K-1); the remainder of a single
     call is transport (on this infra, a remote-tunnel RTT that does not
     exist on a directly-attached TPU)
  4. end-to-end single-robot tick: guidance PRM + module updates + parameter
     fill + solve + output extraction (the full Planner.solveMPC path,
     reference planner.cpp:84-232)

NOTE (this infra): jax.block_until_ready does NOT block through the axon
tunnel — every timing forces a host readback and varies inputs between calls.
The first Pallas compile goes through a remote relay (~10 min); later shapes
reuse the relay cache (~1 min each). The persistent JAX compile cache must
stay OFF (miscomputes on this host).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1800"))
PER_CHIP_TARGET = 10000.0 / 16.0  # v5p-16 target share per chip

# The shipped headline schedule (see the operating-point comment in main()).
BENCH_SCHEDULE = ((1, 3), (1, 5), (2, 8))

# Roofline accounting (docs/PERFORMANCE.md round-5 table). Algorithmic FLOPs
# of one full scheduled SQP solve (N=20, nz=7, m=22 T-MPC++ problem,
# BENCH_SCHEDULE): XLA cost analysis of the same algorithm through the "xla"
# backend, linear in batch (tools/bench_roofline.py; pinned by
# tests/test_roofline_accounting.py). The fused kernel's lane layout adds
# padding work this does not count — achieved-FLOP/s on algorithmic work is
# the honest MFU convention. Peaks are chip ceilings measured on THIS chip
# by tools/bench_roofline.py microbenchmarks (chained FMA / chained matmul);
# -1 disables the ratio fields until measured.
ALGO_FLOPS_PER_PROBLEM = 2.7563e6
# Measured on THIS chip (docs/artifacts/roofline.json): chained 2048^3 bf16
# matmul ceiling (the chip's dominant-FLOPs roof). The VPU ratio is left
# unquoted in the artifact: the dependent elementwise-stream microbench
# (0.85-0.89 TF/s) is call-granularity-bound and the fused kernel itself
# sustains 2.8 TF/s algorithmic — the microbench is not a valid ceiling
# (docs/PERFORMANCE.md round-5 roofline section).
MEASURED_VPU_PEAK_TFLOPS = -1.0
MEASURED_CHIP_PEAK_TFLOPS = 139.94


def remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def emit(result):
    print(json.dumps(result), flush=True)


def log(msg):
    print(f"[bench +{time.perf_counter()-T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, make_fleet_sqp_solver)
    from oscar_mpc_planner_mr_modification_tpu.parallel.batch import (
        make_batched_tmpc_step)

    batch = int(os.environ.get("BENCH_BATCH", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    n_paths = int(os.environ.get("BENCH_PATHS", "8"))
    N = int(os.environ.get("BENCH_N", "20"))

    platform = jax.devices()[0].platform
    log(f"platform={platform}")
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=n_paths)
    # TPU fleet operating point: fused whole-SQP Pallas kernel (linearization
    # + interior point in one pallas_call, ops/sqp_fused.py) with Gershgorin-
    # shift PSD-ization; runtime fallback to the per-iteration kernel if
    # Mosaic rejects the in-kernel trace. track_best=False is the reference's
    # exact semantics (acados FIXED_STEP, no best-iterate merit tracking).
    # Inexact-SQP schedule BENCH_SCHEDULE (1x3 + 1x5 + 2x8): the third
    # paired hardware sweep (tools/exp_schedule_hw.py, raw logs
    # docs/artifacts/schedule_trial_r5{b,c}.txt, same scenes/session each)
    # measured the full front; this point runs 3.50 ms per 4608-plan fleet
    # step (146,423 plans/s — vs 4.41/116k for 1x3+2x5+2x8 and 4.86/105k
    # for 2x3+2x5+2x8) at per-planner cold-start success 0.9484 — above the
    # 2x3+2x5+2x8 (0.9423) and round-4 (0.9145) defaults, 0.7pt below the
    # 1x3+2x5+2x8 knee (0.9557) — and unchanged PLAN-level (best-of-9)
    # success 1.0, the deployment metric. Same res_eq <= 1e-2 gate. The
    # higher-success knee remains one config away; front table in
    # docs/PERFORMANCE.md.
    config = SQPConfig(n_sqp=sum(n for n, _ in BENCH_SCHEDULE),
                       n_qp_iter=BENCH_SCHEDULE[-1][1], mu_min=1e-6,
                       w_max=1e6, reg_eps=1e-4,
                       regularization="gershgorin" if platform == "tpu"
                       else "mirror",
                       track_best=False,
                       qp_iter_schedule=BENCH_SCHEDULE)

    params, xinit, z_init, disabled = build_tmpc_fleet(ocp, settings, batch)
    args = tuple(map(jnp.asarray, (params, xinit, z_init, disabled)))

    # Operating-point stamp: the artifact must be self-describing (the
    # schedule/backend/batch that produced it, plus the exact source rev) so
    # cross-round comparisons never depend on reading bench.py at the same
    # commit (round-4 VERDICT weak #6).
    try:
        import subprocess

        git_sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        git_sha = "unknown"

    # Emit the (all -1) skeleton BEFORE the first compile: the remote compile
    # relay has been observed to wedge indefinitely — the driver records the
    # LAST emitted line, so even a wedged run leaves a parseable artifact.
    result = {
        "metric": "tmpc_plans_per_s_per_chip", "value": -1.0,
        "unit": "plans/s", "vs_baseline": -1.0, "batch": batch,
        "n_planners": n_paths + 1, "horizon": N,
        "p99_small_batch_latency_ms": -1.0, "small_batch_median_ms": -1.0,
        "small_batch_spike_share": -1.0,
        "on_device_step_ms": -1.0, "transport_rtt_ms": -1.0,
        "on_device_fleet_step_ms": -1.0, "device_plans_per_s": -1.0,
        "achieved_tflops": -1.0,
        "e2e_tick_median_ms": -1.0, "e2e_tick_p99_ms": -1.0,
        "e2e_tick_spike_share": -1.0, "e2e_host_serial_ms": -1.0,
        "e2e_pipelined": True,
        "device_resident_tick_ms": -1.0, "device_resident_tick_p99_ms": -1.0,
        "success_rate": -1.0, "platform": platform, "backend": "none",
        "git_sha": git_sha,
        "bench_config": {
            "qp_iter_schedule": [list(p) for p in config.qp_iter_schedule],
            "n_sqp": config.n_sqp, "n_qp_iter": config.n_qp_iter,
            "regularization": config.regularization,
            "track_best": config.track_best,
            "batch": batch, "n_paths": n_paths, "N": N, "iters": iters,
        },
    }
    emit(result)

    backends = ["fused", "pallas"] if platform == "tpu" else ["auto"]
    step = None
    for bi, backend in enumerate(backends):
        try:
            log(f"building fleet step (backend={backend})...")
            step = make_batched_tmpc_step(ocp, config, dtype=jnp.float32,
                                          backend=backend)
            log("compiling fleet step...")
            out0 = step(*args)
            float(jnp.sum(out0.best_cost))  # force compile+run through
            break
        except Exception as exc:
            log(f"backend {backend!r} failed ({exc}); trying next")
            if bi + 1 == len(backends):
                raise
    log(f"fleet backend: {backend}")
    result["backend"] = backend

    def run(a):
        """Execute one step and force completion (host readback: on the axon
        tunnel backend, block_until_ready alone does not block)."""
        out = step(*a)
        float(jnp.sum(out.best_cost))
        return out

    # ---- Phase 1: throughput -------------------------------------------
    log("phase 1: throughput compile...")
    out = run(args)
    result["success_rate"] = round(
        float(np.mean(np.asarray(out.any_success))), 4)
    times = []
    for i in range(iters):
        perturbed = (args[0] + 1e-6 * i, args[1], args[2], args[3])
        t0 = time.perf_counter()
        run(perturbed)
        times.append(time.perf_counter() - t0)
    plans_per_s = batch / float(np.median(np.asarray(times)))
    result["value"] = round(plans_per_s, 2)
    result["vs_baseline"] = round(plans_per_s / PER_CHIP_TARGET, 3)
    log(f"throughput: {plans_per_s:.0f} plans/s")
    emit(result)

    # ---- Phase 2: small-batch latency (B=8 fleet tick) ------------------
    # The tick is ONE device dispatch + one scalar readback: the input
    # perturbation and the cost reduction are folded INTO the jitted step
    # (each extra dispatch is a full tunnel round-trip; round-2's 3-dispatch
    # tick measured p99 45.9 ms vs median 32). 150 samples so the p99 is a
    # tail statistic, not the max of 30.
    if remaining() > 240:
        log("phase 2: small-batch latency compile...")
        small = tuple(a[:8] for a in args)

        @jax.jit
        def tick_small(p, x, z, d, seed):
            res = step(p + 1e-6 * seed, x, z, d)
            return jnp.sum(res.best_cost)

        float(tick_small(*small, 0.0))
        import gc

        gc.collect()
        gc.disable()  # a gen-2 GC pause lands straight in the p99
        try:
            lat = []
            for i in range(150):
                t0 = time.perf_counter()
                float(tick_small(*small, float(i + 1)))
                lat.append(time.perf_counter() - t0)
        finally:
            gc.enable()
        lat_ms = np.asarray(lat) * 1e3
        result["p99_small_batch_latency_ms"] = round(
            float(np.percentile(lat_ms, 99)), 2)
        result["small_batch_median_ms"] = round(float(np.median(lat_ms)), 2)
        # Tunnel-RTT spike share: tunnel-inclusive p99s are set by rare
        # (~2-4/120) RTT spikes >=1.5x the median; report the rate so the
        # tail is interpretable against the RTT weather of the run.
        result["small_batch_spike_share"] = round(
            float(np.mean(lat_ms > 1.5 * np.median(lat_ms))), 4)
        log(f"small batch: median {result['small_batch_median_ms']} ms, "
            f"p99 {result['p99_small_batch_latency_ms']} ms")
        emit(result)

    # ---- Phase 3: on-device step time via chained scan ------------------
    if remaining() > 240:
        log("phase 3: chained-scan on-device latency...")
        fleet = make_fleet_sqp_solver(ocp, config, dtype=jnp.float32,
                                      backend=backend
                                      if platform == "tpu" else "xla")
        P = n_paths + 1
        b8 = 8 * P
        fp = args[0].reshape(batch * P, *args[0].shape[2:])[:b8]
        fx = jnp.repeat(args[1], P, axis=0)[:b8]
        fz = args[2].reshape(batch * P, *args[2].shape[2:])[:b8]

        def make_chained(K):
            @jax.jit
            def chained(p_, x_, z_):
                def body(Z, k):
                    res = fleet(p_ + 1e-5 * k, x_, Z)
                    return res.z, res.cost
                Z, costs = jax.lax.scan(
                    body, z_, jnp.arange(K, dtype=jnp.float32))
                return costs
            return chained

        c1, c16 = make_chained(1), make_chained(16)
        for f in (c1, c16):
            float(jnp.sum(f(fp, fx, fz)))
        t1s, t16s = [], []
        for i in range(12):
            t0 = time.perf_counter()
            float(jnp.sum(c1(fp + 1e-6 * i, fx, fz)))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(c16(fp + 1e-6 * i, fx, fz)))
            t16s.append(time.perf_counter() - t0)
        t1 = float(np.median(t1s))
        per_step = (np.asarray(t16s) - t1) / 15.0
        result["on_device_step_ms"] = round(
            float(np.median(per_step)) * 1e3, 2)
        result["transport_rtt_ms"] = round(
            (t1 - float(np.median(per_step))) * 1e3, 2)
        log(f"on-device step: {result['on_device_step_ms']} ms, "
            f"transport {result['transport_rtt_ms']} ms")
        emit(result)

        # Full-batch device rate: the same chained-scan subtraction on the
        # full fleet shape — the sustained throughput an attached (untunneled)
        # deployment gets from one chip.
        if remaining() > 240:
            fpb = args[0].reshape(batch * P, *args[0].shape[2:])
            fxb = jnp.repeat(args[1], P, axis=0)
            fzb = args[2].reshape(batch * P, *args[2].shape[2:])

            def make_chained_full(K):
                @jax.jit
                def chained(p_, x_, z_):
                    def body(Z, k):
                        res = fleet(p_ + 1e-5 * k, x_, Z)
                        return res.z, jnp.sum(res.cost)
                    Z, costs = jax.lax.scan(
                        body, z_, jnp.arange(K, dtype=jnp.float32))
                    return costs
                return chained

            f1, f8 = make_chained_full(1), make_chained_full(8)
            for f in (f1, f8):
                float(jnp.sum(f(fpb, fxb, fzb)))
            u1s, u8s = [], []
            for i in range(8):
                t0 = time.perf_counter()
                float(jnp.sum(f1(fpb + 1e-6 * i, fxb, fzb)))
                u1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(jnp.sum(f8(fpb + 1e-6 * i, fxb, fzb)))
                u8s.append(time.perf_counter() - t0)
            fstep = (float(np.median(u8s)) - float(np.median(u1s))) / 7.0
            result["on_device_fleet_step_ms"] = round(fstep * 1e3, 2)
            result["device_plans_per_s"] = round(batch / fstep, 1)
            # MFU/roofline (round-5 VERDICT #2): achieved algorithmic
            # FLOP/s of the fused step vs this chip's measured ceilings.
            # The FLOP constant was counted for the SHIPPED operating point
            # (N=20, the T-MPC++ OCP, BENCH_SCHEDULE) — only quote it when
            # this run is that configuration.
            if (N == 20 and n_paths == 8
                    and config.qp_iter_schedule == BENCH_SCHEDULE):
                flops_step = ALGO_FLOPS_PER_PROBLEM * batch * P
                result["achieved_tflops"] = round(
                    flops_step / fstep / 1e12, 3)
                if MEASURED_VPU_PEAK_TFLOPS > 0:
                    result["mfu_vpu"] = round(
                        result["achieved_tflops"]
                        / MEASURED_VPU_PEAK_TFLOPS, 3)
                if MEASURED_CHIP_PEAK_TFLOPS > 0:
                    result["mfu_chip"] = round(
                        result["achieved_tflops"]
                        / MEASURED_CHIP_PEAK_TFLOPS, 4)
            log(f"device rate: {result['device_plans_per_s']} plans/s "
                f"({result['on_device_fleet_step_ms']} ms/fleet step, "
                f"{result['achieved_tflops']} TFLOP/s algorithmic)"
                if result["achieved_tflops"] > 0 else
                f"device rate: {result['device_plans_per_s']} plans/s "
                f"({result['on_device_fleet_step_ms']} ms/fleet step)")
            emit(result)

    # ---- Phase 4: end-to-end single-robot tick (both structures) ---------
    # host_serial = tick wall time minus the blocking readback wait — the
    # host work an attached deployment would pay per tick.
    if remaining() > 240:
        # Measured round 5: this tunnel's execution RPC is LAZY (fires at
        # readback — a 30 ms host sleep after dispatch hides none of the
        # RTT), so the overlap structure cannot shorten the tick HERE and
        # its staging overhead makes it slower than the plain serial loop.
        # Measure both, headline the faster; on attached/async hardware the
        # pipelined structure is the right one (tests/test_pipelined.py).
        ticks = {}
        for mode in ("serial", "pipelined"):
            if remaining() < 180 and ticks:
                break
            log(f"phase 4: e2e tick ({mode})...")
            tick_ms, host_ms = _e2e_tick(N, platform, config, mode=mode)
            if tick_ms is not None:
                ticks[mode] = (tick_ms, host_ms)
                result[f"e2e_tick_{mode}_median_ms"] = round(
                    float(np.median(tick_ms)), 2)
                result[f"e2e_tick_{mode}_p99_ms"] = round(
                    float(np.percentile(tick_ms, 99)), 2)
                log(f"e2e {mode}: median "
                    f"{result[f'e2e_tick_{mode}_median_ms']} ms, p99 "
                    f"{result[f'e2e_tick_{mode}_p99_ms']} ms, host "
                    f"{float(np.median(host_ms)):.2f} ms")
        if ticks:
            best = min(ticks, key=lambda m: np.percentile(ticks[m][0], 99))
            tick_ms, host_ms = ticks[best]
            result["e2e_structure"] = best
            result["e2e_pipelined"] = best == "pipelined"
            result["e2e_tick_median_ms"] = round(float(np.median(tick_ms)), 2)
            result["e2e_tick_p99_ms"] = round(
                float(np.percentile(tick_ms, 99)), 2)
            result["e2e_tick_spike_share"] = round(
                float(np.mean(tick_ms > 1.5 * np.median(tick_ms))), 4)
            result["e2e_host_serial_ms"] = round(
                float(np.median(host_ms)), 2)
            log(f"e2e tick [{best}]: median "
                f"{result['e2e_tick_median_ms']} ms, "
                f"p99 {result['e2e_tick_p99_ms']} ms, "
                f"host serial {result['e2e_host_serial_ms']} ms")
            emit(result)

            # Device-resident tick bound: what an ATTACHED (untunneled)
            # deployment pays per closed-loop control tick. K T-MPC++ ticks
            # (fill + 9-planner fused solve + selection + dynamics) chained
            # in ONE dispatch via parallel/rollout.py give the on-device
            # per-tick time; the measured serialized host cost from the
            # pipelined loop above is added on top (conservative: on
            # attached hardware most of the ~1 ms device step hides under
            # the overlapped host work, and there is no tunnel RTT).
            if remaining() > 300:
                log("phase 5: device-resident closed-loop tick...")
                try:
                    dev_ms = _device_resident_tick(N, n_paths, config,
                                                   platform)
                    if dev_ms is not None:
                        result["device_resident_tick_ms"] = round(
                            float(np.median(dev_ms))
                            + float(np.median(host_ms)), 2)
                        result["device_resident_tick_p99_ms"] = round(
                            float(np.percentile(dev_ms, 99))
                            + float(np.percentile(host_ms, 99)), 2)
                        log(f"device-resident tick: "
                            f"{result['device_resident_tick_ms']} ms median, "
                            f"p99 {result['device_resident_tick_p99_ms']} ms")
                except Exception as exc:
                    log(f"phase 5 failed ({exc}); leaving fields at -1")

    emit(result)


def _device_resident_tick(N, n_paths, config, platform):
    """Per-tick time of the device-resident closed-loop T-MPC++ evaluator:
    K ticks chained in one lax.scan dispatch, per-tick = (T(K)-T(1))/(K-1)
    over M samples (the chained-scan subtraction removes the tunnel RTT)."""
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_tmpc_rollout, tmpc_scenes)

    B, K, n_obs = 8, 17, 3
    backend = "fused" if platform == "tpu" else "xla"
    dtype = jnp.float32 if platform == "tpu" else jnp.float64
    r1, _ = make_tmpc_rollout(n_obstacles=n_obs, N=N, n_ticks=1,
                              n_paths=n_paths, config=config, dtype=dtype,
                              backend=backend)
    rK, _ = make_tmpc_rollout(n_obstacles=n_obs, N=N, n_ticks=K,
                              n_paths=n_paths, config=config, dtype=dtype,
                              backend=backend)
    x0, obs0, obs_vel = tmpc_scenes(B, n_obs, seed=0)
    args = tuple(map(jnp.asarray, (x0, obs0, obs_vel)))
    for fn in (r1, rK):
        out = fn(*args)
        float(jnp.sum(out.progress))  # force compile + run through
    t1s, tKs = [], []
    for i in range(10):
        a = (args[0] + 1e-5 * (i + 1), args[1], args[2])
        t0 = time.perf_counter()
        float(jnp.sum(r1(*a).progress))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(rK(*a).progress))
        tKs.append(time.perf_counter() - t0)
    t1 = float(np.median(t1s))
    per_tick = (np.asarray(tKs) - t1) / (K - 1)
    return np.maximum(per_tick, 0.0) * 1e3


def _e2e_tick(N, platform, config, mode="pipelined"):
    """Full Planner.solveMPC ticks in a pedestrian scenario (planner.cpp:84-232
    equivalents: guidance PRM update, module updates, per-stage parameter fill,
    batched solve, output extraction).

    ``mode="pipelined"``: the next tick's host half runs while the current
    solve's round trip is nominally in flight (Planner.solve_mpc_start /
    prepare / solve_mpc_finish) — the right structure for an attached or
    truly-async deployment. NOTE measured round 5: THIS tunnel's execution
    RPC is LAZY (it fires at readback, not at dispatch — a 30 ms host sleep
    between dispatch and readback hides none of the ~24 ms RTT), so host
    overlap cannot shorten the tick here and the split's extra staging work
    makes it net slower than ``mode="serial"`` (the plain solve_mpc loop).
    bench reports both and headlines the faster structure for this
    transport.

    Returns ``(tick_ms, host_serial_ms)``: wall time per tick, and the tick's
    host-side share (wall minus the blocking readback wait; for serial mode
    host time is measured directly around the non-solve work)."""
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.factory import (
        build_planner, configuration_tmpc_consistency_cost)
    from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
        define_robot_area, ensure_obstacle_size)
    from oscar_mpc_planner_mr_modification_tpu.sim import (
        Pedestrian, PedestrianSimulator)
    from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import straight_path
    from oscar_mpc_planner_mr_modification_tpu.solver import State
    from oscar_mpc_planner_mr_modification_tpu.types import RealTimeData
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    dt = 0.2
    settings = default_settings(N=N, max_obstacles=3)
    model, modules = configuration_tmpc_consistency_cost(settings)

    class Clock:
        t = 0.0

        def __call__(self):
            return self.t

    clock = Clock()
    planner = build_planner(
        model, modules, settings,
        dtype=jnp.float32 if platform == "tpu" else jnp.float64,
        sqp_config=config, clock=clock)

    state = State(model)
    state.set("v", 0.8)
    # Crossing pedestrians spaced along the full drive (~50 m over 124 ticks)
    # so every timed tick sees active obstacles.
    peds = [Pedestrian(np.array([x0, y0]), np.array([x0, -y0]))
            for x0, y0 in [(5.0, 3.0), (9.0, -3.0), (13.0, 2.5),
                           (20.0, 3.0), (24.0, -3.0), (28.0, 2.5),
                           (35.0, 3.0), (39.0, -3.0), (43.0, 2.5),
                           (50.0, 3.0), (54.0, -3.0), (58.0, 2.5)]]
    psim = PedestrianSimulator(peds, dt=dt)
    ref_path = straight_path(length=65.0)

    import gc

    import jax
    import jax.numpy as jnp  # noqa: F811

    # State propagation between ticks is harness, not planner: jit it so the
    # inter-tick time doesn't dominate the wall clock of the phase.
    step_dyn = jax.jit(lambda xs, us: model.discrete_dynamics(xs, us, dt))

    from oscar_mpc_planner_mr_modification_tpu.modules import (
        GuidanceConstraintModule)

    optimizer = next(m for m in planner.modules
                     if isinstance(m, GuidanceConstraintModule))._optimizer

    def build_data(st):
        d = RealTimeData()
        d.robot_area = define_robot_area(0.65, 0.65, 1)
        d.reference_path = ref_path
        d.dynamic_obstacles = ensure_obstacle_size(
            psim.get_obstacles(N), st, settings["max_obstacles"], N, dt)
        return d

    # 124 ticks (120 timed) so the p99 is a tail statistic, not the max of
    # 15; gc disabled inside the timed region (a gen-2 pause is several ms,
    # straight into the p99) and collected between ticks instead. The timed
    # region is the full pipelined tick: dispatch + (overlapped next-tick
    # pedestrian step, data build, PRM, parameter fill) + readback +
    # selection + command extraction — i.e. everything a robot control loop
    # serializes per period.
    data = build_data(state)
    planner.on_data_received(data, "reference_path")
    tick_times, host_times = [], []
    gc.collect()
    try:
        for step_i in range(124):
            gc.disable()
            if mode == "pipelined":
                t0 = time.perf_counter()
                planner.solve_mpc_start(state, data)
                # ---- overlap window: next tick's host half ----
                pred = planner.predicted_next_state(state)
                psim.step([pred.get_position()])
                next_data = build_data(pred)
                planner.prepare(pred, next_data)
                # -----------------------------------------------
                out = planner.solve_mpc_finish()
                a = planner.get_solution(0, "a") if out.success else -3.0
                w = planner.get_solution(0, "w") if out.success else 0.0
                tick = time.perf_counter() - t0
                host = tick - optimizer.last_fetch_wait
            else:  # serial: the plain solveMPC loop (planner.cpp:84-232)
                t0 = time.perf_counter()
                psim.step([state.get_position()])
                next_data = build_data(state)
                out = planner.solve_mpc(state, next_data)
                a = planner.get_solution(0, "a") if out.success else -3.0
                w = planner.get_solution(0, "w") if out.success else 0.0
                tick = time.perf_counter() - t0
                host = tick - optimizer.last_fetch_wait
            gc.enable()
            if step_i >= 4:  # skip compile + first-shape ticks
                tick_times.append(tick)
                host_times.append(host)
            x = np.array(step_dyn(jnp.asarray(state.as_array()),
                                  jnp.asarray([a, w])))
            x[model.state_index("v")] = max(x[model.state_index("v")], 0.0)
            state.set_array(x)
            clock.t += dt
            data = next_data
            if step_i % 16 == 15:
                gc.collect()
    finally:
        gc.enable()
    if not tick_times:
        return None, None
    return (np.asarray(tick_times) * 1e3, np.asarray(host_times) * 1e3)


if __name__ == "__main__":
    main()
