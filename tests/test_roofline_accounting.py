"""Pin the roofline FLOP accounting (round-4 VERDICT directive #2).

``bench.py`` and ``tools/bench_roofline.py`` quote achieved FLOP/s from a
hardcoded algorithmic-FLOPs-per-problem constant. This test recomputes that
constant from XLA's cost analysis of the same scheduled SQP algorithm (the
"xla" backend on CPU) so the constant cannot silently drift from the shipped
operating point (schedule, N, model, constraint set), and checks linearity
in batch (the scaling assumption behind quoting per-problem FLOPs).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))


def _measured_flops(B):
    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, make_fleet_sqp_solver)

    import bench

    ocp, settings = tmpc_bench_ocp(N=20, n_paths=8, max_obstacles=4)
    cfg = SQPConfig(n_sqp=sum(n for n, _ in bench.BENCH_SCHEDULE),
                    n_qp_iter=bench.BENCH_SCHEDULE[-1][1], mu_min=1e-6,
                    w_max=1e6, reg_eps=1e-4, regularization="gershgorin",
                    track_best=False,
                    qp_iter_schedule=bench.BENCH_SCHEDULE)
    params, xinit, z_init, _ = build_tmpc_fleet(
        ocp, settings, B // params_per_instance(ocp, settings) + 1,
        dtype=np.float32)
    P = params.shape[1]
    flat = lambda a: a.reshape((-1,) + a.shape[2:])[:B]
    args = (jnp.asarray(flat(params)),
            jnp.asarray(np.repeat(xinit, P, axis=0)[:B]),
            jnp.asarray(flat(z_init)))
    solve = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float32, backend="xla")
    comp = jax.jit(solve).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def params_per_instance(ocp, settings):
    return int(settings["guidance"]["n_paths"]) + 1


def test_algo_flops_constant_matches_cost_analysis():
    import bench
    import bench_roofline

    f64 = _measured_flops(64)
    f32 = _measured_flops(32)
    per_problem = f64 / 64
    # Linear in batch (per-problem accounting is meaningful)
    assert abs(f64 - 2 * f32) / f64 < 0.01, (f64, f32)
    # The two shipped constants agree with each other and with XLA's count
    # (10% tolerance absorbs XLA version drift in fusion bookkeeping)
    assert bench.ALGO_FLOPS_PER_PROBLEM == pytest.approx(
        bench_roofline.ALGO_FLOPS_PER_PLAN)
    assert bench.ALGO_FLOPS_PER_PROBLEM == pytest.approx(
        per_problem, rel=0.10), (bench.ALGO_FLOPS_PER_PROBLEM, per_problem)
