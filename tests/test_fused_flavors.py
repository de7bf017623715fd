"""Interpret-mode fused-kernel parity for the remaining bench-matrix flavors
(round-4 VERDICT weak #3 / directive #3).

tools/bench_matrix.py runs five workload flavors on hardware through the fused
whole-SQP kernel; tests/test_qp_pallas.py already pins goal+ellipsoid and
CC-MPC (Gaussian). The three flavors below previously ran fused ONLY on
hardware, so a Mosaic-visible regression in their kernel paths (spline-segment
selection + ``jnp_atan2`` traced in-kernel for contouring; topology halfspace
rows for T-MPC; the m=40 scenario-constraint block + slack for SH-MPC) would
reach the chip before any CPU test caught it. Each test imports the EXACT
bench_matrix builder so the pinned configuration is the shipped one.

Slow-marked: the Pallas interpreter takes minutes per config.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
    SQPConfig, make_fleet_sqp_solver)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
import bench_matrix  # noqa: E402  (the shipped flavor builders)

N = 4
B = 2
RNG_SEED = 0


def _cfg():
    # The shipped operating point's structure at a CPU-affordable depth:
    # 3-phase inexact-SQP ramp (bench.py / bench_matrix.py)
    return SQPConfig(n_sqp=4, n_qp_iter=8, mu_min=1e-10,
                     regularization="gershgorin", track_best=False,
                     qp_iter_schedule=((2, 6), (2, 12)))


def _parity(ocp, P, x0, z0, require_success=True):
    args = (jnp.asarray(P, jnp.float64), jnp.asarray(x0, jnp.float64),
            jnp.asarray(z0, jnp.float64))
    cfg = _cfg()
    r_xla = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                  backend="xla")(*args)
    r_fused = make_fleet_sqp_solver(ocp, cfg, dtype=jnp.float64,
                                    backend="fused", interpret=True)(*args)
    if require_success:
        assert bool(np.all(np.asarray(r_xla.success)))
    np.testing.assert_array_equal(np.asarray(r_fused.success),
                                  np.asarray(r_xla.success))
    np.testing.assert_allclose(np.asarray(r_fused.z)[:, :-1],
                               np.asarray(r_xla.z)[:, :-1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_fused.cost),
                               np.asarray(r_xla.cost), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_contouring_flavor_interpret_parity():
    """MPCC contouring + ellipsoids (bench_matrix ``contour``): the
    leading-axis spline-segment selection and ``jnp_atan2`` trace INSIDE the
    fused kernel (ops/spline.py header; utils/math.py)."""
    rng = np.random.default_rng(RNG_SEED)
    ocp, P, x0, z0 = bench_matrix.build_contour(N, B, rng)
    _parity(ocp, P, x0, z0)


@pytest.mark.slow
def test_fused_tmpc_flavor_interpret_parity():
    """T-MPC++ fleet (bench_matrix ``tmpc`` == the bench.py headline config):
    topology halfspace rows + consistency columns through the fused kernel.
    Small bundle (n_paths=2 -> P=3 planners) to keep the interpreter
    affordable; the parameter layout is the full build_tmpc_fleet one."""
    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)

    ocp, settings = tmpc_bench_ocp(N=N, n_paths=2, max_obstacles=3)
    P, x0, z0, _disabled = build_tmpc_fleet(ocp, settings, B,
                                            seed=RNG_SEED, dtype=np.float64)
    Pn = P.shape[1]
    flat = lambda a: a.reshape((B * Pn,) + a.shape[2:])
    x0b = np.repeat(x0, Pn, axis=0)
    # Not every diversified seed yields a feasible topology-constrained
    # problem at N=4 — parity (identical success mask + iterates) is the
    # assertion, as in the runtime where failed planners lose selection.
    _parity(ocp, flat(P), x0b, flat(z0), require_success=False)


@pytest.mark.slow
def test_fused_shmpc_flavor_interpret_parity():
    """SH-MPC safe horizon (bench_matrix ``shmpc``): the m=40 constraint
    block (24 scenario halfspaces + bounds) and the slack variable through
    the fused kernel."""
    rng = np.random.default_rng(RNG_SEED)
    ocp, P, x0, z0 = bench_matrix.build_shmpc(N, B, rng)
    _parity(ocp, P, x0, z0)


@pytest.mark.slow
def test_fused_kernel_under_sharding_interpret():
    """The composition the TPU actually runs — ``make_sharded_tmpc_step`` over
    a 2x2 mesh with ``backend="fused"`` — executed on the virtual CPU mesh via
    interpret mode, pinned against the unsharded XLA fleet result (round-4
    VERDICT weak #5: previously proven only by single-chip hardware runs and
    a backend-string assert)."""
    import jax

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.parallel.batch import (
        make_batched_tmpc_step)
    from oscar_mpc_planner_mr_modification_tpu.parallel.mesh import (
        make_mesh, make_sharded_tmpc_step, shard_fleet_arrays)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    ocp, settings = tmpc_bench_ocp(N=N, n_paths=1, max_obstacles=3)
    cfg = _cfg()
    B = 2
    params, xinit, z_init, disabled = build_tmpc_fleet(ocp, settings, B,
                                                       seed=RNG_SEED,
                                                       dtype=np.float64)
    mesh = make_mesh(2, 2)
    step = make_sharded_tmpc_step(ocp, cfg, mesh, dtype=jnp.float64,
                                  backend="fused", interpret=True)
    args = shard_fleet_arrays(mesh, jnp.asarray(params), jnp.asarray(xinit),
                              jnp.asarray(z_init), jnp.asarray(disabled))
    best_z, best_cost, best_idx, any_ok = step(*args)

    # Reference: the SAME fused interpret arithmetic, unsharded — so the
    # only variable is the mesh partitioning + two-phase selection. (An XLA
    # reference can legitimately flip the argmin between near-tied planners.)
    ref_step = make_batched_tmpc_step(ocp, cfg, dtype=jnp.float64,
                                      backend="fused", interpret=True)
    ref = ref_step(jnp.asarray(params), jnp.asarray(xinit),
                   jnp.asarray(z_init), jnp.asarray(disabled))
    assert bool(np.all(np.asarray(any_ok)))
    np.testing.assert_allclose(np.asarray(best_idx),
                               np.asarray(ref.best_index))
    np.testing.assert_allclose(np.asarray(best_cost),
                               np.asarray(ref.best_cost), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(best_z)[:, :-1],
                               np.asarray(ref.best_z)[:, :-1], atol=1e-9)
