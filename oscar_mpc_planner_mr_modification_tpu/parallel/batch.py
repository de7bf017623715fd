"""Fully-on-device batched T-MPC step.

The throughput core (BASELINE config 4): a (B instances x P planners) fleet of SQP
solves plus on-device best-planner selection, compiled as one XLA program. This is
what the reference's OpenMP fork/join (guidance_constraints.cpp:304-421 + 572-590)
becomes on TPU, scaled from 8 threads to thousands of lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sqp import make_sqp_solver, SQPConfig


class TMPCStepResult(NamedTuple):
    best_z: jnp.ndarray  # (B, N+1, nvar)
    best_cost: jnp.ndarray  # (B,)
    best_index: jnp.ndarray  # (B,) selected planner
    any_success: jnp.ndarray  # (B,) bool
    all_costs: jnp.ndarray  # (B, P)
    all_success: jnp.ndarray  # (B, P)


def make_plan_fn(ocp, config: SQPConfig, dtype=jnp.float32):
    """One T-MPC plan: P parallel solves + argmin selection (single instance).

    Signature: plan(params (P, N, npar), xinit (nx,), z_init (P, N+1, nvar),
    disabled (P,) bool) -> TMPCStepResult leaves without the B axis.
    """
    solve = make_sqp_solver(ocp, config, dtype=dtype)

    def plan(params, xinit, z_init, disabled):
        res = jax.vmap(solve, in_axes=(0, None, 0))(params, xinit, z_init)
        ok = res.success & (~disabled)
        costs = jnp.where(ok, res.cost, jnp.inf)
        best = jnp.argmin(costs)
        return TMPCStepResult(
            best_z=res.z[best], best_cost=costs[best], best_index=best,
            any_success=jnp.any(ok), all_costs=costs, all_success=ok)

    return plan


def make_batched_tmpc_step(ocp, config: SQPConfig, dtype=jnp.float32,
                           backend: str = "auto", interpret: bool = False):
    """(B, P)-batched T-MPC step.

    plan_step(params (B,P,N,npar), xinit (B,nx), z_init (B,P,N+1,nvar),
    disabled (B,P)) -> TMPCStepResult with leading B axis.

    backend: "pallas" routes the B*P QP subproblems through the fused TPU
    kernel with batch-major linearization (the measured-fastest path at the
    bench shape); "lanes" runs linearization AND QP in the kernel's lane
    layout (:mod:`..ops.linearize`; measured slower end-to-end — XLA already
    vectorizes the batch-leading linearization well); "xla" uses the vmapped
    reference solver; "auto" picks pallas on TPU.
    """
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"

    if backend == "xla":
        plan = make_plan_fn(ocp, config, dtype)
        return jax.jit(jax.vmap(plan))

    from ..ops.sqp import make_fleet_sqp_solver

    fleet_solve = make_fleet_sqp_solver(ocp, config, dtype, backend=backend,
                                        interpret=interpret)

    @jax.jit
    def plan_step(params, xinit, z_init, disabled):
        B, P = params.shape[:2]
        flat_params = params.reshape(B * P, *params.shape[2:])
        flat_xinit = jnp.repeat(xinit, P, axis=0)
        flat_z = z_init.reshape(B * P, *z_init.shape[2:])
        res = fleet_solve(flat_params, flat_xinit, flat_z)
        costs = jnp.where(res.success.reshape(B, P) & (~disabled),
                          res.cost.reshape(B, P), jnp.inf)
        best = jnp.argmin(costs, axis=1)  # (B,)
        b_idx = jnp.arange(B)
        z_bp = res.z.reshape(B, P, *res.z.shape[1:])
        return TMPCStepResult(
            best_z=z_bp[b_idx, best], best_cost=costs[b_idx, best],
            best_index=best, any_success=jnp.isfinite(costs[b_idx, best]),
            all_costs=costs, all_success=jnp.isfinite(costs))

    return plan_step
