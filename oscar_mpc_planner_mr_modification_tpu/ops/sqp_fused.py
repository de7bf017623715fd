"""Fused whole-SQP Pallas kernel: the entire SQP-RTI loop in ONE pallas_call.

Round-2 device-level attribution (docs/PERFORMANCE.md) of the 30.4 ms
512x9-plan fleet step: ~10 ms interior-point iterations, ~7 ms XLA-side
linearization, and ~15 ms relayout/pad/init crossing the XLA<->kernel boundary
— paid once per SQP iteration (10x per solve). This module removes that
boundary: each SQP iteration linearizes the OCP *inside* the kernel (the
shape-generic lane linearizer of :mod:`.linearize` traces directly onto
(SUBS, LANES) batch tiles) and feeds the QP fields to the same interior-point
iteration (:func:`.qp_pallas._ip_solve`) without ever leaving VMEM. One
device dispatch runs all ``n_sqp`` iterations and emits the final iterate
plus cost/eq-residual rows.

This is the TPU analog of the reference's whole-solve-in-one-call structure:
the generated acados solver runs linearization + HPIPM inside one C call
(mpc_planner_solver/src/acados_solver_interface.cpp:149), with the batch
dimension taking the role of the OpenMP planner fork
(mpc_planner_modules/src/guidance_constraints.cpp:304-421).

Requirements: the OCP's module/model functions must be elementwise-
polymorphic (the same contract as the lane pipeline) and free of captured
non-scalar constants (Pallas/Mosaic restriction; ops/linearize.py synthesizes
its identity/one-hot helpers from iota for this reason). Callers fall back to
the per-iteration pallas backend when tracing fails.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linearize import make_lane_linearizer, make_lane_merit
from .qp_pallas import (
    LANES, SUBS, TILE_B, _PIPELINE_VMEM_BYTES, _compact_row_meta, _ip_solve)

__all__ = ["make_fused_fleet_solver"]


def _fused_kernel(P_ref, x0_ref, Z_ref, out_ref, *, lin, merit, T, nz, nx,
                  nu, npar, m, mh, nU, union_cols, row_meta, stage_mask,
                  phases, track_best, ip_kwargs):
    """One grid program: full SQP solve of TILE_B OCPs in VMEM.

    ``phases``: ((n_sqp, n_qp_iter), ...) — one fori_loop per phase so an
    inexact-SQP schedule (loose early QPs, tight late ones;
    SQPConfig.qp_iter_schedule) costs one extra loop body, not an unrolled
    SQP loop."""
    Pc = P_ref[...].reshape(npar, T, SUBS, LANES)
    x0 = x0_ref[...].reshape(nx, SUBS, LANES)
    Z0 = Z_ref[...].reshape(T, nz, SUBS, LANES)
    dtype = Z0.dtype
    tri = [(i, q) for i in range(nz) for q in range(i, nz)]

    def qp_step(Z, n_iters):
        qp = lin(Pc, Z, x0)
        # Pack H's upper triangle / slice D's union columns by STATIC
        # indices (stacking, not gathers — the kernel stays gather-free).
        Hb = jnp.stack([qp.H[:, i, q] for (i, q) in tri], axis=1)
        if mh:
            Db = jnp.stack([qp.D[:, :, c] for c in union_cols], axis=2)
        else:
            Db = jnp.zeros((T, 1, max(nU, 1), SUBS, LANES), dtype)
        dz, _ = _ip_solve(
            Hb, qp.g, qp.A, qp.B, qp.c, Db, qp.e, qp.r0,
            T=T, nz=nz, nx=nx, nu=nu, m=m, row_meta=row_meta,
            stage_mask=stage_mask, n_iters=n_iters, **ip_kwargs)
        return dz

    def make_body(n_iters):
        def sqp_body(_, carry):
            Z, best_Z, best_merit = carry
            dz = qp_step(Z, n_iters)
            Z_new = Z + dz
            # A NaN step (failed QP) keeps the previous iterate (ops/sqp.py
            # fleet-iteration semantics)
            bad = jnp.isnan(jnp.sum(dz, axis=(0, 1)))  # (SUBS, LANES)
            Z_new = jnp.where(bad[None, None], Z, Z_new)
            if not track_best:
                return Z_new, Z_new, best_merit
            mv, _, _, _ = merit(Pc, Z_new, x0)
            better = mv < best_merit
            best_Z = jnp.where(better[None, None], Z_new, best_Z)
            best_merit = jnp.minimum(mv, best_merit)
            return Z_new, best_Z, best_merit
        return sqp_body

    if track_best:
        merit0, _, _, _ = merit(Pc, Z0, x0)
    else:
        merit0 = jnp.zeros((SUBS, LANES), dtype)
    carry = (Z0, Z0, merit0)
    for n_sqp_p, n_qp_p in phases:
        carry = jax.lax.fori_loop(0, n_sqp_p, make_body(n_qp_p), carry)
    _, Z, _ = carry

    _, cost, eq_res, _ = merit(Pc, Z, x0)
    out_ref[...] = jnp.concatenate(
        [Z.reshape(T * nz, SUBS, LANES), cost[None], eq_res[None]], axis=0)


def make_fused_fleet_solver(ocp, config, dtype=jnp.float32,
                            interpret: bool = False):
    """Build the fused fleet solver.

    Same signature/result as :func:`.sqp.make_fleet_sqp_solver`:
    ``solve(all_params (B, N, npar), xinit (B, nx), z_init (B, N+1, nvar))
    -> SQPResult``. Raises at build time if the OCP is not elementwise-
    polymorphic (the caller falls back to the per-iteration pallas backend).
    """
    from .sqp import SQPResult, _f32_safe, _make_machinery

    config = _f32_safe(config, dtype)
    mach = _make_machinery(ocp, config, dtype)
    lin = make_lane_linearizer(ocp, config, dtype)
    merit = make_lane_merit(ocp, config, dtype)

    N, nu, nx, nz, npar = ocp.N, ocp.nu, ocp.nx, ocp.nvar, ocp.npar
    T = N + 1
    stage_mask = mach.stage_mask
    m = stage_mask.shape[1]
    row_meta, h_rows, union_cols = _compact_row_meta(mach.row_meta, nz, m)
    mh = len(h_rows)
    nU = len(union_cols)
    if m == 0:
        # Pad to one all-masked row; _ip_solve short-circuits to the exact
        # equality-constrained solve (see qp_pallas.solve_qp_batched).
        stage_mask = np.zeros((T, 1))
        row_meta = (("box", 0, 1.0),)
        m = 1

    # Eager polymorphism check: trace the linearizer on a tiny abstract batch
    # so an unsupported OCP fails HERE (catchable) rather than inside the
    # pallas trace.
    jax.eval_shape(
        lin,
        jax.ShapeDtypeStruct((npar, T, 2), dtype),
        jax.ShapeDtypeStruct((T, nz, 2), dtype),
        jax.ShapeDtypeStruct((nx, 2), dtype))

    ip_kwargs = dict(
        mu0=1e2, mu_min=config.mu_min, tau=0.995,
        w_max=config.w_max, s_floor=1e-10, tol_freeze=1e-5, warm=False)
    phases = (tuple(tuple(p) for p in config.qp_iter_schedule)
              or ((config.n_sqp, config.n_qp_iter),))

    kernel = functools.partial(
        _fused_kernel, lin=lin, merit=merit, T=T, nz=nz, nx=nx, nu=nu,
        npar=npar, m=m, mh=mh, nU=nU, union_cols=union_cols,
        row_meta=row_meta, stage_mask=stage_mask, phases=phases,
        track_best=config.track_best, ip_kwargs=ip_kwargs)

    in_fields = [npar * T, nx, T * nz]
    out_fields = T * nz + 2

    # Per-tile working-set estimate: kernel inputs + the QP fields built
    # in-kernel + the IP iteration's cached families + linearizer
    # temporaries (Hessian columns dominate).
    ntri = nz * (nz + 1) // 2
    qp_fields = (T * ntri + T * nz + (T - 1) * nx * (nx + nu + 1)
                 + T * max(mh, 1) * nU + T * m + nx)
    ip_work = (5 * T * m + 2 * T * nz * nz
               + (T - 1) * (2 * nu * nx + nu * nu + nx * nx) + 8 * T * nz)
    lin_work = (nz + 2) * T * nz + 2 * npar * T
    work_fields = sum(in_fields) + qp_fields + ip_work + lin_work
    est_bytes = work_fields * SUBS * LANES * jnp.dtype(dtype).itemsize

    def make_call(grid_tiles):
        def spec(fields):
            return pl.BlockSpec((fields, SUBS, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            grid=(grid_tiles,),
            in_specs=[spec(f) for f in in_fields],
            out_specs=spec(out_fields),
            out_shape=jax.ShapeDtypeStruct(
                (out_fields, grid_tiles * SUBS, LANES), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )

    @jax.jit
    def solve(all_params, xinit, z_init):
        B = all_params.shape[0]
        pad = (-B) % TILE_B
        Bp = B + pad
        n_tiles = Bp // TILE_B
        chunked = est_bytes > _PIPELINE_VMEM_BYTES and n_tiles > 1

        P = jnp.concatenate(
            [all_params, all_params[:, -1:]], axis=1).astype(dtype)
        P_f = jnp.transpose(P, (0, 2, 1)).reshape(B, npar * T)
        x_f = xinit.astype(dtype).reshape(B, nx)
        Z_f = z_init.astype(dtype).reshape(B, T * nz)

        def to_lanes(x, fields):
            if pad:
                # Edge-pad with the last real problem: padded lanes stay
                # finite and converge (sliced away below).
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad, fields))], axis=0)
            return x.T.reshape(fields, Bp // LANES, LANES)

        ins = [to_lanes(P_f, in_fields[0]), to_lanes(x_f, in_fields[1]),
               to_lanes(Z_f, in_fields[2])]
        if not chunked:
            out = make_call(n_tiles)(*ins)
        else:
            call = make_call(1)
            stacked = [x.reshape(f, n_tiles, SUBS, LANES).swapaxes(0, 1)
                       for x, f in zip(ins, in_fields)]
            outs = jax.lax.map(lambda xs: call(*xs), tuple(stacked))
            out = outs.swapaxes(0, 1).reshape(out_fields, Bp // LANES, LANES)

        flat = out.reshape(out_fields, Bp).T[:B]
        Z = flat[:, :T * nz].reshape(B, T, nz)
        cost = flat[:, T * nz]
        eq_res = flat[:, T * nz + 1]
        finite = jnp.isfinite(cost) & jnp.all(jnp.isfinite(Z), axis=(1, 2))
        success = (eq_res <= config.res_eq_tol) & finite
        return SQPResult(z=Z, cost=cost, eq_res=eq_res,
                         qp_comp=jnp.zeros_like(cost), success=success,
                         exit_code=jnp.where(success, 1, 0))

    return solve
