"""Lane-layout SQP linearization: QP fields computed with the batch on the
trailing (lane) axis.

The fleet solver's per-iteration cost splits into the fused Pallas QP kernel
(:mod:`.qp_pallas`, batch on the (8, 128) VPU tile) and the XLA-side
linearization (cost quadratics, dynamics Jacobians, constraint rows). The
straightforward ``vmap`` linearization is batch-major: every per-stage scalar
chain runs on tiny (nz,)/(nz, nz) arrays whose minor dimensions waste the
128-lane axis, and its outputs must be transposed into the kernel layout each
iteration. Measured on the bench config this was ~65% of the step
(tools/bench_split.py).

This module evaluates the SAME OCP functions with the batch as a trailing
axis instead: all module/model math is elementwise in the decision variables
(z[i] indexing + broadcasting ops — see modules/, models/dynamics.py,
ops/spline.py), so calling ``ocp.cost_stage(z, p)`` with ``z: (nz, T-1, B)``
and ``p: (npar, T-1, B)`` vectorizes every scalar op over full lanes, and

- gradients come from one ``jax.vjp`` with a ones cotangent (per-column
  gradients of an elementwise-batched scalar function),
- Hessian / Jacobian columns come from ``jax.linearize`` (ONE shared primal
  trace, then one cheap linear pass per one-hot tangent; forward-over-reverse
  for the Hessian) — per-column ``jax.jvp`` would recompute the full primal
  nvar times, which measured SLOWER than the vmap path on TPU,

producing every QP field directly in the kernel's field-major lane layout —
no relayout, no batched-scatter, full VPU utilization.

Semantics are identical to :func:`.sqp._make_machinery`'s ``build_qp`` (same
acados stage conventions, same Gershgorin PSD-ization); parity is pinned by
``tests/test_linearize.py``. Reference analog: this is the "linearization"
half of the acados SQP-RTI iteration (ocp_nlp SQP_RTI preparation phase,
mirrored from mpc_planner_solver/src/acados_solver_interface.cpp:86-204).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class LaneQP(NamedTuple):
    """QP fields in stage-major layout with a trailing batch axis.

    Shapes: H (T, nz, nz, B), g (T, nz, B), A (T-1, nx, nx, B),
    B (T-1, nx, nu, B), c (T-1, nx, B), D (T, mh, nz, B) generic rows only,
    e (T, m, B), r0 (nx, B).
    """

    H: jnp.ndarray
    g: jnp.ndarray
    A: jnp.ndarray
    B: jnp.ndarray
    c: jnp.ndarray
    D: jnp.ndarray
    e: jnp.ndarray
    r0: jnp.ndarray


def _onehot_tangent(n: int, i: int, like, dtype):
    """Tangent e_i broadcast over the trailing axes of ``like``.

    Synthesized from iota (not a captured array constant) so the same code
    traces inside a Pallas kernel (ops/sqp_fused.py), where non-scalar
    captured constants are not supported."""
    io = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (like.ndim - 1), 0)
    return jnp.broadcast_to((io == i).astype(dtype), like.shape)


def _eye(n: int, dtype, extra_dims: int):
    """Identity (n, n) with ``extra_dims`` trailing singleton axes, iota-
    synthesized at full rank (Pallas-safe: no captured constant, and no
    minor-dim-appending reshape, which Mosaic rejects as a shape cast)."""
    shape = (n, n) + (1,) * extra_dims
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (r == c).astype(dtype)


def make_lane_linearizer(ocp, config, dtype=jnp.float32):
    """Build ``lin(P_cols, Z_fields, xinit_cols) -> LaneQP``.

    Input layouts:
      - ``P_cols``: (npar, T, B) — stage-N column repeats stage N-1 (acados
        convention, the caller prepares this once per solve);
      - ``Z_fields``: (T, nz, B) — the iterate in kernel field order;
      - ``xinit_cols``: (nx, B).

    Raises at trace time if the OCP's module/model functions are not
    elementwise-polymorphic (callers fall back to the vmap linearizer).
    """
    N, nu, nx, nvar, nh = ocp.N, ocp.nu, ocp.nx, ocp.nvar, ocp.nh
    T = N + 1
    row_spec = ocp.ineq_row_spec()
    lh = np.asarray(ocp.lh, dtype=np.float64)
    uh = np.asarray(ocp.uh, dtype=np.float64)
    lbz = np.asarray(ocp.lbz, dtype=np.float64)
    ubz = np.asarray(ocp.ubz, dtype=np.float64)

    if config.regularization not in ("gershgorin", "levenberg", "none"):
        raise ValueError(
            "lane linearizer supports elementwise regularizations only "
            f"(gershgorin/levenberg/none), not {config.regularization!r}")

    def lin(P_cols, Z_fields, xinit_cols):
        zv = jnp.moveaxis(Z_fields, 1, 0)  # (nz, T, *b)
        zb = zv[:, :-1]  # (nz, Tb, *b) body stages 0..N-1
        pb = P_cols[:, :-1]  # (npar, Tb, *b)
        bshape = Z_fields.shape[2:]  # trailing batch axes: (B,) in the lane
        nb = len(bshape)             # pipeline, (SUBS, LANES) in-kernel
        Tb = T - 1

        # ---- cost quadratics, body stages --------------------------------
        def cost_b(z):
            return ocp.cost_stage(z, pb)

        def grad_b(z):
            out, vjp_fn = jax.vjp(cost_b, z)
            return vjp_fn(jnp.ones_like(out))[0]  # (nz, Tb, B)

        g_body, grad_lin = jax.linearize(grad_b, zb)
        H_cols = [grad_lin(_onehot_tangent(nvar, i, zb, dtype))
                  for i in range(nvar)]  # each (nz, Tb, B) = column i
        # Assemble (Tb, nz, nz, B), [k, i, q, b] = d2f/dz_i dz_q
        H_body = jnp.stack(
            [jnp.stack([H_cols[q][i] for q in range(nvar)], axis=0)
             for i in range(nvar)], axis=0)  # (nz, nz, Tb, B)
        H_body = jnp.moveaxis(H_body, 2, 0)  # (Tb, nz, nz, B)
        g_body = jnp.moveaxis(g_body, 1, 0)  # (Tb, nz, B)

        # ---- terminal cost on x -------------------------------------------
        # lax.index_in_dim = static slice + squeeze; jnp's int indexing would
        # emit dynamic_slice, which Pallas TPU cannot lower (ops/sqp_fused.py
        # traces this function in-kernel)
        xT = jax.lax.index_in_dim(zv, T - 1, axis=1, keepdims=False)[nu:]
        pT = jax.lax.index_in_dim(P_cols, T - 1, axis=1, keepdims=False)

        def cost_T(x):
            return ocp.cost_terminal(x, pT)

        def grad_T(x):
            out, vjp_fn = jax.vjp(cost_T, x)
            return vjp_fn(jnp.ones_like(out))[0]

        g_T, gradT_lin = jax.linearize(grad_T, xT)  # (nx, B)
        HT_cols = [gradT_lin(_onehot_tangent(nx, i, xT, dtype))
                   for i in range(nx)]
        H_T = jnp.stack(
            [jnp.stack([HT_cols[q][i] for q in range(nx)], axis=0)
             for i in range(nx)], axis=0)  # (nx, nx, B)

        # Terminal stage block: identity on u (matches sqp.py build_qp), H_T on x
        eye_u = jnp.broadcast_to(_eye(nu, dtype, nb), (nu, nu) + bshape)
        zer_ux = jnp.zeros((nu, nx) + bshape, dtype)
        H_last = jnp.concatenate([
            jnp.concatenate([eye_u, zer_ux], axis=1),
            jnp.concatenate([jnp.swapaxes(zer_ux, 0, 1), H_T], axis=1),
        ], axis=0)  # (nz, nz, B)
        g_last = jnp.concatenate([jnp.zeros((nu,) + bshape, dtype), g_T],
                                 axis=0)

        H = jnp.concatenate([H_body, H_last[None]], axis=0)  # (T, nz, nz, B)
        g = jnp.concatenate([g_body, g_last[None]], axis=0)  # (T, nz, B)

        # ---- regularization (elementwise; fleet default = gershgorin) ----
        if config.regularization == "gershgorin":
            diag = jnp.stack([H[:, i, i] for i in range(nvar)], axis=1)  # (T,nz,*b)
            offdiag = jnp.sum(jnp.abs(H), axis=2) - jnp.abs(diag)
            bound = jnp.min(diag - offdiag, axis=1)  # (T, B)
            shift = jnp.maximum(0.0, config.reg_eps - bound)  # (T, *b)
            H = H + shift[:, None, None] * _eye(nvar, dtype, nb)
        elif config.regularization == "levenberg":
            H = H + config.levenberg * _eye(nvar, dtype, nb)

        # ---- dynamics linearization ---------------------------------------
        ub = zb[:nu]
        xb = zb[nu:]

        def dyn(x, u):
            return ocp.dynamics(x, u, pb)  # (nx, Tb, B)

        f, dyn_lin = jax.linearize(dyn, xb, ub)
        zeros_x = jnp.zeros_like(xb)
        zeros_u = jnp.zeros_like(ub)
        A_cols = [dyn_lin(_onehot_tangent(nx, j, xb, dtype), zeros_u)
                  for j in range(nx)]
        B_cols = [dyn_lin(zeros_x, _onehot_tangent(nu, j, ub, dtype))
                  for j in range(nu)]
        A = jnp.moveaxis(jnp.stack(A_cols, axis=1), 2, 0)  # (Tb, nx, nx, B)
        Bm = jnp.moveaxis(jnp.stack(B_cols, axis=1), 2, 0)  # (Tb, nx, nu, B)
        c = jnp.moveaxis(f - zv[nu:, 1:], 1, 0)  # (Tb, nx, B)

        # ---- inequality rows ----------------------------------------------
        # Generic h rows need value + Jacobian; box rows are analytic. Stage N
        # is fully masked in the kernel (static stage mask): its D entries are
        # zeros and e entries ones — finite placeholders, statically unused.
        if nh > 0:
            def ineq_b(z):
                return ocp.ineq(z, pb)  # (nh, Tb, B)

            h, ineq_lin = jax.linearize(ineq_b, zb)
            C_cols = [ineq_lin(_onehot_tangent(nvar, j, zb, dtype))
                      for j in range(nvar)]  # each (nh, Tb, B)
        D_rows, e_rows = [], []
        for kind, i in row_spec:
            if kind == "hl":
                D_rows.append([C_cols[j][i] for j in range(nvar)])
                e_rows.append(h[i] - lh[i])
            elif kind == "hu":
                D_rows.append([-C_cols[j][i] for j in range(nvar)])
                e_rows.append(uh[i] - h[i])
            elif kind == "zl":
                D_rows.append(None)
                e_rows.append(zb[i] - lbz[i])
            else:  # zu
                D_rows.append(None)
                e_rows.append(ubz[i] - zb[i])
        generic = [r for r in D_rows if r is not None]
        if generic:
            D_b = jnp.stack(
                [jnp.stack(r, axis=0) for r in generic], axis=0)
            D_b = jnp.moveaxis(D_b, 2, 0)  # (Tb, mh, nz, B)
        else:
            D_b = jnp.zeros((Tb, 1, nvar) + bshape, dtype)
        D = jnp.concatenate(
            [D_b, jnp.zeros((1,) + D_b.shape[1:], dtype)], axis=0)
        if e_rows:
            e_b = jnp.moveaxis(jnp.stack(e_rows, axis=0), 1, 0)  # (Tb, m, B)
            e = jnp.concatenate([e_b, jnp.ones((1,) + e_b.shape[1:], dtype)],
                                axis=0)
        else:
            e = jnp.ones(((T, 0) + bshape), dtype)

        r0 = xinit_cols - zv[nu:, 0]  # (nx, B)
        return LaneQP(H=H, g=g, A=A, B=Bm, c=c, D=D, e=e, r0=r0)

    return lin


def make_lane_merit(ocp, config, dtype=jnp.float32):
    """Per-lane merit/cost/eq-residual on column layouts.

    ``merit(P_cols, Z_fields, xinit_cols) -> (merit, cost, eq_res, finite)``,
    each (B,). Same definition as sqp.make_sqp_solver's merit_of: cost +
    merit_eq_weight * max(|dynamics defects|, |xinit - x_0|), inf when
    non-finite.
    """

    nu = ocp.nu

    def merit(P_cols, Z_fields, xinit_cols):
        zv = jnp.moveaxis(Z_fields, 1, 0)  # (nz, T, B)
        zb = zv[:, :-1]
        pb = P_cols[:, :-1]
        f = ocp.dynamics(zv[nu:, :-1], zv[:nu, :-1], pb)  # (nx, Tb, B)
        eq_res = jnp.maximum(
            jnp.max(jnp.abs(f - zv[nu:, 1:]), axis=(0, 1)),
            jnp.max(jnp.abs(xinit_cols - zv[nu:, 0]), axis=0))  # (B,)
        stage_costs = ocp.cost_stage(zb, pb)  # (Tb, B)
        xT = jax.lax.index_in_dim(zv, zv.shape[1] - 1, axis=1,
                                  keepdims=False)[nu:]  # static slice
        pT = jax.lax.index_in_dim(P_cols, P_cols.shape[1] - 1, axis=1,
                                  keepdims=False)
        cost = jnp.sum(stage_costs, axis=0) + ocp.cost_terminal(xT, pT)  # (B,)
        finite = jnp.isfinite(cost) & jnp.all(
            jnp.isfinite(Z_fields), axis=(0, 1))
        merit_v = jnp.where(
            finite, cost + config.merit_eq_weight * eq_res, jnp.inf)
        return merit_v, cost, eq_res, finite

    return merit
