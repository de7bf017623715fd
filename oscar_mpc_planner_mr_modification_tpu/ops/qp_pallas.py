"""Fused Pallas TPU kernel: batched stagewise interior-point QP solver.

The XLA composition of :mod:`.qp` wastes the VPU on tiny-minor-dimension padding
(5x5 matrices land in (8,128) tiles at ~2% utilization; measured ~2k solves/s/chip
on v5e). This kernel flips the layout: the *batch* fills a full (8, 128) VPU tile
(sublanes x lanes) and every "scalar" of the small per-stage matrices is one such
tile - the entire predictor-corrector iteration is batch-parallel with no
cross-batch communication, so each vector instruction retires 1024 problems' worth
of one scalar FMA.

Layout contract (wrapper :func:`solve_qp_batched`):
- every QP field is laid out host-side as ``(fields, B/LANES, LANES)``; the grid
  tiles the middle axis in chunks of SUBS=8, so inside the kernel each field is a
  natural ``(8, 128)`` tile - no in-kernel relayout;
- one grid program solves TILE_B = 1024 problems end-to-end (all ``n_iters``
  Mehrotra iterations + Riccati sweeps) in VMEM;
- stage/row-structured bulk math runs on ``(T, ..., 8, 128)`` arrays; the
  sequential Riccati recursion is unrolled over the static horizon; all small
  contractions are explicit Python loops (pure VPU FMAs, no dot_general).

Constraint-row capacity (the m axis): three structural levers keep large-m
configurations (SH-MPC: 24 scenario halfspaces + slack + boxes = 40 rows;
reference sizing mpc_planner_modules/scripts/scenario_constraints.py:14-94)
inside VMEM:
- *box rows* (one-sided variable bounds, exactly one +-1 entry) are treated
  analytically via static (column, sign) metadata - no D storage, diagonal-only
  Hbar updates, single-slice contractions;
- the *stage activity mask* is a compile-time constant (it is identical for
  every problem in the batch), so no mask input and no masked dead compute for
  all-inactive rows;
- per-iteration (T, m, 8, 128) temporaries are limited to three cached
  residual/step families (r_ineq, affine ds, corrector ds); everything else is
  recomputed row-wise from cheap elementwise identities.
When the working-set estimate still exceeds the pipelined-VMEM budget the
wrapper falls back to per-tile ``grid=(1,)`` calls under ``lax.map`` (single
buffering; the lost DMA overlap is negligible - the kernel is compute-bound).

Algorithm identical to :func:`.qp.solve_qp` (Mehrotra predictor-corrector, shared
Riccati factorization, separate primal/dual fraction-to-boundary steps,
convergence freeze, W clamp); see that module's derivation. Defaults are the
f32/TPU operating point (mu_min 1e-6, w_max 1e6).
"""

from __future__ import annotations

import functools
import types as _types

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBS = 8
LANES = 128
TILE_B = SUBS * LANES  # 1024 problems per grid program

# Working-set budget for the pipelined (multi-buffer) path; above this the
# wrapper switches to per-tile grid=(1,) calls (single buffering).
_PIPELINE_VMEM_BYTES = 64 * 1024 * 1024


# ---------------------------------------------------------------------------
# Small-matrix helpers on nested lists of (SUBS, LANES) tiles
# ---------------------------------------------------------------------------
def _matmul(A, B, transpose_a=False):
    p = len(A[0]) if transpose_a else len(A)
    q = len(A) if transpose_a else len(A[0])
    r = len(B[0])
    out = []
    for i in range(p):
        row = []
        for j in range(r):
            acc = None
            for k in range(q):
                a = A[k][i] if transpose_a else A[i][k]
                term = a * B[k][j]
                acc = term if acc is None else acc + term
            row.append(acc)
        out.append(row)
    return out


def _matvec(A, v, transpose_a=False):
    p = len(A[0]) if transpose_a else len(A)
    q = len(A) if transpose_a else len(A[0])
    out = []
    for i in range(p):
        acc = None
        for k in range(q):
            a = A[k][i] if transpose_a else A[i][k]
            term = a * v[k]
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _madd(A, B):
    return [[A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def _vadd(a, b):
    return [x + y for x, y in zip(a, b)]


def _spd_inv(M):
    """Closed-form SPD inverse for n in {1, 2, 3} on tiles."""
    n = len(M)
    if n == 1:
        return [[1.0 / M[0][0]]]
    if n == 2:
        a, b, d = M[0][0], M[0][1], M[1][1]
        inv_det = 1.0 / (a * d - b * b)
        return [[d * inv_det, -b * inv_det], [-b * inv_det, a * inv_det]]
    if n == 3:
        a, b, c = M[0][0], M[0][1], M[0][2]
        d, e, f = M[1][1], M[1][2], M[2][2]
        A00 = d * f - e * e
        A01 = c * e - b * f
        A02 = b * e - c * d
        A11 = a * f - c * c
        A12 = b * c - a * e
        A22 = a * d - b * b
        inv_det = 1.0 / (a * A00 + b * A01 + c * A02)
        return [[A00 * inv_det, A01 * inv_det, A02 * inv_det],
                [A01 * inv_det, A11 * inv_det, A12 * inv_det],
                [A02 * inv_det, A12 * inv_det, A22 * inv_det]]
    raise NotImplementedError(f"nu={n}")


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------
def _qp_kernel(H_ref, g_ref, A_ref, B_ref, c_ref, D_ref, e_ref, r0_ref,
               *rest, T, nz, nx, nu, m, mh, nU, row_meta, stage_mask, n_iters,
               mu0, mu_min, tau, w_max, s_floor, tol_freeze,
               warm=False, duals_out=False):
    """One grid program: solve TILE_B QPs end-to-end in VMEM.

    ``rest`` holds the optional warm-start input and the output ref(s):
    cold:             (z_ref,)                      or (z_ref, lam_ref)
    warm (lam0 input): (lam0_ref, z_ref)            or (lam0_ref, z_ref, lam_ref)
    ``warm`` seeds the dual variables from a previous (re-linearized) solve —
    the SQP loop carries them so warm QP solves need fewer IP iterations (the
    acados analog: warm_start_first_qp + HPIPM dual warm starts)."""
    if warm:
        lam0_ref, rest = rest[0], rest[1:]
    z_ref = rest[0]
    lam_ref = rest[1] if duals_out else None

    # Bulk loads; trailing dims are the (SUBS, LANES) batch tile.
    # H ships as its upper triangle only (symmetric: nz(nz+1)/2 entries).
    ntri = nz * (nz + 1) // 2
    Hb = H_ref[...].reshape(T, ntri, SUBS, LANES)
    gb = g_ref[...].reshape(T, nz, SUBS, LANES)
    Ab = A_ref[...].reshape(T - 1, nx, nx, SUBS, LANES)
    Bb = B_ref[...].reshape(T - 1, nx, nu, SUBS, LANES)
    cb = c_ref[...].reshape(T - 1, nx, SUBS, LANES)
    Db = D_ref[...].reshape(T, max(mh, 1), nU, SUBS, LANES)
    eb = e_ref[...].reshape(T, m, SUBS, LANES)
    r0b = r0_ref[...].reshape(nx, SUBS, LANES)
    lam0b = (lam0_ref[...].reshape(T, m, SUBS, LANES) if warm else None)

    z, lam = _ip_solve(
        Hb, gb, Ab, Bb, cb, Db, eb, r0b, lam0b, T=T, nz=nz, nx=nx, nu=nu,
        m=m, row_meta=row_meta, stage_mask=stage_mask, n_iters=n_iters,
        mu0=mu0, mu_min=mu_min, tau=tau, w_max=w_max, s_floor=s_floor,
        tol_freeze=tol_freeze, warm=warm)
    z_ref[...] = z.reshape(T * nz, SUBS, LANES)
    if duals_out:
        lam_ref[...] = lam.reshape(T * m, SUBS, LANES)


def _tri_map(nz):
    """(i, q) -> packed upper-triangle index."""
    _tri = {}
    t = 0
    for i in range(nz):
        for q in range(i, nz):
            _tri[(i, q)] = _tri[(q, i)] = t
            t += 1
    return _tri


def _ip_solve(Hb, gb, Ab, Bb, cb, Db, eb, r0b, lam0b=None, *, T, nz, nx, nu,
              m, row_meta, stage_mask, n_iters, mu0, mu_min, tau, w_max,
              s_floor, tol_freeze, warm=False):
    """Mehrotra predictor-corrector IP on in-VMEM tile values.

    Inputs are (stage/field..., SUBS, LANES) arrays as documented in the
    module header; returns ``(z, lam)`` with z (T, nz, SUBS, LANES) and lam
    (T, m, SUBS, LANES) (lam is zeros when no row is active). Factored out of
    the kernel body so the fused whole-SQP kernel (ops/sqp_fused.py) can call
    the same interior-point iteration on fields it linearized in-kernel."""
    _tri = _tri_map(nz)

    dtype = Hb.dtype
    # Static per-row stage-activity masks, synthesized in-kernel from iota
    # run-length comparisons (pallas forbids captured array constants; the
    # masks are 0/1 interval patterns over the stage axis)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)

    def mask_const(col):
        runs = []
        t = 0
        while t < T:
            if col[t] > 0:
                lo = t
                while t < T and col[t] > 0:
                    t += 1
                runs.append((lo, t))
            else:
                t += 1
        acc = None
        for lo, hi in runs:
            term = (iota_t >= lo) & (iota_t < hi)
            acc = term if acc is None else acc | term
        return jnp.where(acc, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))

    masks = [mask_const(stage_mask[:, r]) if stage_mask[:, r].any() else None
             for r in range(m)]
    active = [bool(stage_mask[:, r].any()) for r in range(m)]
    act_rows = [r for r in range(m) if active[r]]
    n_act = max(float(stage_mask.sum()), 1.0)  # python scalar

    big = jnp.asarray(3e38, dtype)
    v0 = jnp.sqrt(jnp.asarray(mu0, dtype))

    def row_Dz(r, zv):
        """(D z)[row r] over all stages -> (T, S, L). Generic rows contract
        only their static column support (meta = ("h", slot, ((u, col), ...))
        with u indexing the compacted D storage)."""
        meta = row_meta[r]
        if meta[0] == "box":
            return meta[2] * zv[:, meta[1]]
        j, pairs = meta[1], meta[2]
        if not pairs:
            return jnp.zeros_like(zv[:, 0])
        acc = Db[:, j, pairs[0][0]] * zv[:, pairs[0][1]]
        for ui, zc in pairs[1:]:
            acc = acc + Db[:, j, ui] * zv[:, zc]
        return acc

    if warm:
        # Dual warm start: slacks re-seeded from the NEW linearization's
        # residuals (floored off the boundary), multipliers carried over
        # (clipped strictly positive). Active-set information survives the
        # re-linearization; the path-following restart is short.
        s_wfloor = jnp.asarray(10.0 * float(np.sqrt(mu_min)), dtype)
        lam_floor = jnp.asarray(mu_min, dtype)
        s_init = jnp.stack(
            [jnp.where(masks[r] > 0, jnp.maximum(eb[:, r], s_wfloor),
                       jnp.ones_like(eb[:, r])) if active[r]
             else jnp.ones_like(eb[:, r]) for r in range(m)], axis=1)
        lam_init = jnp.stack(
            [jnp.where(masks[r] > 0,
                       jnp.clip(lam0b[:, r], lam_floor, w_max),
                       jnp.zeros_like(eb[:, r])) if active[r]
             else jnp.zeros_like(eb[:, r]) for r in range(m)], axis=1)
    else:
        s_init = jnp.stack(
            [jnp.where(masks[r] > 0, jnp.maximum(eb[:, r], v0),
                       jnp.ones_like(eb[:, r])) if active[r]
             else jnp.ones_like(eb[:, r]) for r in range(m)], axis=1)
        lam_init = jnp.stack(
            [jnp.where(masks[r] > 0, mu0 / s_init[:, r],
                       jnp.zeros_like(eb[:, r])) if active[r]
             else jnp.zeros_like(eb[:, r]) for r in range(m)], axis=1)
    z0 = jnp.zeros((T, nz, SUBS, LANES), dtype)

    def factor(Hbar):
        """Backward matrix sweep (unrolled). ``Hbar[i][q]`` is a (T,S,L) array;
        returns per-stage factor lists."""
        def hb_at(k, rows, cols, row0=0, col0=0):
            return [[Hbar[row0 + i][col0 + q][k] for q in range(cols)]
                    for i in range(rows)]

        def mat_at(V, k, rows, cols):
            return [[V[k, i, q] for q in range(cols)] for i in range(rows)]

        Ks = [None] * (T - 1)
        Linvs = [None] * (T - 1)
        Quxs = [None] * (T - 1)
        Pnexts = [None] * (T - 1)
        P = hb_at(T - 1, nx, nx, row0=nu, col0=nu)
        for k in range(T - 2, -1, -1):
            A_k = mat_at(Ab, k, nx, nx)
            B_k = mat_at(Bb, k, nx, nu)
            PA = _matmul(P, A_k)
            PB = _matmul(P, B_k)
            Quu = _madd(hb_at(k, nu, nu),
                        _matmul(B_k, PB, transpose_a=True))
            Qux = _madd(hb_at(k, nu, nx, col0=nu),
                        _matmul(B_k, PA, transpose_a=True))
            Qxx = _madd(hb_at(k, nx, nx, row0=nu, col0=nu),
                        _matmul(A_k, PA, transpose_a=True))
            Linv = _spd_inv(Quu)
            K = [[-v for v in row] for row in _matmul(Linv, Qux)]
            QK = _matmul(Qux, K, transpose_a=True)
            P_new = [[0.5 * (Qxx[i][j] + QK[i][j] + Qxx[j][i] + QK[j][i])
                      for j in range(nx)] for i in range(nx)]
            Ks[k], Linvs[k], Quxs[k], Pnexts[k] = K, Linv, Qux, P
            P = P_new
        return Ks, Linvs, Quxs, Pnexts

    def solve_vec(fact, gbar, rd, r0_res):
        """Vector sweep + forward rollout. gbar: [(T,S,L)] * nz; rd:
        (T-1,nx,S,L); r0_res: list of nx (S,L). Returns dz (T,nz,S,L)."""
        def mat_at(V, k, rows, cols):
            return [[V[k, i, q] for q in range(cols)] for i in range(rows)]

        Ks, Linvs, Quxs, Pnexts = fact
        p = [gbar[nu + i][T - 1] for i in range(nx)]
        kffs = [None] * (T - 1)
        for k in range(T - 2, -1, -1):
            A_k = mat_at(Ab, k, nx, nx)
            B_k = mat_at(Bb, k, nx, nu)
            c_k = [rd[k, i] for i in range(nx)]
            beta = _vadd(p, _matvec(Pnexts[k], c_k))
            qu = _vadd([gbar[i][k] for i in range(nu)],
                       _matvec(B_k, beta, transpose_a=True))
            qx = _vadd([gbar[nu + i][k] for i in range(nx)],
                       _matvec(A_k, beta, transpose_a=True))
            kff = [-v for v in _matvec(Linvs[k], qu)]
            p = _vadd(qx, _matvec(Quxs[k], kff, transpose_a=True))
            kffs[k] = kff
        dz_rows = []
        dx = r0_res
        for k in range(T - 1):
            A_k = mat_at(Ab, k, nx, nx)
            B_k = mat_at(Bb, k, nx, nu)
            du = _vadd(_matvec(Ks[k], dx), kffs[k])
            dz_rows.append(jnp.stack(du + dx))  # (nz, S, L)
            dx = _vadd(_vadd(_matvec(A_k, dx), _matvec(B_k, du)),
                       [rd[k, i] for i in range(nx)])
        dz_rows.append(jnp.stack([jnp.zeros_like(dx[0])] * nu + dx))
        return jnp.stack(dz_rows)  # (T, nz, S, L)

    if not act_rows:
        # No active inequality rows at any stage (m == 0 is padded to one
        # all-masked row by the wrappers): the QP is equality-constrained and
        # ONE exact Riccati solve from z = 0 finishes it. Previously this
        # shape crashed at trace time on comp/feas/alpha_aff = None (round-2
        # ADVICE finding).
        Hbar0 = [[Hb[:, _tri[(i, q)]] for q in range(nz)] for i in range(nz)]
        fact0 = factor(Hbar0)
        dz0 = solve_vec(fact0, [gb[:, i] for i in range(nz)], cb,
                        [r0b[i] for i in range(nx)])
        return dz0, jnp.zeros((T, m, SUBS, LANES), dtype)

    def ftb_row(r, v, dv):
        """Fraction-to-boundary per row -> (S, L) min over stages."""
        ratio = jnp.where(dv < 0, -v / jnp.minimum(dv, -1e-30), big)
        ratio = jnp.where(masks[r] > 0, ratio, big)
        return jnp.min(ratio, axis=0)

    def body(it, carry):
        z, s, lam = carry

        # ---- Pass A: residuals, W, Hbar accumulation, comp, feas ---------
        # Hbar as nested [i][q] lists of (T,S,L) so diagonal (box) updates and
        # outer-product (generic) updates are slice-local, no scatter.
        Hbar = [[Hb[:, _tri[(i, q)]] for q in range(nz)] for i in range(nz)]
        rin_rows = [None] * m  # cached residuals r_ineq (one (T,S,L) per row)
        comp = None
        feas = None
        for r in act_rows:
            rin = row_Dz(r, z) + eb[:, r] - s[:, r]
            rin_rows[r] = rin
            W_r = jnp.minimum(masks[r] * lam[:, r] / s[:, r], w_max)
            meta = row_meta[r]
            if meta[0] == "box":
                col = meta[1]  # sign^2 == 1
                Hbar[col][col] = Hbar[col][col] + W_r
            else:
                j, pairs = meta[1], meta[2]
                for ui_a, col_a in pairs:
                    DW = Db[:, j, ui_a] * W_r
                    for ui_b, col_b in pairs:
                        Hbar[col_a][col_b] = (Hbar[col_a][col_b]
                                              + DW * Db[:, j, ui_b])
            c_r = jnp.sum(masks[r] * s[:, r] * lam[:, r], axis=0)
            comp = c_r if comp is None else comp + c_r
            f_r = jnp.max(jnp.abs(masks[r] * rin), axis=0)
            feas = f_r if feas is None else jnp.maximum(feas, f_r)
        comp = comp / n_act
        fact = factor(Hbar)

        # ---- equality residuals (dynamics defects + initial condition) ---
        du = z[:-1, :nu]
        dx = z[:-1, nu:]
        dx_next = z[1:, nu:]
        rd_parts = []
        for i in range(nx):
            acc = cb[:, i] - dx_next[:, i]
            for j in range(nx):
                acc = acc + Ab[:, i, j] * dx[:, j]
            for j in range(nu):
                acc = acc + Bb[:, i, j] * du[:, j]
            rd_parts.append(acc)
        rd = jnp.stack(rd_parts, axis=1)  # (T-1, nx, S, L)
        r0_res = [r0b[i] - z[0, nu + i] for i in range(nx)]

        Hz_g = []
        for i in range(nz):
            acc = gb[:, i]
            for j in range(nz):
                acc = acc + Hb[:, _tri[(i, j)]] * z[:, j]
            Hz_g.append(acc)  # [(T,S,L)] * nz

        def gbar_accum(rhs3_rows):
            """gbar = Hz+g + sum_r D_r^T w_r with w_r = mask (lam rin - rhs3)/s."""
            gbar = [x for x in Hz_g]
            for r in act_rows:
                rhs3_r = rhs3_rows[r] if rhs3_rows is not None else 0.0
                w_vec = (masks[r] * (lam[:, r] * rin_rows[r] - rhs3_r)
                         / s[:, r])
                meta = row_meta[r]
                if meta[0] == "box":
                    col, sign = meta[1], meta[2]
                    gbar[col] = gbar[col] + sign * w_vec
                else:
                    j, pairs = meta[1], meta[2]
                    for ui, zc in pairs:
                        gbar[zc] = gbar[zc] + Db[:, j, ui] * w_vec
            return gbar

        def dlam_of(r, rhs3_r, ds_r):
            d = (rhs3_r - s[:, r] * lam[:, r]) / s[:, r] \
                - (lam[:, r] / s[:, r]) * ds_r
            return jnp.where(masks[r] > 0, d, 0.0)

        # ---- affine (predictor) step -------------------------------------
        dz_a = solve_vec(fact, gbar_accum(None), rd, r0_res)
        ds_a_rows = [None] * m
        alpha_aff = None
        for r in act_rows:
            ds_a = row_Dz(r, dz_a) + rin_rows[r]
            ds_a = jnp.where(masks[r] > 0, ds_a, 0.0)
            ds_a_rows[r] = ds_a
            dlam_a = dlam_of(r, 0.0, ds_a)
            a_r = jnp.minimum(ftb_row(r, s[:, r], ds_a),
                              ftb_row(r, lam[:, r], dlam_a))
            alpha_aff = a_r if alpha_aff is None else jnp.minimum(alpha_aff,
                                                                  a_r)
        alpha_aff = jnp.minimum(1.0, alpha_aff)

        comp_aff = None
        for r in act_rows:
            dlam_a = dlam_of(r, 0.0, ds_a_rows[r])
            s_aff = s[:, r] + alpha_aff[None] * ds_a_rows[r]
            lam_aff = lam[:, r] + alpha_aff[None] * dlam_a
            c_r = jnp.sum(masks[r] * s_aff * lam_aff, axis=0)
            comp_aff = c_r if comp_aff is None else comp_aff + c_r
        comp_aff = comp_aff / n_act
        sigma = jnp.clip((comp_aff / jnp.maximum(comp, 1e-30)) ** 3, 1e-8, 1.0)
        mu = jnp.maximum(sigma * comp, mu_min)  # (S, L)

        # ---- corrector step ----------------------------------------------
        rhs3_rows = [None] * m
        for r in act_rows:
            dlam_a = dlam_of(r, 0.0, ds_a_rows[r])
            rhs3_rows[r] = mu[None] - ds_a_rows[r] * dlam_a
        dz = solve_vec(fact, gbar_accum(rhs3_rows), rd, r0_res)

        ds_rows = [None] * m
        alpha_p = None
        alpha_d = None
        nan_acc = jnp.sum(dz, axis=(0, 1))
        for r in act_rows:
            ds_r = row_Dz(r, dz) + rin_rows[r]
            ds_r = jnp.where(masks[r] > 0, ds_r, 0.0)
            ds_rows[r] = ds_r
            dlam_r = dlam_of(r, rhs3_rows[r], ds_r)
            nan_acc = nan_acc + jnp.sum(dlam_r, axis=0)
            ap = ftb_row(r, s[:, r], ds_r)
            ad = ftb_row(r, lam[:, r], dlam_r)
            alpha_p = ap if alpha_p is None else jnp.minimum(alpha_p, ap)
            alpha_d = ad if alpha_d is None else jnp.minimum(alpha_d, ad)
        alpha_p = jnp.minimum(1.0, tau * alpha_p)  # (S, L)
        alpha_d = jnp.minimum(1.0, tau * alpha_d)

        eqr = jnp.max(jnp.abs(rd), axis=(0, 1))
        eqr = jnp.maximum(eqr, jnp.max(jnp.abs(jnp.stack(r0_res)), axis=0))
        done = ((comp < tol_freeze) & (feas < 100.0 * tol_freeze)
                & (eqr < 100.0 * tol_freeze))
        if warm:
            # Carried duals make complementarity tiny at dz=0 even though the
            # NEW QP is unsolved (the freeze check has no stationarity term);
            # require one full Mehrotra iteration before freezing.
            done = done & (it >= 1)
        bad = jnp.isnan(nan_acc)
        scale = jnp.where(done | bad, 0.0, 1.0)  # (S, L)
        alpha_p = (alpha_p * scale)[None]
        alpha_d = (alpha_d * scale)[None]

        z = z + alpha_p[None] * dz
        s_new = []
        lam_new = []
        for r in range(m):
            if not active[r]:
                s_new.append(s[:, r])
                lam_new.append(lam[:, r])
                continue
            dlam_r = dlam_of(r, rhs3_rows[r], ds_rows[r])
            s_r = jnp.where(masks[r] > 0,
                            jnp.maximum(s[:, r] + alpha_p * ds_rows[r],
                                        s_floor),
                            jnp.ones_like(s[:, r]))
            l_r = jnp.where(masks[r] > 0,
                            jnp.maximum(lam[:, r] + alpha_d * dlam_r, 0.0),
                            jnp.zeros_like(lam[:, r]))
            s_new.append(s_r)
            lam_new.append(l_r)
        s = jnp.stack(s_new, axis=1)
        lam = jnp.stack(lam_new, axis=1)
        return z, s, lam

    z, s, lam = jax.lax.fori_loop(0, n_iters, body, (z0, s_init, lam_init))
    return z, lam


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------
def _compact_row_meta(row_meta, nz, m):
    """Compact generic-row metadata for sparse D storage.

    Returns ``(row_meta, h_rows, union_cols)``: generic rows are re-mapped to
    their compacted D storage slots, each carrying its static
    (union_index, z_column) contraction pairs. A legacy ``("h", slot)`` entry
    (no support info) makes every column supported (dense fallback)."""
    if row_meta is None:
        row_meta = tuple(("h", r) for r in range(m))
    h_rows = [r for r, meta in enumerate(row_meta) if meta[0] == "h"]
    dense = any(meta[0] == "h" and len(meta) < 3 for meta in row_meta)
    if dense:
        union_cols = tuple(range(nz))
    else:
        cols = set()
        for meta in row_meta:
            if meta[0] == "h":
                cols.update(meta[2])
        union_cols = tuple(sorted(cols)) if cols else (0,)
    u_of = {c: u for u, c in enumerate(union_cols)}
    row_meta = tuple(
        ("h", h_rows.index(r),
         tuple((u_of[c], c) for c in (meta[2] if not dense and len(meta) > 2
                                      else range(nz))))
        if meta[0] == "h" else meta
        for r, meta in enumerate(row_meta))
    return row_meta, h_rows, union_cols


@functools.lru_cache(maxsize=64)
def _make_solver(shape_key, mask_bytes, row_meta, nu, n_iters, mu0, mu_min,
                 tau, w_max, s_floor, tol_freeze, interpret, dtype_str,
                 warm=False, duals_out=False):
    Bt, T, nz, nx, m = shape_key
    dtype = jnp.dtype(dtype_str)
    stage_mask = np.frombuffer(mask_bytes, dtype=np.float64).reshape(T, m)
    # Static column support of the generic rows (sparse D): the union of the
    # per-row supports is the D storage width; rows address their own columns
    # inside the union.
    row_meta, h_rows, union_cols = _compact_row_meta(row_meta, nz, m)
    mh = len(h_rows)
    h_idx = np.asarray(h_rows, dtype=np.int64)
    nU = len(union_cols)

    pad = (-Bt) % TILE_B
    Bp = Bt + pad
    n_tiles = Bp // TILE_B

    itemsize = dtype.itemsize
    ntri = nz * (nz + 1) // 2  # H ships as its upper triangle (symmetric)
    tri_iu, tri_ju = np.triu_indices(nz)
    fields_in = (T * ntri + T * nz + (T - 1) * nx * nx + (T - 1) * nx * nu
                 + (T - 1) * nx + T * max(mh, 1) * nU + T * m + nx
                 + (T * m if warm else 0))
    # Rough per-tile working set: inputs + 3 cached (T,m) row families +
    # s/lam state + Hbar + factor lists + a few (T,nz) vectors
    work_fields = (fields_in + 5 * T * m + 2 * T * nz * nz
                   + (T - 1) * (2 * nu * nx + nu * nu + nx * nx) + 8 * T * nz)
    est_bytes = work_fields * SUBS * LANES * itemsize
    chunked = est_bytes > _PIPELINE_VMEM_BYTES and n_tiles > 1

    kernel = functools.partial(
        _qp_kernel, T=T, nz=nz, nx=nx, nu=nu, m=m, mh=mh, nU=nU,
        row_meta=row_meta, stage_mask=stage_mask, n_iters=n_iters, mu0=mu0,
        mu_min=mu_min, tau=tau, w_max=w_max, s_floor=s_floor,
        tol_freeze=tol_freeze, warm=warm, duals_out=duals_out)

    in_fields = [T * ntri, T * nz, (T - 1) * nx * nx, (T - 1) * nx * nu,
                 (T - 1) * nx, T * max(mh, 1) * nU, T * m, nx]
    if warm:
        in_fields.append(T * m)
    out_fields = T * nz
    out_fields_all = [T * nz] + ([T * m] if duals_out else [])

    def make_call(grid_tiles):
        def spec(fields):
            return pl.BlockSpec((fields, SUBS, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        multi = len(out_fields_all) > 1
        return pl.pallas_call(
            kernel,
            grid=(grid_tiles,),
            in_specs=[spec(f) for f in in_fields],
            out_specs=[spec(f) for f in out_fields_all] if multi
            else spec(out_fields),
            out_shape=[jax.ShapeDtypeStruct(
                (f, grid_tiles * SUBS, LANES), dtype)
                for f in out_fields_all] if multi
            else jax.ShapeDtypeStruct(
                (out_fields, grid_tiles * SUBS, LANES), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )

    def call_lanes(ins):
        """ins: arrays (fields_i, Bp//LANES, LANES) -> one array or [z, lam]
        of (out_fields_i, Bp//LANES, LANES)."""
        multi = len(out_fields_all) > 1
        if not chunked:
            return make_call(n_tiles * 1)(*ins)
        call = make_call(1)
        # (fields, n_tiles, SUBS, LANES) -> map over tiles, single-buffered
        stacked = [x.reshape(f, n_tiles, SUBS, LANES).swapaxes(0, 1)
                   for x, f in zip(ins, in_fields)]
        outs = jax.lax.map(lambda xs: call(*xs), tuple(stacked))
        if multi:
            return [o.swapaxes(0, 1).reshape(f, Bp // LANES, LANES)
                    for o, f in zip(outs, out_fields_all)]
        return outs.swapaxes(0, 1).reshape(out_fields, Bp // LANES, LANES)

    @jax.jit
    def solve(H, g, A, B, c, D, e, r0, lam0=None):
        def to_lanes(x, fields, pad_rows=None):
            x = x.reshape(Bt, fields)
            if pad:
                filler = (jnp.zeros((pad, fields), dtype) if pad_rows is None
                          else jnp.tile(pad_rows[None], (pad, 1)))
                x = jnp.concatenate([x, filler], axis=0)
            # (fields, B//LANES, LANES): grid tiles the middle axis by SUBS
            return x.T.reshape(fields, Bp // LANES, LANES)

        if mh:
            D_h = D[:, :, h_idx, :][..., np.asarray(union_cols)]
        else:
            D_h = jnp.zeros((Bt, T, 1, nU), dtype)
        H_tri = H.astype(dtype)[..., tri_iu, tri_ju]  # (Bt, T, ntri)
        H_pad = jnp.tile(
            jnp.eye(nz, dtype=dtype)[tri_iu, tri_ju][None], (T, 1)).reshape(-1)
        ins = [
            to_lanes(H_tri, in_fields[0], pad_rows=H_pad),
            to_lanes(g.astype(dtype), in_fields[1]),
            to_lanes(A.astype(dtype), in_fields[2]),
            to_lanes(B.astype(dtype), in_fields[3]),
            to_lanes(c.astype(dtype), in_fields[4]),
            to_lanes(D_h.astype(dtype), in_fields[5]),
            to_lanes(e.astype(dtype), in_fields[6],
                     pad_rows=jnp.ones((T * m,), dtype)),
            to_lanes(r0.astype(dtype), in_fields[7]),
        ]
        if warm:
            ins.append(to_lanes(lam0.astype(dtype), in_fields[8]))
        outs = call_lanes(ins)
        if duals_out:
            z_l, lam_l = outs
            z = z_l.reshape(T * nz, Bp).T[:Bt].reshape(Bt, T, nz)
            lam = lam_l.reshape(T * m, Bp).T[:Bt].reshape(Bt, T, m)
            return z, lam
        z = outs.reshape(T * nz, Bp).T[:Bt].reshape(Bt, T, nz)
        return z

    @jax.jit
    def solve_lanes(H, g, A, B, c, D, e, r0):
        """Lane-layout entry: inputs carry the batch on the TRAILING axis
        (H (T,nz,nz,Bt), g (T,nz,Bt), A (T-1,nx,nx,Bt), B (T-1,nx,nu,Bt),
        c (T-1,nx,Bt), D (T,mh,nz,Bt) generic rows only, e (T,m,Bt),
        r0 (nx,Bt)) and the result is (T, nz, Bt). No transposes anywhere:
        field-major reshapes only (the ops/linearize.py pipeline)."""
        assert not warm and not duals_out, (
            "lane entry supports the cold z-only configuration")

        def lanes(x, fields):
            x = x.astype(dtype).reshape(fields, Bt)
            if pad:
                # Edge-pad with the last real problem: padded lanes stay
                # finite and converge (values are sliced away below).
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x[:, -1:], (fields, pad))], axis=1)
            return x.reshape(fields, Bp // LANES, LANES)

        H_tri = H[:, tri_iu, tri_ju]  # (T, ntri, Bt)
        ins = [lanes(H_tri, in_fields[0]), lanes(g, in_fields[1]),
               lanes(A, in_fields[2]), lanes(B, in_fields[3]),
               lanes(c, in_fields[4]), lanes(D, in_fields[5]),
               lanes(e, in_fields[6]), lanes(r0, in_fields[7])]
        z_l = call_lanes(ins)
        return z_l.reshape(T, nz, Bp)[:, :, :Bt]

    return _types.SimpleNamespace(solve=solve, solve_lanes=solve_lanes)


def solve_qp_batched(H, g, A, B, c, D, e, row_mask, r0, *, nu: int,
                     n_iters: int = 12, mu0: float = 1e2, mu_min: float = 1e-6,
                     tau: float = 0.995, w_max: float = 1e6,
                     s_floor: float = 1e-10, tol_freeze: float = 1e-5,
                     interpret: bool = False, row_meta=None):
    """Batched QP solve via the fused kernel.

    Inputs carry a leading batch axis: H (Bt,T,nz,nz), g (Bt,T,nz),
    A (Bt,T-1,nx,nx), B (Bt,T-1,nx,nu), c (Bt,T-1,nx), D (Bt,T,m,nz),
    e (Bt,T,m), r0 (Bt,nx). Returns z (Bt,T,nz).

    ``row_mask`` is the static per-(stage,row) activity mask, (T,m) — it must
    be CONCRETE (identical for every problem; it describes the OCP structure,
    not the data). A (Bt,T,m) array with identical batch entries is accepted.
    ``row_meta`` optionally tags each row: ``("box", col, sign)`` for one-hot
    variable-bound rows (kept out of D storage), ``("h", _)`` or None for
    generic rows.
    """
    Bt, T, nz, _ = H.shape
    nx = A.shape[-1]
    m = D.shape[2]
    try:
        mask_np = np.asarray(row_mask, dtype=np.float64)
    except Exception as exc:  # traced mask: structural info must be static
        raise TypeError(
            "row_mask must be a concrete (T, m) array (the static OCP row "
            "structure), not a traced value") from exc
    if mask_np.ndim == 3:
        mask_np = mask_np[0]
    if m == 0:
        # Unconstrained QP: pad to ONE all-masked box row so no zero-size
        # pallas block exists; the kernel short-circuits to a single exact
        # Riccati solve when no row is active.
        D = jnp.zeros((Bt, T, 1, nz), H.dtype)
        e = jnp.ones((Bt, T, 1), H.dtype)
        mask_np = np.zeros((T, 1))
        row_meta = (("box", 0, 1.0),)
        m = 1
    if row_meta is not None:
        row_meta = tuple(tuple(meta) for meta in row_meta)
    solver = _make_solver(
        (Bt, T, nz, nx, m), mask_np.tobytes(), row_meta, nu, n_iters, mu0,
        mu_min, tau, w_max, s_floor, tol_freeze, interpret,
        jnp.dtype(H.dtype).name)
    return solver.solve(H, g, A, B, c, D, e, r0)


def solve_qp_batched_duals(H, g, A, B, c, D, e, row_mask, r0, *, nu: int,
                           lam0=None, n_iters: int = 12, mu0: float = 1e2,
                           mu_min: float = 1e-6, tau: float = 0.995,
                           w_max: float = 1e6, s_floor: float = 1e-10,
                           tol_freeze: float = 1e-5, interpret: bool = False,
                           row_meta=None):
    """Like :func:`solve_qp_batched` but also returns the final inequality
    multipliers lam (Bt, T, m), and optionally warm-starts from ``lam0``
    (Bt, T, m) — duals from a previous solve of a nearby (re-linearized) QP.

    With ``lam0`` the interior-point restart is seeded near the old active
    set: slacks come from the NEW residuals (floored off the boundary) and
    multipliers are carried over, so warm solves converge in fewer iterations
    (the SQP loop's per-iteration QPs differ only by the re-linearization).
    acados analog: qp_warm_start=2 + HPIPM dual warm starts
    (generate_acados_solver.py options block)."""
    Bt, T, nz, _ = H.shape
    nx = A.shape[-1]
    m = D.shape[2]
    if m == 0:
        raise ValueError(
            "solve_qp_batched_duals needs at least one inequality row "
            "(m == 0 has no duals to return); use solve_qp_batched")
    mask_np = np.asarray(row_mask, dtype=np.float64)
    if mask_np.ndim == 3:
        mask_np = mask_np[0]
    if row_meta is not None:
        row_meta = tuple(tuple(meta) for meta in row_meta)
    solver = _make_solver(
        (Bt, T, nz, nx, m), mask_np.tobytes(), row_meta, nu, n_iters, mu0,
        mu_min, tau, w_max, s_floor, tol_freeze, interpret,
        jnp.dtype(H.dtype).name, warm=lam0 is not None, duals_out=True)
    if lam0 is None:
        return solver.solve(H, g, A, B, c, D, e, r0)
    return solver.solve(H, g, A, B, c, D, e, r0, lam0)


def solve_qp_lanes(lane_qp, stage_mask, *, nu: int, n_iters: int = 12,
                   mu0: float = 1e2, mu_min: float = 1e-6, tau: float = 0.995,
                   w_max: float = 1e6, s_floor: float = 1e-10,
                   tol_freeze: float = 1e-5, interpret: bool = False,
                   row_meta=None):
    """Batched QP solve on lane-layout fields (batch on the TRAILING axis).

    ``lane_qp`` is an :class:`..linearize.LaneQP` (or any namedtuple with the
    same fields/layouts); ``D`` carries the compacted GENERIC rows only, in
    ``row_meta`` order. Returns the step ``dz`` as (T, nz, Bt). This is the
    zero-relayout path used by the fleet solver's lane pipeline: the
    linearizer emits these layouts directly and the kernel consumes them with
    field-major reshapes only."""
    T, nz, _, Bt = lane_qp.H.shape
    nx = lane_qp.A.shape[1]
    m = lane_qp.e.shape[1]
    mask_np = np.asarray(stage_mask, dtype=np.float64)
    if m == 0:
        # Pad to one all-masked row (see solve_qp_batched); the kernel
        # short-circuits to one exact Riccati solve.
        lane_qp = lane_qp._replace(
            e=jnp.ones((T, 1, Bt), lane_qp.H.dtype))
        mask_np = np.zeros((T, 1))
        row_meta = (("box", 0, 1.0),)
        m = 1
    if row_meta is not None:
        # Lane D storage is dense (T, mh, nz): strip any column-support info
        row_meta = tuple(
            ("h", meta[1]) if meta[0] == "h" else tuple(meta)
            for meta in row_meta)
        mh = sum(1 for meta in row_meta if meta[0] == "h")
    else:
        mh = m
    assert lane_qp.D.shape[1] == max(mh, 1), (
        f"lane D must carry the {mh} generic rows only, got "
        f"{lane_qp.D.shape[1]}")
    solver = _make_solver(
        (Bt, T, nz, nx, m), mask_np.tobytes(), row_meta, nu, n_iters, mu0,
        mu_min, tau, w_max, s_floor, tol_freeze, interpret,
        jnp.dtype(lane_qp.H.dtype).name)
    return solver.solve_lanes(lane_qp.H, lane_qp.g, lane_qp.A, lane_qp.B,
                              lane_qp.c, lane_qp.D, lane_qp.e, lane_qp.r0)
