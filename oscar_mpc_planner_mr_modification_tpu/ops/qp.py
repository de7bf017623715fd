"""Stagewise constrained-QP solver: Mehrotra predictor-corrector IPM + Riccati.

This is the TPU-native replacement for HPIPM (the hidden 90% of the reference's
acados solve, SURVEY §7): each SQP iteration's QP subproblem

    min  sum_k 1/2 z_k^T H_k z_k + g_k^T z_k          z_k = (u_k, x_k)
    s.t. dx_{k+1} = A_k dx_k + B_k du_k + c_k         (stage dynamics, residual form)
         dx_0 = r0
         D_k z_k + e_k >= 0                           (one-sided inequality rows)

is solved by a fixed-iteration Mehrotra predictor-corrector interior-point method
whose Newton systems are factorized by a Riccati (LQR) sweep over the horizon - the
same family of method as HPIPM's, but branch-free with static shapes so the whole
solver ``vmap``s over thousands of planner instances (the T-MPC / scenario /
multi-robot batch axes).

Derivation (kept here because sign conventions bite): with slacks s >= 0, duals
lam >= 0, the perturbed KKT are
    H z + g + E^T pi - D^T lam = 0;   D z + e = s;   s*lam = mu.
Eliminating (ds, dlam) from the Newton system and solving directly for the *new*
costates pi+ (so pi is never stored) gives an equality-constrained LQR with
    Hbar_k = H_k + D_k^T diag(lam/s) D_k
    gbar_k = H_k z_k + g_k + D_k^T [ (lam*(D z + e - s) - rhs3) / s ]
where rhs3 = mu (centering) or mu - ds_aff*dlam_aff (corrector); then
    ds   = D dz + (D z + e - s)
    dlam = (rhs3 - s*lam)/s - (lam/s) * ds.
Since Hbar depends only on (lam, s), one Riccati *factorization* per IP iteration
serves both the affine predictor and the corrector (two vector back-substitutions).
Separate primal/dual fraction-to-boundary step lengths (tau = 0.995) prevent the
boundary stalling a single shared step suffers from.

Masked rows (``row_mask`` = 0) are padding (stage-N rows, infinite bounds): held at
s=1, lam=0 with zero contribution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPData(NamedTuple):
    """Stagewise QP data. T = N+1 stages; stage N's u-block must be padded
    (H_uu = I, H_ux = 0, g_u = 0) and its inequality rows masked."""

    H: jnp.ndarray  # (T, nz, nz)
    g: jnp.ndarray  # (T, nz)
    A: jnp.ndarray  # (T-1, nx, nx)
    B: jnp.ndarray  # (T-1, nx, nu)
    c: jnp.ndarray  # (T-1, nx)  dynamics residual (defect)
    D: jnp.ndarray  # (T, m, nz)
    e: jnp.ndarray  # (T, m)
    row_mask: jnp.ndarray  # (T, m) 1.0 = active row
    r0: jnp.ndarray  # (nx,) initial-state residual


class QPSolution(NamedTuple):
    z: jnp.ndarray  # (T, nz) primal step (du_k, dx_k)
    lam: jnp.ndarray  # (T, m) inequality duals
    s: jnp.ndarray  # (T, m) slacks
    mu_final: jnp.ndarray
    comp: jnp.ndarray  # final mean complementarity (masked)
    eq_res: jnp.ndarray  # final max dynamics residual


# ---------------------------------------------------------------------------
# Small SPD solves (closed-form for nu in {1,2,3}; avoids batched LAPACK-style
# Cholesky custom calls which dominate scan time on TPU)
# ---------------------------------------------------------------------------
def spd_factor(M):
    """Return an opaque factorization of the SPD matrix M for :func:`spd_solve`.

    For n <= 3 this is the explicit inverse (adjugate / determinant - branch-free,
    VPU-only); larger n falls back to Cholesky.
    """
    n = M.shape[-1]
    if n == 1:
        return 1.0 / M
    if n == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        d = M[..., 1, 1]
        det = a * d - b * b
        inv = jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-b, a], axis=-1),
        ], axis=-2) / det[..., None, None]
        return inv
    if n == 3:
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        d, e = M[..., 1, 1], M[..., 1, 2]
        f = M[..., 2, 2]
        A00 = d * f - e * e
        A01 = c * e - b * f
        A02 = b * e - c * d
        A11 = a * f - c * c
        A12 = b * c - a * e
        A22 = a * d - b * b
        det = a * A00 + b * A01 + c * A02
        inv = jnp.stack([
            jnp.stack([A00, A01, A02], axis=-1),
            jnp.stack([A01, A11, A12], axis=-1),
            jnp.stack([A02, A12, A22], axis=-1),
        ], axis=-2) / det[..., None, None]
        return inv
    return jnp.linalg.cholesky(M)


def spd_solve(fact, rhs):
    """Solve M x = rhs given :func:`spd_factor`'s output (rhs: (..., n) or
    (..., n, k))."""
    n = fact.shape[-1]
    if n <= 3:
        if rhs.ndim == fact.ndim - 1:
            return jnp.einsum("...ij,...j->...i", fact, rhs)
        return fact @ rhs
    return jax.scipy.linalg.cho_solve((fact, True), rhs)


# ---------------------------------------------------------------------------
# Riccati factorization + vector solves
# ---------------------------------------------------------------------------
def riccati_factor(H, A, B, nu: int):
    """Backward matrix sweep. Returns per-stage (K, L, Qux, P_next) and terminal P.

    L is the Cholesky factor of Quu; P_next is the value Hessian at stage k+1 needed
    by the vector pass.
    """
    Huu = H[:, :nu, :nu]
    Hux = H[:, :nu, nu:]
    Hxx = H[:, nu:, nu:]

    def backward(P, inp):
        Huu_k, Hux_k, Hxx_k, A_k, B_k = inp
        PA = P @ A_k
        PB = P @ B_k
        Quu = Huu_k + B_k.T @ PB
        Qux = Hux_k + B_k.T @ PA
        Qxx = Hxx_k + A_k.T @ PA
        L = spd_factor(Quu)
        K = -spd_solve(L, Qux)
        P_new = Qxx + Qux.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, (K, L, Qux, P)

    P_T = Hxx[-1]
    inputs = (Huu[:-1], Hux[:-1], Hxx[:-1], A, B)
    _, (Ks, Ls, Quxs, P_nexts) = jax.lax.scan(backward, P_T, inputs, reverse=True)
    return Ks, Ls, Quxs, P_nexts


def riccati_solve_vec(fact, g, A, B, c, r0, nu: int):
    """Vector sweep for a given gradient g and residuals (c, r0): returns z (T, nz)."""
    Ks, Ls, Quxs, P_nexts = fact
    gu = g[:, :nu]
    gx = g[:, nu:]

    def backward(p, inp):
        gu_k, gx_k, A_k, B_k, c_k, L, Qux, P_next = inp
        beta = p + P_next @ c_k
        qu = gu_k + B_k.T @ beta
        qx = gx_k + A_k.T @ beta
        kff = -spd_solve(L, qu)
        p_new = qx + Qux.T @ kff
        return p_new, kff

    p_T = gx[-1]
    inputs = (gu[:-1], gx[:-1], A, B, c, Ls, Quxs, P_nexts)
    _, kffs = jax.lax.scan(backward, p_T, inputs, reverse=True)

    def forward(dx, inp):
        K, kff, A_k, B_k, c_k = inp
        du = K @ dx + kff
        dx_next = A_k @ dx + B_k @ du + c_k
        return dx_next, (du, dx)

    dx_T, (dus, dxs) = jax.lax.scan(forward, r0, (Ks, kffs, A, B, c))
    z_main = jnp.concatenate([dus, dxs], axis=-1)
    z_last = jnp.concatenate([jnp.zeros((nu,), dtype=dx_T.dtype), dx_T])[None]
    return jnp.concatenate([z_main, z_last], axis=0)


def riccati_solve(H, g, A, B, c, r0, nu: int):
    """Equality-constrained LQR solve (factor + single vector pass)."""
    fact = riccati_factor(H, A, B, nu)
    return riccati_solve_vec(fact, g, A, B, c, r0, nu)


# ---------------------------------------------------------------------------
# Mehrotra predictor-corrector IPM
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("nu", "n_iters"))
def solve_qp(qp: QPData, nu: int, n_iters: int = 15, mu_min: float = 1e-9,
             tau: float = 0.995, reg: float = 0.0, w_max: float = 1e14,
             s_floor: float = 1e-12, mu0: float = 1e2,
             tol_freeze: float | None = None) -> QPSolution:
    if tol_freeze is None:
        tol_freeze = jnp.maximum(10.0 * mu_min, 1e-12)
    dtype = qp.H.dtype
    T, m, nz = qp.D.shape
    mask = qp.row_mask.astype(dtype)
    big = jnp.asarray(1e30, dtype)

    # Centered start respecting the constraint scale: s0 = max(e, sqrt(mu0)) keeps
    # already-satisfied rows (including the huge dummy-obstacle values, e ~ 1e4)
    # at zero inequality residual, while violated/tight rows start at sqrt(mu0);
    # lam0 = mu0/s0 makes every row's complementarity exactly mu0 (centered).
    v0 = jnp.asarray(jnp.sqrt(mu0), dtype)
    s0 = jnp.where(mask > 0, jnp.maximum(qp.e, v0), 1.0)
    lam0 = jnp.where(mask > 0, mu0 / s0, 0.0)
    z0 = jnp.zeros((T, nz), dtype=dtype)
    n_active = jnp.maximum(jnp.sum(mask), 1.0)

    def ftb(v, dv):
        """Fraction-to-boundary max step for v + a*dv >= 0 over active rows."""
        ratio = jnp.where(dv < 0, -v / jnp.minimum(dv, -1e-30), big)
        ratio = jnp.where(mask > 0, ratio, big)
        return jnp.min(ratio)

    def body(carry, _):
        z, s, lam, best = carry
        Dz_e = jnp.einsum("tmz,tz->tm", qp.D, z) + qp.e
        r_ineq = Dz_e - s
        W = jnp.minimum(mask * lam / s, w_max)
        Hbar = qp.H + jnp.einsum("tmi,tm,tmj->tij", qp.D, W, qp.D)
        if reg:
            Hbar = Hbar + reg * jnp.eye(nz, dtype=dtype)
        fact = riccati_factor(Hbar, qp.A, qp.B, nu)

        rd = _dyn_residual(qp, z, nu)
        r0_res = qp.r0 - z[0, nu:]
        Hz_g = jnp.einsum("tij,tj->ti", qp.H, z) + qp.g

        def newton(rhs3):
            """rhs3: target for s*lam (per row). Returns dz, ds, dlam."""
            w_vec = mask * (lam * r_ineq - rhs3) / s
            gbar = Hz_g + jnp.einsum("tmz,tm->tz", qp.D, w_vec)
            dz = riccati_solve_vec(fact, gbar, qp.A, qp.B, rd, r0_res, nu)
            ds = jnp.einsum("tmz,tz->tm", qp.D, dz) + r_ineq
            dlam = (rhs3 - s * lam) / s - (lam / s) * ds
            ds = jnp.where(mask > 0, ds, 0.0)
            dlam = jnp.where(mask > 0, dlam, 0.0)
            return dz, ds, dlam

        comp = jnp.sum(mask * s * lam) / n_active

        # Predictor (affine, mu = 0)
        dz_a, ds_a, dlam_a = newton(jnp.zeros_like(s))
        alpha_aff = jnp.minimum(1.0, jnp.minimum(ftb(s, ds_a), ftb(lam, dlam_a)))
        comp_aff = jnp.sum(mask * (s + alpha_aff * ds_a)
                           * (lam + alpha_aff * dlam_a)) / n_active

        # Centering + corrector
        sigma = jnp.clip((comp_aff / jnp.maximum(comp, 1e-30)) ** 3, 1e-8, 1.0)
        mu = jnp.maximum(sigma * comp, mu_min)
        rhs3 = mu - ds_a * dlam_a
        dz, ds, dlam = newton(rhs3)

        alpha_p = jnp.minimum(1.0, tau * ftb(s, ds))
        alpha_d = jnp.minimum(1.0, tau * ftb(lam, dlam))

        # Branch-free convergence freeze: once complementarity and primal residuals
        # are tight, take zero steps (continuing the iteration from an essentially
        # exact point is numerically destructive: lam/s -> 1/mu_min). Also guards
        # against NaN steps (failed Cholesky) poisoning the iterate.
        feas = jnp.max(jnp.abs(mask * r_ineq))
        eqr = jnp.maximum(jnp.max(jnp.abs(rd)), jnp.max(jnp.abs(r0_res)))
        # Stationarity proxy: the affine step IS the Newton step toward the mu=0
        # KKT point, so its size measures the full KKT error including the dual
        # part (which comp/feas/eqr alone miss - a point can be primal-optimal
        # with wrong duals).
        stat = jnp.maximum(
            jnp.max(jnp.abs(dz_a)) / (1.0 + jnp.max(jnp.abs(z))),
            jnp.max(jnp.abs(mask * dlam_a)) / (1.0 + jnp.max(mask * lam)),
        )
        done = (comp < tol_freeze) & (feas < 100.0 * tol_freeze) & (
            eqr < 100.0 * tol_freeze) & (stat < 1e3 * tol_freeze)
        bad = (jnp.any(jnp.isnan(dz)) | jnp.any(jnp.isnan(dlam))
               | jnp.any(jnp.isnan(ds)))
        scale = jnp.where(done | bad, 0.0, 1.0)
        alpha_p = alpha_p * scale
        alpha_d = alpha_d * scale

        # Best-iterate tracking: near machine precision the centered steps can
        # oscillate; we return the iterate with the best KKT merit, not the last.
        best_z, best_s, best_lam, best_merit = best
        merit = comp + feas + eqr + stat
        better = merit < best_merit
        best = (
            jnp.where(better, z, best_z),
            jnp.where(better, s, best_s),
            jnp.where(better, lam, best_lam),
            jnp.where(better, merit, best_merit),
        )

        z = z + alpha_p * dz
        s = jnp.where(mask > 0, jnp.maximum(s + alpha_p * ds, s_floor), 1.0)
        lam = jnp.where(mask > 0, jnp.maximum(lam + alpha_d * dlam, 0.0), 0.0)
        return (z, s, lam, best), None

    best0 = (z0, s0, lam0, jnp.asarray(jnp.inf, dtype))
    (_, _, _, best), _ = jax.lax.scan(
        body, (z0, s0, lam0, best0), None, length=n_iters)
    # Return the best-merit iterate (the loop merits every pre-step iterate; with
    # the convergence freeze the last iterates are identical to the best one).
    z, s, lam, _ = best

    comp = jnp.sum(mask * s * lam) / n_active
    eq_res = jnp.maximum(jnp.max(jnp.abs(_dyn_residual(qp, z, nu))),
                         jnp.max(jnp.abs(qp.r0 - z[0, nu:])))
    return QPSolution(z=z, lam=lam, s=s, mu_final=comp, comp=comp, eq_res=eq_res)


def _dyn_residual(qp: QPData, z, nu: int):
    """rd_k = A dx_k + B du_k + c_k - dx_{k+1} for the current QP iterate."""
    du = z[:-1, :nu]
    dx = z[:-1, nu:]
    dx_next = z[1:, nu:]
    return (jnp.einsum("tij,tj->ti", qp.A, dx)
            + jnp.einsum("tij,tj->ti", qp.B, du) + qp.c - dx_next)
