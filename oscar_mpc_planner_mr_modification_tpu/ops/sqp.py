"""SQP-RTI engine: the TPU-native replacement for the generated acados solver.

Reproduces the iteration structure of the reference's acados wrapper
(mpc_planner_solver/src/acados_solver_interface.cpp:86-204): a fixed number of
SQP-RTI iterations (``iterations: 10`` in settings.yaml), each linearizing the OCP
around the current iterate, solving the QP subproblem, and taking a full step
(acados ``globalization = FIXED_STEP``). The reference stops iterating on a
wall-clock timeout; on TPU the iteration count is static and chosen to fit the
control budget - the analogous knob.

Per iteration:
- cost gradient/Hessian per stage via ``jax.grad`` / ``jax.hessian`` (vmapped over
  stages); the terminal stage uses the terminal cost on x only, u-block padded;
- Hessian regularization following acados ``regularize_method = MIRROR``
  (generate_acados_solver.py:157): eigenvalues are mirrored to |lambda| and floored;
- dynamics Jacobians A, B via ``jacfwd``; defects c_k = F(z_k) - x_{k+1};
- inequality rows built statically from the OCP's finite-bound row spec with acados
  stage conventions (h at 0..N-1, u-box at 0..N-1, x-box at 1..N-1, stage N free);
- QP solved by :func:`.qp.solve_qp` (Riccati interior point).

Failure semantics mirror completeOneIteration (acados_solver_interface.cpp:176-204):
success iff the final equality residual <= 1e-2 and everything is finite; exit codes
use the reference's forces-style mapping (1 = success, 0 = failure).

Everything is a pure jittable function of (params, xinit, z_init); batching over
planners/scenarios/robots is a plain ``vmap``.
"""

from __future__ import annotations

import os
import threading
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .qp import QPData, solve_qp


class SQPConfig(NamedTuple):
    n_sqp: int = 10
    n_qp_iter: int = 15
    mu_min: float = 1e-9
    reg_eps: float = 1e-6
    w_max: float = 1e14
    regularization: str = "mirror"  # "mirror" | "levenberg" | "none"
    levenberg: float = 1e-3
    res_eq_tol: float = 1e-2  # failure promotion threshold (acados wrapper :176-182)
    merit_eq_weight: float = 1e3  # infeasibility penalty in best-iterate merit
    # Dual warm starting across SQP iterations (pallas fleet backend only):
    # iteration 0 solves its QP cold with n_qp_iter IP iterations; iterations
    # 1..n_sqp-1 seed the inequality multipliers from the previous QP's duals
    # and run n_qp_iter_warm iterations. 0 disables (every QP cold).
    # acados analog: qp_warm_start=2 (generate_acados_solver.py options).
    n_qp_iter_warm: int = 0
    # Best-iterate merit tracking (fleet backends). True = keep the
    # best-merit iterate across SQP iterations (full-step SQP can cycle on
    # nonconvex problems); False = return the last iterate (acados FIXED_STEP
    # semantics exactly) and skip the per-iteration merit evaluation.
    track_best: bool = True
    # Inexact-SQP iteration schedule: ((n_sqp_a, n_qp_a), (n_sqp_b, n_qp_b),
    # ...) phases overriding (n_sqp, n_qp_iter) when non-empty. Early SQP
    # iterations are solved to loose QP tolerance, late ones tight —
    # measured on the cold-start T-MPC fleet (tools/exp_iter_schedule.py):
    # ((4, 4), (4, 8)) reaches success 0.942 vs 0.912 for the uniform 10x8
    # baseline at ~30% less device time (same res_eq success gate). The
    # classic inexact-SQP result: far from the solution the QP only needs to
    # produce a descent direction.
    qp_iter_schedule: tuple = ()


class SQPResult(NamedTuple):
    z: jnp.ndarray  # (N+1, nvar) primal trajectory (u_k, x_k); u_N is zero padding
    cost: jnp.ndarray  # objective at the final iterate
    eq_res: jnp.ndarray  # max dynamics defect (infeasibility measure)
    qp_comp: jnp.ndarray  # last QP complementarity
    success: jnp.ndarray  # bool
    exit_code: jnp.ndarray  # 1 = success, 0 = failure (reference mapping)


@jax.jit
def _pack_results(res: "SQPResult"):
    """Flatten every SQPResult field into ONE device array so the host pays a
    single device->host transfer per tick. On tunneled backends each separate
    ``np.asarray``/``float()`` is a full round-trip (~28 ms RTT measured); the
    runtime optimizers fetch through this instead."""
    B = res.z.shape[0]
    flat = res.z.reshape(B, -1)
    extra = jnp.stack([res.cost.astype(flat.dtype),
                       res.eq_res.astype(flat.dtype),
                       res.qp_comp.astype(flat.dtype),
                       res.exit_code.astype(flat.dtype),
                       res.success.astype(flat.dtype)], axis=1)
    return jnp.concatenate([flat, extra], axis=1)


def unpack_results(packed: np.ndarray, T: int, nz: int) -> "SQPResult":
    """Host-side inverse of :func:`_pack_results` (numpy fields)."""
    B = packed.shape[0]
    n = T * nz
    return SQPResult(
        z=packed[:, :n].astype(float).reshape(B, T, nz),
        cost=packed[:, n].astype(float).copy(),
        eq_res=packed[:, n + 1].astype(float).copy(),
        qp_comp=packed[:, n + 2].astype(float).copy(),
        exit_code=np.rint(packed[:, n + 3]).astype(int),
        success=packed[:, n + 4] > 0.5)


def fetch_results(res: "SQPResult") -> "SQPResult":
    """One-transfer host fetch: an SQPResult whose fields are numpy arrays
    (z (B,T,nz) float, cost/eq_res/qp_comp (B,) float, exit_code (B,) int,
    success (B,) bool)."""
    B, T, nz = res.z.shape
    return unpack_results(np.asarray(_pack_results(res)), T, nz)


def make_packed_solve(batched_solve):
    """Fuse a batched solve with :func:`_pack_results` into ONE jitted
    program, so a runtime tick costs exactly one device dispatch plus one
    packed readback (on tunneled backends every extra dispatch is a full
    round-trip). Returns ``packed(params, xinit, z_init) -> (B, T*nz+5)``;
    decode with :func:`unpack_results`."""
    import jax

    @jax.jit
    def packed(params, xinit, z_init):
        return _pack_results(batched_solve(params, xinit, z_init))

    return packed


def make_buffered_packed_solve(batched_solve, P, N, npar, nx, nz, dtype):
    """Single-buffer variant of :func:`make_packed_solve` for runtime ticks:
    params + xinit + warmstart are flattened host-side into ONE array (cast
    to the solve dtype, halving f64 staging), uploaded in one transfer, and
    the packed result is fetched in one readback — on tunneled transports
    each separate input upload can cost a full round trip. Returns
    ``solve(params (P,N,npar), xinit (nx,), warm (P,N+1,nz)) -> packed np``;
    decode with :func:`unpack_results`."""
    import jax

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    n_par = P * N * npar

    def _eager_fetch_enabled():
        return os.environ.get("TMPC_EAGER_FETCH", "0") == "1"

    @jax.jit
    def packed(buf):
        params = buf[:n_par].reshape(P, N, npar)
        xinit = buf[n_par:n_par + nx]
        warm = buf[n_par + nx:].reshape(P, N + 1, nz)
        return _pack_results(batched_solve(params, xinit, warm))

    def _encode(params, xinit, warm):
        return np.concatenate([
            np.asarray(params, np_dtype).reshape(-1),
            np.asarray(xinit, np_dtype).reshape(-1),
            np.asarray(warm, np_dtype).reshape(-1)])

    def solve(params, xinit, warm):
        return np.asarray(packed(_encode(params, xinit, warm)))

    def dispatch(params, xinit, warm):
        """Async half of :func:`solve`: encode + upload + dispatch, return
        an in-flight handle WITHOUT blocking on the result. JAX dispatch is
        asynchronous, so the host is free to do next-tick work (guidance PRM,
        parameter fill) while the solve runs; complete with ``solve.fetch``.
        The inputs are copied into a fresh staging buffer here, so caller
        arrays may be reused/overwritten immediately after dispatch.

        Eager-fetch thread (OPT-IN via ``TMPC_EAGER_FETCH=1``): tunneled
        transports execute LAZILY — the execution RPC only fires when a
        result is demanded (round-5 probe, docs/PERFORMANCE.md), so plain
        async dispatch overlaps NOTHING of the ~25 ms round trip. A daemon
        thread demands the packed result immediately after dispatch, firing
        the RPC while the caller's overlap window runs; ``fetch`` joins the
        thread. Exactly one solve is in flight at a time (the planner's
        contract), and the overlap window is host-side numpy/native work,
        so the thread never races another device call. MEASURED on this
        tunnel (round-5 A/B, same process, pipelined e2e tick): eager ON is
        net SLOWER (median 29.2-30.1 ms vs 28.7 OFF; host share +1-1.7 ms)
        — the axon client's blocking readback holds the GIL, so the thread
        starves the host half instead of overlapping the RTT. Default off;
        the mechanism stays for transports whose readback releases the GIL
        (measure before enabling)."""
        handle = packed(_encode(params, xinit, warm))
        if not _eager_fetch_enabled():
            return handle
        box = {}

        def _pull():
            try:
                box["out"] = np.asarray(handle)
            except BaseException as exc:  # re-raised in fetch()
                box["err"] = exc

        t = threading.Thread(target=_pull, daemon=True,
                             name="tmpc-eager-fetch")
        t.start()
        return (t, box)

    def fetch(handle):
        """Blocking readback of a :func:`dispatch` handle."""
        if isinstance(handle, tuple):  # eager-fetch thread
            t, box = handle
            t.join()
            if "err" in box:
                raise box["err"]
            return box["out"]
        return np.asarray(handle)

    solve.dispatch = dispatch
    solve.fetch = fetch
    return solve


def fetch_result_single(res: "SQPResult") -> "SQPResult":
    """:func:`fetch_results` for a batchless result (z (T, nz))."""
    batched = fetch_results(
        jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], res))
    return SQPResult(
        z=batched.z[0], cost=float(batched.cost[0]),
        eq_res=float(batched.eq_res[0]), qp_comp=float(batched.qp_comp[0]),
        exit_code=int(batched.exit_code[0]), success=bool(batched.success[0]))


def _mirror_regularize(H, eps):
    """acados MIRROR: project the symmetric Hessian to V |diag| V^T with floor eps."""
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(jnp.abs(w), eps)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


def _f32_safe(config: SQPConfig, dtype) -> SQPConfig:
    """Clamp interior-point constants to the f32 operating point when the solve
    runs in single precision (which also happens silently when x64 is disabled:
    jnp.float64 truncates to f32). The f64 defaults (mu_min 1e-9, w_max 1e14)
    are below/above f32 resolution and break the QP iteration."""
    if jnp.dtype(dtype).itemsize > 4:
        try:
            import jax

            if jax.config.read("jax_enable_x64"):
                return config
        except Exception:
            return config
    return config._replace(
        mu_min=max(config.mu_min, 1e-6),
        w_max=min(config.w_max, 1e6),
        reg_eps=max(config.reg_eps, 1e-5),
    )


def _make_machinery(ocp, config: SQPConfig, dtype):
    """Shared per-stage linearization machinery for the solver entry points."""
    N, nu, nx, nvar, nh = ocp.N, ocp.nu, ocp.nx, ocp.nvar, ocp.nh
    row_spec = ocp.ineq_row_spec()
    m = len(row_spec)

    lh = jnp.asarray(ocp.lh, dtype)
    uh = jnp.asarray(ocp.uh, dtype)
    lbz = jnp.asarray(ocp.lbz, dtype)
    ubz = jnp.asarray(ocp.ubz, dtype)

    # Static row metadata
    is_xbox = np.array([
        k in ("zl", "zu") and i >= nu for (k, i) in row_spec])
    # Per-stage row activity masks (acados conventions)
    stage_mask = np.ones((N + 1, m))
    stage_mask[N, :] = 0.0  # terminal stage: unconstrained
    stage_mask[0, is_xbox] = 0.0  # x fixed at stage 0
    row_mask = jnp.asarray(stage_mask, dtype)
    # Static row structure for the Pallas kernel: box rows (one +-1 entry at a
    # fixed column) are tagged so the kernel keeps them out of D storage and
    # updates Hbar diagonally (see ops/qp_pallas.py capacity notes). Generic
    # ("h") rows carry their static COLUMN SUPPORT: every shipped constraint
    # touches only 2-3 decision variables (ellipsoid/gaussian/linearized rows
    # are functions of (x, y) [+psi with disc offsets], contouring width rows
    # of (x, y, s)), so the kernel stores/contracts only those columns instead
    # of all nz — less HBM traffic, |cols|^2 instead of nz^2 Hbar updates.
    # Support is derived STRUCTURALLY from the traced jaxpr (ops/support.py):
    # sound for parameter-gated / piecewise constraint terms that a numeric
    # probe would mis-prune (round-2 ADVICE finding).
    if nh > 0:
        from .support import ineq_column_support

        h_support = ineq_column_support(ocp)
    else:
        h_support = []
    row_meta = tuple(
        ("box", int(i), 1.0) if k == "zl"
        else ("box", int(i), -1.0) if k == "zu"
        else ("h", 0, h_support[i])
        for (k, i) in row_spec)

    _unit = np.eye(nvar)

    def build_rows(z_k, p_k):
        """D_k (m, nvar), e_k (m,) from the current iterate (one stage).

        Rows are assembled by static stacking in row_spec order (no scatters:
        `.at[rows].set` lowers to batched scatter under vmap, which is slow on
        TPU; every selection index here is compile-time static)."""
        if nh > 0:
            h = ocp.ineq(z_k, p_k)
            C = jax.jacfwd(ocp.ineq)(z_k, p_k)
        else:
            h = jnp.zeros((0,), dtype)
            C = jnp.zeros((0, nvar), dtype)
        D_rows, e_rows = [], []
        for kind, i in row_spec:
            if kind == "hl":
                D_rows.append(C[i])
                e_rows.append(h[i] - lh[i])
            elif kind == "hu":
                D_rows.append(-C[i])
                e_rows.append(uh[i] - h[i])
            elif kind == "zl":
                D_rows.append(jnp.asarray(_unit[i], dtype))
                e_rows.append(z_k[i] - lbz[i])
            else:  # zu
                D_rows.append(jnp.asarray(-_unit[i], dtype))
                e_rows.append(ubz[i] - z_k[i])
        if not D_rows:
            return (jnp.zeros((0, nvar), dtype), jnp.zeros((0,), dtype))
        return jnp.stack(D_rows), jnp.stack(e_rows)

    def stage_cost_grad_hess(z_k, p_k):
        g = jax.grad(ocp.cost_stage)(z_k, p_k)
        H = jax.hessian(ocp.cost_stage)(z_k, p_k)
        return g, H

    def terminal_cost_grad_hess(x_N, p_N):
        g = jax.grad(ocp.cost_terminal)(x_N, p_N)
        H = jax.hessian(ocp.cost_terminal)(x_N, p_N)
        return g, H

    def dyn_lin(z_k, p_k):
        x, u = z_k[nu:], z_k[:nu]
        f = ocp.dynamics(x, u, p_k)
        Jx = jax.jacfwd(lambda xx: ocp.dynamics(xx, u, p_k))(x)
        Ju = jax.jacfwd(lambda uu: ocp.dynamics(x, uu, p_k))(u)
        return f, Jx, Ju

    def total_cost(Z, P):
        stage = jax.vmap(ocp.cost_stage)(Z[:-1], P[:-1])
        return jnp.sum(stage) + ocp.cost_terminal(Z[-1, nu:], P[-1])

    def build_qp(Z, P, xinit):
        # Cost quadratics, stages 0..N-1
        g_s, H_s = jax.vmap(stage_cost_grad_hess)(Z[:-1], P[:-1])
        g_T, H_T = terminal_cost_grad_hess(Z[-1, nu:], P[-1])
        g_term = jnp.concatenate([jnp.zeros((nu,), dtype), g_T])
        H_term = jnp.zeros((nvar, nvar), dtype)
        H_term = H_term.at[nu:, nu:].set(H_T)
        H_term = H_term.at[:nu, :nu].set(jnp.eye(nu, dtype=dtype))
        H = jnp.concatenate([H_s, H_term[None]], axis=0)
        g = jnp.concatenate([g_s, g_term[None]], axis=0)

        if config.regularization == "mirror":
            # Mirror only the true stages; terminal block is mirrored on x alone
            H_body = _mirror_regularize(H[:-1], config.reg_eps)
            H_xx_T = _mirror_regularize(H[-1, nu:, nu:], config.reg_eps)
            H_last = H[-1].at[nu:, nu:].set(H_xx_T)
            H = jnp.concatenate([H_body, H_last[None]], axis=0)
        elif config.regularization == "gershgorin":
            # PSD-ization by adaptive diagonal shift using the Gershgorin lower
            # eigenvalue bound - elementwise only (no eigh), the TPU fleet path.
            # More conservative than MIRROR (shifts all eigenvalues) but orders of
            # magnitude cheaper; the SQP fixed point is unchanged.
            diag = jnp.diagonal(H, axis1=-2, axis2=-1)  # (T, nvar)
            offdiag = jnp.sum(jnp.abs(H), axis=-1) - jnp.abs(diag)
            bound = jnp.min(diag - offdiag, axis=-1)  # (T,)
            shift = jnp.maximum(0.0, config.reg_eps - bound)
            H = H + shift[:, None, None] * jnp.eye(nvar, dtype=dtype)
        elif config.regularization == "levenberg":
            H = H + config.levenberg * jnp.eye(nvar, dtype=dtype)

        # Dynamics linearization
        f, A, B = jax.vmap(dyn_lin)(Z[:-1], P[:-1])
        c = f - Z[1:, nu:]

        # Inequality rows
        D, e = jax.vmap(build_rows)(Z, P)

        return QPData(H=H, g=g, A=A, B=B, c=c, D=D, e=e, row_mask=row_mask,
                      r0=xinit - Z[0, nu:])

    def sqp_iteration(Z, P, xinit, n_iters=config.n_qp_iter):
        qp = build_qp(Z, P, xinit)
        sol = solve_qp(qp, nu=nu, n_iters=n_iters, mu_min=config.mu_min,
                       w_max=config.w_max)
        Z_new = Z + sol.z
        return Z_new, sol

    import types as _types

    return _types.SimpleNamespace(
        build_qp=build_qp, sqp_iteration=sqp_iteration, dyn_lin=dyn_lin,
        total_cost=total_cost, row_mask=row_mask, stage_mask=stage_mask,
        row_meta=row_meta, nu=nu, nvar=nvar, N=N)


def _phases_of(config: SQPConfig):
    """((n_sqp, n_qp_iter), ...) — the inexact-SQP schedule, defaulting to one
    uniform phase (see SQPConfig.qp_iter_schedule)."""
    return (tuple((int(n), int(q)) for n, q in config.qp_iter_schedule)
            or ((config.n_sqp, config.n_qp_iter),))


def scale_iterations(config: SQPConfig, n: int) -> SQPConfig:
    """Config limited to ``n`` total SQP iterations (the budget-adaptive
    ladder, Solver.select_iterations). Plain configs just replace ``n_sqp``;
    scheduled configs drop iterations from the FRONT (loose) phases first —
    the tight tail is what converges the iterate."""
    if not config.qp_iter_schedule:
        return config._replace(n_sqp=n)
    phases = list(_phases_of(config))
    drop = sum(p[0] for p in phases) - n
    out = []
    for n_p, q_p in phases:
        d = min(max(drop, 0), n_p)
        drop -= d
        if n_p - d > 0:
            out.append((n_p - d, q_p))
    if not out:  # n larger than the schedule total, or everything dropped
        out = [(max(n, 1), phases[-1][1])]
    return config._replace(n_sqp=n, qp_iter_schedule=tuple(out))


def make_sqp_solver(ocp, config: SQPConfig = SQPConfig(), dtype=jnp.float32):
    """Build the jitted solve function for an assembled OCP.

    Returns ``solve(all_params (N, npar), xinit (nx,), z_init (N+1, nvar))`` - the
    analog of generating + compiling an acados solver. The returned function is a
    pure JAX function: wrap in ``jax.vmap`` for the planner batch axes and in
    ``jax.jit`` (done here) for compilation.
    """
    config = _f32_safe(config, dtype)
    mach = _make_machinery(ocp, config, dtype)
    nu = mach.nu
    sqp_iteration = mach.sqp_iteration
    dyn_lin = mach.dyn_lin
    total_cost = mach.total_cost

    def merit_of(Z, P, xinit):
        """SQP merit: cost + infeasibility penalty (inf when non-finite).

        The equality residual includes BOTH the dynamics defects and the
        initial-condition residual |xinit - x_0|: without the latter, a stale
        warmstart that is dynamically consistent from the WRONG start point has
        near-zero merit, wins the best-iterate comparison against every true
        iterate, and is returned as "success" (the acados analog constrains
        lbx_0 = ubx_0 = xinit, so its residual check covers it implicitly).
        """
        f, _, _ = jax.vmap(dyn_lin)(Z[:-1], P[:-1])
        eq_res = jnp.maximum(jnp.max(jnp.abs(f - Z[1:, nu:])),
                             jnp.max(jnp.abs(xinit - Z[0, nu:])))
        cost = total_cost(Z, P)
        finite = jnp.isfinite(cost) & jnp.all(jnp.isfinite(Z))
        merit = jnp.where(finite, cost + config.merit_eq_weight * eq_res,
                          jnp.inf)
        return merit, cost, eq_res, finite

    @jax.jit
    def solve(all_params, xinit, z_init):
        """all_params: (N, npar); xinit: (nx,); z_init: (N+1, nvar) warmstart."""
        P = jnp.concatenate(
            [all_params, all_params[-1:]], axis=0).astype(dtype)  # stage N reuses N-1
        Z0 = z_init.astype(dtype)
        xinit = xinit.astype(dtype)

        def make_body(n_iters):
            def body(carry, _):
                Z, best_Z, best_merit = carry
                Z_new, sol = sqp_iteration(Z, P, xinit, n_iters)
                # Guard: a NaN step (failed QP) keeps the previous iterate
                bad = jnp.any(jnp.isnan(Z_new))
                Z_new = jnp.where(bad, Z, Z_new)
                if not config.track_best:
                    return (Z_new, Z_new, best_merit), (sol.comp, sol.eq_res)
                # Best-iterate tracking: full-step SQP (acados FIXED_STEP) can
                # cycle on nonconvex problems; keep the best-merit iterate so
                # extra iterations are never worse.
                merit, _, _, _ = merit_of(Z_new, P, xinit)
                better = merit < best_merit
                best_Z = jnp.where(better, Z_new, best_Z)
                best_merit = jnp.where(better, merit, best_merit)
                return (Z_new, best_Z, best_merit), (sol.comp, sol.eq_res)
            return body

        merit0, _, _, _ = merit_of(Z0, P, xinit)
        carry = (Z0, Z0, merit0)
        for n_sqp_p, n_qp_p in _phases_of(config):
            carry, (comps, eqs) = jax.lax.scan(
                make_body(n_qp_p), carry, None, length=n_sqp_p)
        (Z_last, best_Z, _) = carry
        Z = best_Z

        merit, cost, eq_res, finite = merit_of(Z, P, xinit)
        success = (eq_res <= config.res_eq_tol) & finite
        exit_code = jnp.where(success, 1, 0)
        return SQPResult(z=Z, cost=cost, eq_res=eq_res, qp_comp=comps[-1],
                         success=success, exit_code=exit_code)

    return solve


def make_fleet_sqp_solver(ocp, config: SQPConfig = SQPConfig(),
                          dtype=jnp.float32, backend: str = "pallas",
                          interpret: bool = False):
    """Batched fleet solver: same SQP iteration, QP subproblems solved for the
    whole (flattened) batch at once.

    ``backend="pallas"`` routes the QPs through the fused TPU kernel
    (:mod:`.qp_pallas`) - the speed-of-light path for large fleets;
    ``backend="lanes"`` additionally runs the LINEARIZATION in the kernel's
    lane layout (batch on the trailing axis, :mod:`.linearize`), eliminating
    the per-iteration relayout and the batch-major scalar chains - the fastest
    path when the OCP's functions are elementwise-polymorphic (all shipped
    modules/models are); it falls back to ``"pallas"`` with a warning if the
    OCP rejects lane tracing;
    ``backend="xla"`` vmaps the reference XLA solver (used on CPU / for checks).
    ``interpret=True`` runs the Pallas kernel in interpreter mode so the EXACT
    shipped kernel is exercised by the CPU test suite (the reference analog:
    test the solver you ship, solver_generator/test/test_acados.py:48-77).

    Returns ``solve(all_params (B, N, npar), xinit (B, nx),
    z_init (B, N+1, nvar)) -> SQPResult`` with leading batch axis.
    """
    if backend == "fused":
        # Whole-SQP-in-one-pallas_call: linearization + IP in VMEM for all
        # n_sqp iterations (ops/sqp_fused.py). Requires an elementwise-
        # polymorphic OCP; falls back to the per-iteration pallas path.
        try:
            from .sqp_fused import make_fused_fleet_solver

            return make_fused_fleet_solver(ocp, config, dtype, interpret)
        except Exception as exc:
            import warnings

            warnings.warn(
                f"fused fleet solver unavailable for this OCP ({exc}); "
                "falling back to the batch-major pallas path")
            backend = "pallas"
    if backend == "lanes":
        try:
            return _make_lane_fleet_solver(ocp, config, dtype, interpret)
        except Exception as exc:  # non-elementwise OCP: use the vmap path
            import warnings

            warnings.warn(
                f"lane-layout fleet solver unavailable for this OCP ({exc}); "
                "falling back to the batch-major pallas path")
            backend = "pallas"
    config = _f32_safe(config, dtype)
    mach = _make_machinery(ocp, config, dtype)
    nu = mach.nu
    build_qp_v = jax.vmap(mach.build_qp, in_axes=(0, 0, 0))
    dyn_lin = mach.dyn_lin
    total_cost = mach.total_cost

    if backend not in ("pallas", "xla"):
        # "fused"/"lanes" were rewritten above; a typo must not silently
        # fall through to the XLA reference solver (~100x slower on TPU)
        raise ValueError(f"unknown backend {backend!r}; expected one of "
                         "'fused', 'lanes', 'pallas', 'xla'")
    dual_warm = backend == "pallas" and config.n_qp_iter_warm > 0
    if dual_warm and config.qp_iter_schedule:
        raise ValueError(
            "qp_iter_schedule and n_qp_iter_warm are mutually exclusive "
            "(the warm path already has its own per-iteration budget)")
    if backend == "pallas":
        from .qp_pallas import solve_qp_batched, solve_qp_batched_duals

        def qp_solve_batch(qp, lam=None, n_iters=config.n_qp_iter):
            if not dual_warm:
                dz = solve_qp_batched(
                    qp.H, qp.g, qp.A, qp.B, qp.c, qp.D, qp.e,
                    mach.stage_mask, qp.r0, nu=nu, n_iters=n_iters,
                    mu_min=config.mu_min, w_max=config.w_max,
                    interpret=interpret, row_meta=mach.row_meta)
                return dz, None
            n_it = config.n_qp_iter if lam is None else config.n_qp_iter_warm
            return solve_qp_batched_duals(
                qp.H, qp.g, qp.A, qp.B, qp.c, qp.D, qp.e, mach.stage_mask,
                qp.r0, nu=nu, lam0=lam, n_iters=n_it, mu_min=config.mu_min,
                w_max=config.w_max, interpret=interpret,
                row_meta=mach.row_meta)
    else:
        def qp_solve_batch(qp, lam=None, n_iters=config.n_qp_iter):
            sol = jax.vmap(lambda q: solve_qp(
                q, nu=nu, n_iters=n_iters, mu_min=config.mu_min,
                w_max=config.w_max))(qp)
            return sol.z, None

    def merit_of(Z, P, xinit):
        # Includes the initial-condition residual |xinit - x_0| alongside the
        # dynamics defects — see the single-instance merit_of for why.
        f, _, _ = jax.vmap(jax.vmap(dyn_lin))(Z[:, :-1], P[:, :-1])
        eq_res = jnp.maximum(
            jnp.max(jnp.abs(f - Z[:, 1:, nu:]), axis=(1, 2)),
            jnp.max(jnp.abs(xinit - Z[:, 0, nu:]), axis=1))
        cost = jax.vmap(total_cost)(Z, P)
        finite = jnp.isfinite(cost) & jnp.all(jnp.isfinite(Z), axis=(1, 2))
        merit = jnp.where(finite, cost + config.merit_eq_weight * eq_res,
                          jnp.inf)
        return merit, cost, eq_res, finite

    def iteration(Z, best_Z, best_merit, P, xinit_, lam=None,
                  n_iters=config.n_qp_iter):
        qp = build_qp_v(Z, P, xinit_)
        dz, lam_new = qp_solve_batch(qp, lam, n_iters)
        Z_new = Z + dz
        bad = jnp.any(jnp.isnan(Z_new), axis=(1, 2), keepdims=True)
        Z_new = jnp.where(bad, Z, Z_new)
        if lam_new is not None:
            # A failed QP's duals are useless — reseed the next warm solve
            # with a benign constant (clipped to the floor in-kernel).
            lam_new = jnp.where(jnp.isnan(lam_new),
                                jnp.ones_like(lam_new), lam_new)
        if not config.track_best:
            return Z_new, Z_new, best_merit, lam_new
        merit, _, _, _ = merit_of(Z_new, P, xinit_)
        better = (merit < best_merit)[:, None, None]
        best_Z = jnp.where(better, Z_new, best_Z)
        best_merit = jnp.minimum(merit, best_merit)
        return Z_new, best_Z, best_merit, lam_new

    def finalize(Z, P, xinit_):
        merit, cost, eq_res, finite = merit_of(Z, P, xinit_)
        success = (eq_res <= config.res_eq_tol) & finite
        exit_code = jnp.where(success, 1, 0)
        return SQPResult(z=Z, cost=cost, eq_res=eq_res,
                         qp_comp=jnp.zeros_like(cost), success=success,
                         exit_code=exit_code)

    if interpret:
        # CPU-suite path: XLA:CPU compile time explodes on n_sqp unrolled
        # copies of the interpreted kernel inside one jitted scan, so run a
        # host loop over a once-jitted single iteration (same shipped code
        # path; compile cost paid once per distinct QP-iteration count).
        iteration_j = {
            n_qp: jax.jit(partial(iteration, n_iters=n_qp))
            for _, n_qp in _phases_of(config)}
        finalize_j = jax.jit(finalize)

        def solve(all_params, xinit, z_init):
            P = jnp.concatenate(
                [all_params, all_params[:, -1:]], axis=1).astype(dtype)
            Z = z_init.astype(dtype)
            xinit_ = xinit.astype(dtype)
            best_merit, _, _, _ = merit_of(Z, P, xinit_)
            best_Z = Z
            lam = None
            for n_sqp_p, n_qp_p in _phases_of(config):
                for _ in range(n_sqp_p):
                    Z, best_Z, best_merit, lam_new = iteration_j[n_qp_p](
                        Z, best_Z, best_merit, P, xinit_, lam)
                    lam = lam_new if dual_warm else None
            return finalize_j(best_Z, P, xinit_)

        return solve

    @jax.jit
    def solve(all_params, xinit, z_init):
        P = jnp.concatenate(
            [all_params, all_params[:, -1:]], axis=1).astype(dtype)
        Z0 = z_init.astype(dtype)
        xinit_ = xinit.astype(dtype)

        merit0, _, _, _ = merit_of(Z0, P, xinit_)

        if dual_warm:
            # Iteration 0 cold (full n_qp_iter, emits duals); iterations
            # 1..n_sqp-1 warm-start the duals with n_qp_iter_warm each.
            Z1, best_Z0, best_merit0, lam = iteration(
                Z0, Z0, merit0, P, xinit_, None)

            def body(carry, _):
                Z, best_Z, best_merit, lam_c = carry
                Z_new, best_Z, best_merit, lam_n = iteration(
                    Z, best_Z, best_merit, P, xinit_, lam_c)
                return (Z_new, best_Z, best_merit, lam_n), None

            (Z_last, Z, _, _), _ = jax.lax.scan(
                body, (Z1, best_Z0, best_merit0, lam), None,
                length=config.n_sqp - 1)
            return finalize(Z, P, xinit_)

        def make_body(n_qp):
            def body(carry, _):
                Z, best_Z, best_merit = carry
                Z_new, best_Z, best_merit, _ = iteration(
                    Z, best_Z, best_merit, P, xinit_, n_iters=n_qp)
                return (Z_new, best_Z, best_merit), None
            return body

        carry = (Z0, Z0, merit0)
        for n_sqp_p, n_qp_p in _phases_of(config):
            carry, _ = jax.lax.scan(
                make_body(n_qp_p), carry, None, length=n_sqp_p)
        (Z_last, Z, _) = carry

        return finalize(Z, P, xinit_)

    return solve


def _make_lane_fleet_solver(ocp, config: SQPConfig, dtype, interpret):
    """Fleet solver with the whole per-iteration pipeline in lane layout.

    The batch lives on the TRAILING axis end-to-end: the linearizer
    (:mod:`.linearize`) emits QP fields directly in the Pallas kernel's
    field-major layout and :func:`.qp_pallas.solve_qp_lanes` consumes them
    with reshapes only — no per-iteration transposes, and every scalar chain
    in the module/model math runs across full 128-element VPU lanes. The
    public API stays batch-major (transposed once at entry/exit).

    Raises at build time if the OCP's functions are not elementwise-
    polymorphic (callers fall back to the vmap linearizer)."""
    from .linearize import make_lane_linearizer, make_lane_merit
    from .qp_pallas import solve_qp_lanes

    config = _f32_safe(config, dtype)
    mach = _make_machinery(ocp, config, dtype)
    lin = make_lane_linearizer(ocp, config, dtype)
    merit_of = make_lane_merit(ocp, config, dtype)
    nu, nvar, N = mach.nu, mach.nvar, mach.N
    npar = ocp.npar

    # Eager polymorphism check: trace the linearizer on a tiny abstract batch
    # so an unsupported OCP fails HERE (catchable) rather than at first call.
    jax.eval_shape(
        lin,
        jax.ShapeDtypeStruct((npar, N + 1, 2), dtype),
        jax.ShapeDtypeStruct((N + 1, nvar, 2), dtype),
        jax.ShapeDtypeStruct((ocp.nx, 2), dtype))

    def iteration(Z, best_Z, best_merit, P_cols, x_cols,
                  n_iters=config.n_qp_iter):
        qp = lin(P_cols, Z, x_cols)
        dz = solve_qp_lanes(
            qp, mach.stage_mask, nu=nu, n_iters=n_iters,
            mu_min=config.mu_min, w_max=config.w_max, interpret=interpret,
            row_meta=mach.row_meta)
        Z_new = Z + dz
        bad = jnp.any(jnp.isnan(Z_new), axis=(0, 1), keepdims=True)
        Z_new = jnp.where(bad, Z, Z_new)
        if not config.track_best:
            return Z_new, Z_new, best_merit
        merit, _, _, _ = merit_of(P_cols, Z_new, x_cols)
        better = (merit < best_merit)[None, None, :]
        best_Z = jnp.where(better, Z_new, best_Z)
        best_merit = jnp.minimum(merit, best_merit)
        return Z_new, best_Z, best_merit

    def finalize(Z, P_cols, x_cols):
        merit, cost, eq_res, finite = merit_of(P_cols, Z, x_cols)
        success = (eq_res <= config.res_eq_tol) & finite
        exit_code = jnp.where(success, 1, 0)
        return SQPResult(z=jnp.transpose(Z, (2, 0, 1)), cost=cost,
                         eq_res=eq_res, qp_comp=jnp.zeros_like(cost),
                         success=success, exit_code=exit_code)

    def prepare(all_params, xinit, z_init):
        P = jnp.concatenate(
            [all_params, all_params[:, -1:]], axis=1).astype(dtype)
        P_cols = jnp.transpose(P, (2, 1, 0))  # (npar, T, B)
        Z0 = jnp.transpose(z_init.astype(dtype), (1, 2, 0))  # (T, nz, B)
        x_cols = jnp.transpose(xinit.astype(dtype), (1, 0))  # (nx, B)
        return P_cols, Z0, x_cols

    if interpret:
        # CPU-suite path: host loop over a once-jitted iteration (XLA:CPU
        # compile cost of n_sqp unrolled interpreted kernels is prohibitive).
        iteration_j = {
            n_qp: jax.jit(partial(iteration, n_iters=n_qp))
            for _, n_qp in _phases_of(config)}
        finalize_j = jax.jit(finalize)

        def solve(all_params, xinit, z_init):
            P_cols, Z, x_cols = prepare(all_params, xinit, z_init)
            best_merit, _, _, _ = merit_of(P_cols, Z, x_cols)
            best_Z = Z
            for n_sqp_p, n_qp_p in _phases_of(config):
                for _ in range(n_sqp_p):
                    Z, best_Z, best_merit = iteration_j[n_qp_p](
                        Z, best_Z, best_merit, P_cols, x_cols)
            return finalize_j(best_Z, P_cols, x_cols)

        return solve

    @jax.jit
    def solve(all_params, xinit, z_init):
        P_cols, Z0, x_cols = prepare(all_params, xinit, z_init)

        def make_body(n_qp):
            def body(carry, _):
                Z, best_Z, best_merit = carry
                Z_new, best_Z, best_merit = iteration(
                    Z, best_Z, best_merit, P_cols, x_cols, n_iters=n_qp)
                return (Z_new, best_Z, best_merit), None
            return body

        merit0, _, _, _ = merit_of(P_cols, Z0, x_cols)
        carry = (Z0, Z0, merit0)
        for n_sqp_p, n_qp_p in _phases_of(config):
            carry, _ = jax.lax.scan(
                make_body(n_qp_p), carry, None, length=n_sqp_p)
        (Z_last, Z, _) = carry
        return finalize(Z, P_cols, x_cols)

    return solve
