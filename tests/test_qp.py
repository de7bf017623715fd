"""QP solver validation against scipy on random stagewise problems.

Mirrors the role of the reference's solver integration test
(solver_generator/test/test_acados.py:48-77): the numerical core must solve real
problems to tolerance, not just run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.qp import QPData, solve_qp


def random_qp(seed, T=6, nx=3, nu=2, m=4):
    rng = np.random.default_rng(seed)
    nz = nu + nx
    H = np.zeros((T, nz, nz))
    for t in range(T):
        M = rng.normal(size=(nz, nz))
        H[t] = M @ M.T + 0.5 * np.eye(nz)
    # Terminal stage: pad u-block
    H[-1, :nu, :] = 0.0
    H[-1, :, :nu] = 0.0
    H[-1, :nu, :nu] = np.eye(nu)
    g = rng.normal(size=(T, nz))
    g[-1, :nu] = 0.0
    A = rng.normal(size=(T - 1, nx, nx)) * 0.5
    B = rng.normal(size=(T - 1, nx, nu))
    c = rng.normal(size=(T - 1, nx)) * 0.1
    D = rng.normal(size=(T, m, nz))
    e = rng.uniform(0.5, 2.0, size=(T, m))  # feasible at z=0
    mask = np.ones((T, m))
    D[-1] = 0.0
    e[-1] = 1.0
    mask[-1] = 0.0
    r0 = rng.normal(size=(nx,)) * 0.3
    return QPData(*[jnp.asarray(x) for x in (H, g, A, B, c, D, e, mask, r0)]), (
        H, g, A, B, c, D, e, mask, r0)


def scipy_reference(H, g, A, B, c, D, e, mask, r0, nu):
    """Dense QP via scipy.optimize.minimize(SLSQP) on the stacked variables."""
    from scipy.optimize import minimize

    T, nz = g.shape
    nx = A.shape[-1]

    def unpack(v):
        return v.reshape(T, nz)

    def f(v):
        z = unpack(v)
        return float(np.sum(0.5 * np.einsum("ti,tij,tj->t", z, H, z)
                            + np.sum(g * z, axis=1)))

    def jac_f(v):
        z = unpack(v)
        return (np.einsum("tij,tj->ti", H, z) + g).ravel()

    eq_cons = []

    def eq_fun(v):
        z = unpack(v)
        res = [z[0, nu:] - r0]
        for t in range(T - 1):
            res.append(A[t] @ z[t, nu:] + B[t] @ z[t, :nu] + c[t] - z[t + 1, nu:])
        res.append(z[-1, :nu])  # dummy terminal u = 0
        return np.concatenate(res)

    def ineq_fun(v):
        z = unpack(v)
        vals = np.einsum("tmz,tz->tm", D, z) + e
        return vals[mask > 0]

    res = minimize(f, np.zeros(T * nz), jac=jac_f, method="SLSQP",
                   constraints=[{"type": "eq", "fun": eq_fun},
                                {"type": "ineq", "fun": ineq_fun}],
                   options={"maxiter": 500, "ftol": 1e-12})
    assert res.success, res.message
    return unpack(res.x)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_qp_matches_scipy(seed):
    qp, raw = random_qp(seed)
    sol = solve_qp(qp, nu=2, n_iters=30, mu_min=1e-11)
    z_ref = scipy_reference(*raw, nu=2)
    z = np.asarray(sol.z)
    assert np.isfinite(z).all()
    # Terminal dummy u is unconstrained in our solver but zero-by-construction
    np.testing.assert_allclose(z[:-1], z_ref[:-1], atol=2e-5)
    np.testing.assert_allclose(z[-1, 2:], z_ref[-1, 2:], atol=2e-5)


@pytest.mark.parametrize("seed,tighten", [(7, 0.5), (11, 0.8), (13, 1.0)])
def test_qp_active_constraints(seed, tighten):
    """Problems where the unconstrained optimum violates constraints (z=0 is
    inequality-infeasible, several rows active at the optimum)."""
    qp, raw = random_qp(seed)
    H, g, A, B, c, D, e, mask, r0 = raw
    e = np.where(mask > 0, e - tighten, e)
    qp = QPData(*[jnp.asarray(x) for x in (H, g, A, B, c, D, e, mask, r0)])
    sol = solve_qp(qp, nu=2, n_iters=30, mu_min=1e-11)
    z = np.asarray(sol.z)
    vals = np.einsum("tmz,tz->tm", D, z) + e
    assert vals[mask > 0].min() > -1e-6  # feasible
    z_ref = scipy_reference(H, g, A, B, c, D, e, mask, r0, nu=2)
    np.testing.assert_allclose(z[:-1], z_ref[:-1], atol=1e-4)


def test_qp_kkt_residuals(seed=5):
    """Direct KKT verification (no external reference): stationarity projected onto
    the equality-constraint null space, feasibility, complementarity."""
    qp, raw = random_qp(seed)
    H, g, A, B, c, D, e, mask, r0 = raw
    T, nz = g.shape
    nx, nu = A.shape[-1], 2
    sol = solve_qp(qp, nu=nu, n_iters=30, mu_min=1e-11)
    z, lam = np.asarray(sol.z), np.asarray(sol.lam)

    # Stationarity: r = Hz + g - D^T lam must lie in range(E^T)
    r = (np.einsum("tij,tj->ti", H, z) + g
         - np.einsum("tmz,tm->tz", D, lam * mask)).ravel()
    rows = []
    rr = np.zeros((nx, T * nz))
    rr[:, nu:nz] = np.eye(nx)
    rows += [rr[i] for i in range(nx)]
    for t in range(T - 1):
        for i in range(nx):
            row = np.zeros(T * nz)
            row[t * nz + nu : t * nz + nz] = A[t][i]
            row[t * nz : t * nz + nu] = B[t][i]
            row[(t + 1) * nz + nu + i] = -1.0
            rows.append(row)
    for i in range(nu):
        row = np.zeros(T * nz)
        row[(T - 1) * nz + i] = 1.0
        rows.append(row)
    E = np.stack(rows)
    r_proj = r - E.T @ np.linalg.solve(E @ E.T, E @ r)
    assert np.max(np.abs(r_proj)) < 1e-6
    assert float(sol.comp) < 1e-7
    assert float(sol.eq_res) < 1e-8
