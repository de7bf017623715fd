"""Math helpers shared by module definitions and runtime code.

Mirrors the semantics of the reference's ``solver_generator/util/math.py`` and
``ros_tools`` math helpers (reference: /root/reference/solver_generator/util/math.py:5-11),
re-expressed for JAX.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotation_matrix(angle):
    """2D rotation matrix. Works on scalars and traced values.

    Reference: solver_generator/util/math.py:5-7.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]]) if jnp.ndim(angle) == 0 else jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def haar_difference_without_abs(angle1, angle2):
    """Signed angular difference wrapped to (-pi, pi].

    Reference: solver_generator/util/math.py:10-11 — ``fmod(a1-a2+pi, 2pi) - pi``
    with C ``fmod`` semantics (sign follows dividend), which jnp.fmod matches.
    """
    return jnp.fmod(angle1 - angle2 + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def jnp_atan(x):
    """arctan from primitives the Pallas TPU backend can lower.

    Mosaic has no atan/asin/acos lowering (only tan among inverse-trig
    relatives), so module/model math that must trace inside the fused SQP
    kernel (ops/sqp_fused.py) uses this instead of ``jnp.arctan``: a rational
    seed (max error ~4e-3 rad) polished by 3 Newton iterations on
    ``tan(a) = x`` (quadratic: 4e-3 -> 1e-5 -> 1e-10 -> round-off), with
    ``|x| > 1`` range-reduced via ``atan(x) = sign(x)*pi/2 - atan(1/x)``.
    Same pattern as :func:`erfinv_newton` (the reference's own workaround for
    CasADi's missing erfinv)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    safe = jnp.where(inv, x, 1.0)
    xr = jnp.where(inv, 1.0 / safe, x)  # |xr| <= 1
    a = xr * (jnp.pi / 4 + 0.273 * (1.0 - jnp.abs(xr)))
    for _ in range(3):
        t = jnp.tan(a)
        a = a - (t - xr) / (1.0 + t * t)
    return jnp.where(inv, jnp.sign(x) * (jnp.pi / 2) - a, a)


def jnp_atan2(y, x):
    """Four-quadrant arctan built on :func:`jnp_atan` (Pallas-safe
    ``jnp.arctan2`` replacement; matches numpy conventions including the
    axes: atan2(0, -1) = pi, atan2(+-y, 0) = +-pi/2)."""
    x_safe = jnp.where(x == 0.0, 1.0, x)
    base = jnp_atan(y / x_safe)
    on_axis = jnp.where(y > 0.0, jnp.pi / 2,
                        jnp.where(y < 0.0, -jnp.pi / 2, 0.0))
    neg_x = base + jnp.where(y >= 0.0, jnp.pi, -jnp.pi)
    return jnp.where(x > 0.0, base, jnp.where(x < 0.0, neg_x, on_axis))


def erfinv_newton(x):
    """Inverse error function: rational initial guess + two Newton polish steps.

    The reference hand-rolls this inside the CC-MPC chance constraint because CasADi
    lacks erfinv (reference: mpc_planner_modules/scripts/gaussian_constraints.py:108-114).
    We reproduce the identical three-step scheme so constraint values match the
    generated acados solver bit-for-bit at the math level.
    """
    z = jnp.sqrt(-jnp.log((1.0 - x) / 2.0))
    y = (((1.641345311 * z + 3.429567803) * z - 1.624906493) * z - 1.970840454) / (
        (1.637067800 * z + 3.543889200) * z + 1.0
    )
    two_over_sqrt_pi = 2.0 / jnp.sqrt(jnp.pi)
    for _ in range(2):
        y = y - (jax_erf(y) - x) / (two_over_sqrt_pi * jnp.exp(-y * y))
    return y


# Cody/CALERF rational coefficients (W. J. Cody, "Rational Chebyshev
# approximation for the error function", Math. Comp. 23 (1969); the classic
# netlib calerf implementation). Max relative error ~1e-16 in double.
_ERF_A = (3.16112374387056560e0, 1.13864154151050156e2,
          3.77485237685302021e2, 3.20937758913846947e3,
          1.85777706184603153e-1)
_ERF_B = (2.36012909523441209e1, 2.44024637934444173e2,
          1.28261652607737228e3, 2.84423683343917062e3)
_ERF_C = (5.64188496988670089e-1, 8.88314979438837594e0,
          6.61191906371416295e1, 2.98635138197400131e2,
          8.81952221241769090e2, 1.71204761263407058e3,
          2.05107837782607147e3, 1.23033935479799725e3,
          2.15311535474403846e-8)
_ERF_D = (1.57449261107098347e1, 1.17693950891312499e2,
          5.37181101862009858e2, 1.62138957456669019e3,
          3.29079923573345963e3, 4.36261909014324716e3,
          3.43936767414372164e3, 1.23033935480374942e3)
_ERF_P = (3.05326634961232344e-1, 3.60344899949804439e-1,
          1.25781726111229246e-1, 1.60837851487422766e-2,
          6.58749161529837803e-4, 1.63153871373020978e-2)
_ERF_Q = (2.56852019228982242e0, 1.87295284992346047e0,
          5.27905102951428412e-1, 6.05183413124413191e-2,
          2.33520497626869185e-3)


def jnp_erf(x):
    """Error function from primitives the Pallas TPU backend can lower.

    Mosaic has no ``erf`` lowering (it does have ``erf_inv``), so module math
    that must trace inside the fused SQP kernel (the CC-MPC chance
    constraint's erfinv-Newton polish) uses this Cody/CALERF rational
    approximation (exp + polynomials only; double-precision accurate to
    ~1e-16, validated against scipy in tests/test_modules.py)."""
    y = jnp.abs(x)
    # Region 1: |x| <= 0.46875 -> erf directly
    z1 = jnp.where(y <= 0.46875, y * y, 0.0)
    num = _ERF_A[4] * z1
    den = z1
    for i in range(3):
        num = (num + _ERF_A[i]) * z1
        den = (den + _ERF_B[i]) * z1
    r1 = x * (num + _ERF_A[3]) / (den + _ERF_B[3])

    # Region 2: 0.46875 < |x| <= 4 -> erfc via C/D rational * exp(-x^2)
    y2 = jnp.where(y > 0.46875, y, 1.0)
    num = _ERF_C[8] * y2
    den = y2
    for i in range(7):
        num = (num + _ERF_C[i]) * y2
        den = (den + _ERF_D[i]) * y2
    erfc2 = jnp.exp(-y2 * y2) * (num + _ERF_C[7]) / (den + _ERF_D[7])

    # Region 3: |x| > 4 -> asymptotic erfc
    inv2 = 1.0 / (y2 * y2)
    num = _ERF_P[5] * inv2
    den = inv2
    for i in range(4):
        num = (num + _ERF_P[i]) * inv2
        den = (den + _ERF_Q[i]) * inv2
    res3 = inv2 * (num + _ERF_P[4]) / (den + _ERF_Q[4])
    erfc3 = jnp.exp(-y2 * y2) * (0.5641895835477562869 - res3) / y2

    erfc_tail = jnp.where(y <= 4.0, erfc2, erfc3)
    # Saturate far tail (exp underflow region): erf(|x| > 6) == 1 in double
    erfc_tail = jnp.where(y > 26.5, 0.0, erfc_tail)
    r23 = jnp.where(x >= 0.0, 1.0 - erfc_tail, erfc_tail - 1.0)
    return jnp.where(y <= 0.46875, r1, r23)


def jax_erf(x):
    return jnp_erf(x)


def exponential_quantile(rate: float, p):
    """Quantile (inverse CDF) of the exponential distribution.

    Used for the ellipsoidal-constraint risk inflation
    ``chi = ExponentialQuantile(0.5, 1 - risk)`` (reference:
    mpc_planner_modules/src/ellipsoid_constraints.cpp:34-90 via ros_tools).
    ``Q(p; rate) = -log(1 - p) / rate``.
    """
    return -jnp.log(1.0 - p) / rate


def np_haar_difference(angle1, angle2):
    """numpy version of :func:`haar_difference_without_abs` for host code."""
    return np.fmod(angle1 - angle2 + np.pi, 2.0 * np.pi) - np.pi


def wrap_angle(a):
    """Wrap angle to (-pi, pi]."""
    return np.arctan2(np.sin(a), np.cos(a))
