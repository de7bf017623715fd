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


def jax_erf(x):
    import jax.scipy.special as jsp

    return jsp.erf(x)


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
