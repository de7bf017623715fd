"""Sigmoid-spliced cubic splines, evaluated in JAX.

Reimplements the reference's symbolic spline machinery
(solver_generator/spline.py:4-87): the reference path over the horizon is carried as
``num_segments`` cubic segments ``a s^3 + b s^2 + c s + d`` in local coordinates
``s - s_start``, blended into a single smooth function of progress ``s`` by chaining
sigmoids ``lambda_i = 1 / (1 + exp((s - s_start_i + 0.02) / 0.1))`` from the last
segment backwards. This keeps the whole-horizon path a single differentiable
expression - exactly what both CasADi and XLA want (no data-dependent branching on
the active segment).

Evaluation is fully vectorized: coefficients are (num_segments,) arrays (or batched
(..., num_segments)), ``s`` may be scalar or batched. We use ``jax.nn.sigmoid`` for
the blend - mathematically identical to the reference's ``1/(1+exp(t))`` but without
overflow in float32 when ``s`` is far from a segment start.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def _chain_blend(values, lambdas):
    """Iteratively glue segment values back-to-front (reference spline.py:39-44).

    values: (..., M) per-segment evaluations; lambdas: (..., M-1) blend weights.
    """
    out = values[..., -1]
    M = values.shape[-1]
    for k in range(M - 1, 0, -1):
        lam = lambdas[..., k - 1]
        out = lam * values[..., k - 1] + (1.0 - lam) * out
    return out


def _segment_eval(a, b, c, d, starts, s):
    ds = s[..., None] - starts
    return ((a * ds + b) * ds + c) * ds + d


def _segment_deriv(a, b, c, starts, s):
    ds = s[..., None] - starts
    return (3.0 * a * ds + 2.0 * b) * ds + c


def _segment_deriv2(a, b, starts, s):
    ds = s[..., None] - starts
    return 6.0 * a * ds + 2.0 * b


def _lambdas(starts, s):
    return jax.nn.sigmoid(-(s[..., None] - starts[..., 1:] + 0.02) / 0.1)


def eval_spline(a, b, c, d, starts, s):
    """Blended spline value at s. a,b,c,d,starts: (..., M); s: (...)."""
    s = jnp.asarray(s)
    return _chain_blend(_segment_eval(a, b, c, d, starts, s), _lambdas(starts, s))


def eval_spline_deriv(a, b, c, starts, s):
    s = jnp.asarray(s)
    return _chain_blend(_segment_deriv(a, b, c, starts, s), _lambdas(starts, s))


def eval_spline_deriv2(a, b, starts, s):
    s = jnp.asarray(s)
    return _chain_blend(_segment_deriv2(a, b, starts, s), _lambdas(starts, s))


class Spline:
    """Named-parameter spline over a ParameterView (reference spline.py:28-56).

    ``name`` is e.g. ``"spline_x"``; coefficients are read from parameters
    ``{name}{i}_a..d`` and knots from ``spline{i}_start``.
    """

    def __init__(self, params, name: str, num_segments: int, s):
        # Segment axis LAST: for scalar parameters this is the plain (M,)
        # coefficient vector; for batched parameters (trailing batch axes, the
        # lane-layout linearizer in ops/linearize.py) it broadcasts against
        # ``s[..., None]`` in the segment evaluators.
        self.a = jnp.stack(
            [params.get(f"{name}{i}_a") for i in range(num_segments)], axis=-1)
        self.b = jnp.stack(
            [params.get(f"{name}{i}_b") for i in range(num_segments)], axis=-1)
        self.c = jnp.stack(
            [params.get(f"{name}{i}_c") for i in range(num_segments)], axis=-1)
        self.d = jnp.stack(
            [params.get(f"{name}{i}_d") for i in range(num_segments)], axis=-1)
        self.starts = jnp.stack(
            [params.get(f"spline{i}_start") for i in range(num_segments)],
            axis=-1)
        self._s = s

    def at(self, s):
        return eval_spline(self.a, self.b, self.c, self.d, self.starts, s)

    def deriv(self, s):
        return eval_spline_deriv(self.a, self.b, self.c, self.starts, s)

    def deriv2(self, s):
        return eval_spline_deriv2(self.a, self.b, self.starts, s)


class Spline2D:
    """2D spline path (x(s), y(s)) (reference spline.py:60-87)."""

    def __init__(self, params, num_segments: int, s):
        self.spline_x = Spline(params, "spline_x", num_segments, s)
        self.spline_y = Spline(params, "spline_y", num_segments, s)

    def at(self, s):
        return self.spline_x.at(s), self.spline_y.at(s)

    def deriv(self, s):
        return self.spline_x.deriv(s), self.spline_y.deriv(s)

    def deriv_normalized(self, s):
        dx = self.spline_x.deriv(s)
        dy = self.spline_y.deriv(s)
        norm = jnp.sqrt(dx * dx + dy * dy)
        return dx / norm, dy / norm

    def deriv2(self, s):
        return self.spline_x.deriv2(s), self.spline_y.deriv2(s)

    def get_curvature(self, s):
        ddx = self.spline_x.deriv2(s)
        ddy = self.spline_y.deriv2(s)
        return jnp.sqrt(ddx * ddx + ddy * ddy)
