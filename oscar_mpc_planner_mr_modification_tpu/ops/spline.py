"""Sigmoid-spliced cubic splines, evaluated in JAX.

Reimplements the reference's symbolic spline machinery
(solver_generator/spline.py:4-87): the reference path over the horizon is carried as
``num_segments`` cubic segments ``a s^3 + b s^2 + c s + d`` in local coordinates
``s - s_start``, blended into a single smooth function of progress ``s`` by chaining
sigmoids ``lambda_i = 1 / (1 + exp((s - s_start_i + 0.02) / 0.1))`` from the last
segment backwards. This keeps the whole-horizon path a single differentiable
expression - exactly what both CasADi and XLA want (no data-dependent branching on
the active segment).

Evaluation is fully vectorized over the VALUE axes: ``s`` and each coefficient may
carry arbitrary (broadcast-compatible) batch shapes. The SEGMENT axis, however, is
a Python list (statically unrolled, mirroring the reference's per-segment symbolic
objects): integer indexing on a trailing array axis lowers to ``dynamic_slice``,
which the Pallas TPU backend cannot compile, and inside the fused SQP kernel
(ops/sqp_fused.py) a stacked segment axis would also displace the (sublane, lane)
batch tile from the trailing positions. List-unrolled segments keep every op
elementwise on the batch tile. ``jax.nn.sigmoid`` replaces the reference's raw
``1/(1+exp(t))`` - mathematically identical but overflow-safe in float32.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def _as_segments(x):
    """Per-segment list from either a list/tuple or a (..., M)-stacked array."""
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x[..., i] for i in range(x.shape[-1])]


def _chain_blend(values, lambdas):
    """Iteratively glue segment values back-to-front (reference spline.py:39-44).

    values: list of M per-segment evaluations; lambdas: list of M-1 weights.
    """
    out = values[-1]
    for k in range(len(values) - 1, 0, -1):
        lam = lambdas[k - 1]
        out = lam * values[k - 1] + (1.0 - lam) * out
    return out


def _lambdas(starts, s):
    return [jax.nn.sigmoid(-(s - st + 0.02) / 0.1) for st in starts[1:]]


def eval_spline(a, b, c, d, starts, s):
    """Blended spline value at s. Coefficients: per-segment lists or
    (..., M)-stacked arrays; s: scalar or batched."""
    a, b, c, d, starts = map(_as_segments, (a, b, c, d, starts))
    s = jnp.asarray(s)
    vals = []
    for ai, bi, ci, di, sti in zip(a, b, c, d, starts):
        ds = s - sti
        vals.append(((ai * ds + bi) * ds + ci) * ds + di)
    return _chain_blend(vals, _lambdas(starts, s))


def eval_spline_deriv(a, b, c, starts, s):
    a, b, c, starts = map(_as_segments, (a, b, c, starts))
    s = jnp.asarray(s)
    vals = []
    for ai, bi, ci, sti in zip(a, b, c, starts):
        ds = s - sti
        vals.append((3.0 * ai * ds + 2.0 * bi) * ds + ci)
    return _chain_blend(vals, _lambdas(starts, s))


def eval_spline_deriv2(a, b, starts, s):
    a, b, starts = map(_as_segments, (a, b, starts))
    s = jnp.asarray(s)
    vals = [6.0 * ai * (s - sti) + 2.0 * bi
            for ai, bi, sti in zip(a, b, starts)]
    return _chain_blend(vals, _lambdas(starts, s))


class Spline:
    """Named-parameter spline over a ParameterView (reference spline.py:28-56).

    ``name`` is e.g. ``"spline_x"``; coefficients are read from parameters
    ``{name}{i}_a..d`` and knots from ``spline{i}_start``. Coefficients are
    held as per-segment lists (see module header); each entry is a scalar or
    a batched array matching ``s``'s trailing batch axes.
    """

    def __init__(self, params, name: str, num_segments: int, s):
        self.a = [params.get(f"{name}{i}_a") for i in range(num_segments)]
        self.b = [params.get(f"{name}{i}_b") for i in range(num_segments)]
        self.c = [params.get(f"{name}{i}_c") for i in range(num_segments)]
        self.d = [params.get(f"{name}{i}_d") for i in range(num_segments)]
        self.starts = [params.get(f"spline{i}_start")
                       for i in range(num_segments)]
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
