"""Sigmoid-spliced cubic splines, evaluated in JAX.

Reimplements the reference's symbolic spline machinery
(solver_generator/spline.py:4-87): the reference path over the horizon is carried as
``num_segments`` cubic segments ``a s^3 + b s^2 + c s + d`` in local coordinates
``s - s_start``, blended into a single smooth function of progress ``s`` by chaining
sigmoids ``lambda_i = 1 / (1 + exp((s - s_start_i + 0.02) / 0.1))`` from the last
segment backwards. This keeps the whole-horizon path a single differentiable
expression - exactly what both CasADi and XLA want (no data-dependent branching on
the active segment).

Evaluation is fully vectorized with the segment axis LEADING (shape
``(M, ...batch)``). Two layout constraints force this (round-3 findings):

- the fused SQP kernel (ops/sqp_fused.py) traces this code on (8, 128) batch
  tiles, where the batch MUST stay on the trailing two axes (a trailing
  segment axis displaces the lane dim) and trailing-axis integer indexing
  lowers to ``dynamic_slice``, which Mosaic cannot compile — leading-axis
  positive-constant indexing lowers to a static slice;
- a fully list-unrolled variant (no segment axis at all) was tried and kept
  the kernel happy but slowed the XLA-side per-iteration linearization ~7x
  on TPU (30 -> 219 ms per 4608-plan fleet step): XLA:TPU materialized the M
  separate polynomial/sigmoid chains instead of one vectorized op.

``jax.nn.sigmoid`` replaces the reference's raw ``1/(1+exp(t))`` -
mathematically identical but overflow-safe in float32.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def _as_segments(x):
    """Leading-segment-axis array from a per-segment list (the Spline class
    path — kernel-safe, no transpose) or a trailing-axis (..., M) array (the
    legacy array API used by host code/tests)."""
    if isinstance(x, (list, tuple)):
        return jnp.stack(x, axis=0)
    x = jnp.asarray(x)
    if x.ndim == 1:
        return x
    return jnp.moveaxis(x, -1, 0)


def _chain_blend(values, lambdas):
    """Iteratively glue segment values back-to-front (reference spline.py:39-44).

    values: (M, ...) per-segment evaluations; lambdas: (M-1, ...) weights.
    Indexing uses positive constants on the leading axis only (static slices
    under Mosaic; negative/trailing integer indexing lowers to dynamic_slice).
    """
    M = values.shape[0]
    out = values[M - 1]
    for k in range(M - 1, 0, -1):
        lam = lambdas[k - 1]
        out = lam * values[k - 1] + (1.0 - lam) * out
    return out


def _lambdas(starts, s):
    return jax.nn.sigmoid(-(s[None] - starts[1:] + 0.02) / 0.1)


def eval_spline(a, b, c, d, starts, s):
    """Blended spline value at s. Coefficients: per-segment lists or
    (..., M)-stacked arrays; s: scalar or batched."""
    a, b, c, d, starts = map(_as_segments, (a, b, c, d, starts))
    s = jnp.asarray(s)
    ds = s[None] - starts
    vals = ((a * ds + b) * ds + c) * ds + d
    return _chain_blend(vals, _lambdas(starts, s))


def eval_spline_deriv(a, b, c, starts, s):
    a, b, c, starts = map(_as_segments, (a, b, c, starts))
    s = jnp.asarray(s)
    ds = s[None] - starts
    vals = (3.0 * a * ds + 2.0 * b) * ds + c
    return _chain_blend(vals, _lambdas(starts, s))


def eval_spline_deriv2(a, b, starts, s):
    a, b, starts = map(_as_segments, (a, b, starts))
    s = jnp.asarray(s)
    vals = 6.0 * a * (s[None] - starts) + 2.0 * b
    return _chain_blend(vals, _lambdas(starts, s))


class Spline:
    """Named-parameter spline over a ParameterView (reference spline.py:28-56).

    ``name`` is e.g. ``"spline_x"``; coefficients are read from parameters
    ``{name}{i}_a..d`` and knots from ``spline{i}_start``. Coefficients are
    held as per-segment lists and stacked on the LEADING axis at evaluation
    (see module header); each entry is a scalar or a batched array matching
    ``s``'s batch axes.
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
