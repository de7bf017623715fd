"""Structural Jacobian column support via jaxpr dependency analysis.

The Pallas QP kernel stores and contracts only the statically-supported
columns of each generic inequality row (ops/qp_pallas.py sparse-D storage).
Round 2 derived that support by probing ``jacfwd(ocp.ineq)`` at random points,
which silently mis-prunes constraints whose terms vanish on the probe box
(parameter-gated ``where``/``max`` branches, clamps active only off-box) —
the round-2 ADVICE/VERDICT finding. This module derives the support
STRUCTURALLY instead: an abstract interpreter propagates per-element
dependency masks through the traced jaxpr of the constraint function.

Soundness: for every primitive, the propagated mask is a superset of the true
jvp-Jacobian support as JAX evaluates it.

- The conservative default (output elements depend on the union of all input
  elements' dependencies) can only over-approximate.
- Refined rules (elementwise ops, shape ops, reductions, concatenate, slices
  with static indices) propagate exact elementwise unions.
- Zero-derivative primitives (``stop_gradient``, comparisons, ``floor``,
  ``sign``, ``iota``, integer outputs) contribute NO dependencies: JAX's jvp
  of ``where(pred, a, b)`` is ``where(pred, da, db)`` — the predicate never
  enters the tangent — so dropping predicate deps matches what ``jacfwd``
  actually computes while keeping the gated BRANCHES' columns in support.

An over-approximation costs only kernel FLOPs (extra columns contracted); an
under-approximation would silently corrupt constraint handling — hence the
structural approach with a conservative fallback for unknown primitives.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import jax.extend.core as jcore
from jax._src.core import DropVar as _DropVar

# Elementwise primitives: output mask = OR of operand masks, broadcast.
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "pow", "integer_pow", "neg", "exp", "exp2",
    "log", "log1p", "expm1", "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "sqrt", "rsqrt",
    "cbrt", "abs", "max", "min", "atan2", "rem", "nextafter", "logistic",
    "erf", "erfc", "erf_inv", "square", "reciprocal", "clamp", "select_n",
    "add_any", "and", "or", "xor", "not", "is_finite", "copy",
    "convert_element_type", "real", "imag",
}

# Zero-derivative primitives: the jvp through these is identically zero, so
# they contribute no Jacobian support (their VALUE deps are irrelevant here).
_ZERO_DERIV = {
    "stop_gradient", "eq", "ne", "lt", "le", "gt", "ge", "sign", "floor",
    "ceil", "round", "iota", "argmax", "argmin", "rng_bit_generator",
    "random_seed", "random_bits", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "population_count",
}


def _zeros(shape, n_in):
    return np.zeros(tuple(shape) + (n_in,), dtype=bool)


def _or_all(masks, out_shape, n_in):
    """Conservative union: every output element depends on every dependency
    appearing anywhere in any operand."""
    acc = np.zeros((n_in,), dtype=bool)
    for m in masks:
        if m.size:
            acc |= m.reshape(-1, n_in).any(axis=0)
    return np.broadcast_to(acc, tuple(out_shape) + (n_in,)).copy()


def _broadcast_elementwise(masks, out_shape, n_in):
    acc = _zeros(out_shape, n_in)
    for m in masks:
        acc |= np.broadcast_to(m, acc.shape)
    return acc


def _eqn_masks(eqn, in_masks, n_in):
    """Dependency masks of an eqn's outputs from its inputs' masks."""
    name = eqn.primitive.name
    out_avals = [v.aval for v in eqn.outvars]

    if name in _ZERO_DERIV:
        return [_zeros(a.shape, n_in) for a in out_avals]

    if name in _ELEMENTWISE:
        return [_broadcast_elementwise(in_masks, a.shape, n_in)
                for a in out_avals]

    if name in ("reshape", "squeeze", "expand_dims"):
        (m,) = in_masks
        return [m.reshape(tuple(out_avals[0].shape) + (n_in,))]

    if name == "broadcast_in_dim":
        (m,) = in_masks
        out_shape = eqn.params["shape"]
        bdims = eqn.params["broadcast_dimensions"]
        full = _zeros(out_shape, n_in)
        # Place the input's axes at bdims, then broadcast
        src = m
        idx = [None] * len(out_shape)
        for ax_out in range(len(out_shape)):
            if ax_out not in bdims:
                src = np.expand_dims(src, ax_out)
        full |= np.broadcast_to(src, full.shape)
        return [full]

    if name == "transpose":
        (m,) = in_masks
        perm = tuple(eqn.params["permutation"]) + (m.ndim - 1,)
        return [np.transpose(m, perm)]

    if name == "rev":
        (m,) = in_masks
        for ax in eqn.params["dimensions"]:
            m = np.flip(m, axis=ax)
        return [m]

    if name == "slice":
        (m,) = in_masks
        sl = tuple(slice(lo, hi, st) for lo, hi, st in zip(
            eqn.params["start_indices"], eqn.params["limit_indices"],
            eqn.params["strides"] or [1] * len(eqn.params["start_indices"])))
        return [m[sl]]

    if name == "concatenate":
        dim = eqn.params["dimension"]
        return [np.concatenate(in_masks, axis=dim)]

    if name in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
                "reduce_or", "reduce_and"):
        (m,) = in_masks
        axes = tuple(eqn.params["axes"])
        return [m.any(axis=axes) if axes else m]

    if name == "dynamic_slice":
        # Start indices may be traced: every output element may read any
        # input element along every axis (sound over-approximation), and the
        # index operands themselves are zero-derivative.
        data = in_masks[0]
        deps = data.reshape(-1, n_in).any(axis=0) if data.size else \
            np.zeros((n_in,), bool)
        return [np.broadcast_to(deps, tuple(out_avals[0].shape)
                                + (n_in,)).copy()]

    if name in ("pjit", "closed_call", "core_call", "remat", "checkpoint",
                "custom_jvp_call", "custom_vjp_call",
                "custom_vjp_call_jaxpr", "custom_jvp_call_jaxpr"):
        inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") \
            or eqn.params.get("fun_jaxpr")
        if inner is not None:
            if isinstance(inner, jcore.Jaxpr):
                inner = jcore.ClosedJaxpr(inner, ())
            if hasattr(inner, "jaxpr"):
                return _interpret(inner, in_masks, n_in)

    # Conservative fallback (dot_general, gather/scatter, scan, cond, while,
    # sort, anything unrecognized): sound, loses elementwise precision only.
    return [_or_all(in_masks, a.shape, n_in) for a in out_avals]


def _interpret(closed_jaxpr, in_masks, n_in):
    jaxpr = closed_jaxpr.jaxpr
    env = {}

    def read(a):
        if isinstance(a, jcore.Literal):
            return _zeros(np.shape(a.val), n_in)
        return env[a]

    for var, const in zip(jaxpr.constvars, closed_jaxpr.consts):
        env[var] = _zeros(np.shape(const), n_in)
    for var, m in zip(jaxpr.invars, in_masks):
        env[var] = m
    for eqn in jaxpr.eqns:
        outs = _eqn_masks(eqn, [read(v) for v in eqn.invars], n_in)
        for var, m in zip(eqn.outvars, outs):
            if not isinstance(var, _DropVar):
                env[var] = m
    return [read(v) for v in jaxpr.outvars]


def jacobian_support(fn, arg_shapes, wrt: int = 0, dtype=jnp.float32):
    """Structural support of ``jacfwd(fn, argnums=wrt)``.

    ``fn(*args)`` must take flat vector arguments of the given shapes and
    return a flat vector. Returns a bool array (n_out, n_wrt): entry (i, j)
    is True iff output i structurally depends (with nonzero derivative
    somewhere) on argument ``wrt``'s element j.
    """
    specs = [jax.ShapeDtypeStruct((int(n),), dtype) for n in arg_shapes]
    closed = jax.make_jaxpr(fn)(*specs)
    n_in = int(arg_shapes[wrt])
    in_masks = []
    for a, n in enumerate(arg_shapes):
        m = _zeros((int(n),), n_in)
        if a == wrt:
            m[np.arange(n_in), np.arange(n_in)] = True
        in_masks.append(m)
    outs = _interpret(closed, in_masks, n_in)
    out = outs[0]
    return out.reshape(-1, n_in)


def ineq_column_support(ocp):
    """Per-row static column support of the OCP's inequality Jacobian
    d ineq / d z, as a list of nh frozen column tuples (the format consumed by
    ops/sqp row_meta / the Pallas kernel's sparse-D storage)."""
    supp = jacobian_support(ocp.ineq, (ocp.nvar, ocp.npar), wrt=0)
    assert supp.shape[0] == ocp.nh, (supp.shape, ocp.nh)
    return [tuple(int(j) for j in np.nonzero(row)[0]) for row in supp]
