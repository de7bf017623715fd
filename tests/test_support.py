"""Structural constraint-column support (ops/support.py).

Round-2 finding: the kernel's sparse-D column support was derived by probing
jacfwd(ineq) at 8 random points (z in [-2,2], p in [0.1,2]); any constraint
term inactive on that box (parameter-gated where/max branches) was silently
dropped from the Pallas kernel's row storage — wrong constraint handling with
no error. The support is now extracted structurally from the traced jaxpr;
these tests pin the mis-pruning case and parity with the shipped configs.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.support import (
    ineq_column_support, jacobian_support)


def _legacy_probe_support(ocp, n_probes=8, seed=0):
    """The round-2 numeric probe (removed from ops/sqp.py), kept here as the
    regression baseline: it mis-prunes gated terms."""
    rng = np.random.default_rng(seed)
    support = np.zeros((ocp.nh, ocp.nvar), dtype=bool)
    jac = jax.jit(jax.jacfwd(ocp.ineq))
    for _ in range(n_probes):
        z = jnp.asarray(rng.uniform(-2.0, 2.0, ocp.nvar))
        p = jnp.asarray(rng.uniform(0.1, 2.0, ocp.npar))
        C = np.asarray(jac(z, p))
        support |= (C != 0.0) | ~np.isfinite(C)
    return [tuple(int(j) for j in np.nonzero(row)[0]) for row in support]


def test_gated_constraint_terms_stay_in_support():
    """A where/max branch inactive on the probe box must stay in support:
    the legacy probe drops it (the bug), the structural extraction keeps it."""

    def ineq(z, p):
        return jnp.stack([
            z[0] + jnp.where(z[4] > 5.0, z[3], 0.0),  # z3 only off-box
            jnp.maximum(z[1] - p[0] - 10.0, 0.0),      # z1 only when far
            z[2] * p[1],
        ])

    ocp = types.SimpleNamespace(ineq=ineq, nvar=6, npar=3, nh=3)
    struct = ineq_column_support(ocp)
    assert struct[0] == (0, 3)
    assert struct[1] == (1,)
    assert struct[2] == (2,)

    probe = _legacy_probe_support(ocp)
    assert 3 not in probe[0], "probe no longer mis-prunes? update this test"
    assert 1 not in probe[1]


def test_zero_derivative_paths_excluded():
    """Predicates and stop_gradient carry no Jacobian support (matching what
    jax.jacfwd actually computes), while branches do."""

    def ineq(z, p):
        return jnp.stack([
            jnp.where(z[0] > 0.0, z[1], z[2]),        # pred z0 excluded
            jax.lax.stop_gradient(z[3]) + z[4],        # z3 excluded
        ])

    ocp = types.SimpleNamespace(ineq=ineq, nvar=5, npar=1, nh=2)
    struct = ineq_column_support(ocp)
    assert struct[0] == (1, 2)
    assert struct[1] == (4,)


def test_structural_support_matches_probe_on_shipped_configs():
    """On the shipped (smooth) OCPs the structural support must cover — and
    for precision, exactly equal — the numeric probe's support."""
    from oscar_mpc_planner_mr_modification_tpu.benchmarks import tmpc_bench_ocp

    ocp, _ = tmpc_bench_ocp(N=8, n_paths=2)
    struct = ineq_column_support(ocp)
    probe = _legacy_probe_support(ocp)
    assert len(struct) == ocp.nh
    for i, (a, b) in enumerate(zip(struct, probe)):
        assert set(a) >= set(b), f"row {i}: structural support misses {b}"
        assert set(a) == set(b), f"row {i}: structural support imprecise {a}"


def test_factory_configs_have_structural_support():
    """Every factory configuration assembles with structural support and the
    solver's row_meta carries non-empty column sets for its generic rows."""
    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_basic)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        SQPConfig, _make_machinery)
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings(N=6, max_obstacles=2)
    model, modules = configuration_basic(settings)
    ocp = build_ocp(model, modules, settings)
    mach = _make_machinery(ocp, SQPConfig(), jnp.float64)
    h_rows = [meta for meta in mach.row_meta if meta[0] == "h"]
    assert h_rows, "expected generic constraint rows"
    for meta in h_rows:
        assert len(meta[2]) >= 1


def test_jacobian_support_conservative_fallback():
    """Unknown/structured primitives (dot_general) fall back to a sound
    union over all elements."""

    def fn(z, p):
        M = jnp.stack([z[:2], z[2:4]])
        return (M @ M.T).reshape(-1)[:2]

    supp = jacobian_support(fn, (4, 1), wrt=0)
    # Conservative: every output depends on all four inputs
    assert np.all(supp)
