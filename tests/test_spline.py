"""Spline tests: sigmoid-splice evaluation and host-side fitting."""

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.spline import (
    eval_spline, eval_spline_deriv, eval_spline_deriv2)
from oscar_mpc_planner_mr_modification_tpu.ops.spline_fit import (
    CubicSpline2D, CubicSpline1D, natural_cubic_coeffs)


def numpy_sigmoid_splice(a, b, c, d, starts, s):
    """Literal transcription of the reference blend (spline.py:28-44)."""
    def seg(i, s):
        ds = s - starts[i]
        return a[i] * ds**3 + b[i] * ds**2 + c[i] * ds + d[i]

    lambdas = [1.0 / (1.0 + np.exp((s - starts[i] + 0.02) / 0.1))
               for i in range(1, len(starts))]
    value = seg(len(starts) - 1, s)
    for k in range(len(starts) - 1, 0, -1):
        value = lambdas[k - 1] * seg(k - 1, s) + (1.0 - lambdas[k - 1]) * value
    return value


def test_sigmoid_splice_matches_reference_formula():
    rng = np.random.default_rng(0)
    M = 5
    a, b, c, d = rng.normal(size=(4, M)) * 0.1
    starts = np.array([0.0, 2.0, 4.5, 7.0, 9.0])
    for s in [0.5, 1.99, 2.01, 5.0, 8.9, 9.5]:
        ours = float(eval_spline(*map(jnp.asarray, (a, b, c, d, starts)), s))
        ref = numpy_sigmoid_splice(a, b, c, d, starts, s)
        assert abs(ours - ref) < 1e-12, s


def test_spline_derivative_consistency():
    rng = np.random.default_rng(1)
    M = 4
    a, b, c, d = rng.normal(size=(4, M)) * 0.1
    starts = np.array([0.0, 3.0, 6.0, 9.0])
    aj, bj, cj, dj, sj = map(jnp.asarray, (a, b, c, d, starts))
    for s in [1.5, 4.5, 7.5]:  # mid-segment: blend sigmoids are saturated there
        eps = 1e-6
        fd = (float(eval_spline(aj, bj, cj, dj, sj, s + eps))
              - float(eval_spline(aj, bj, cj, dj, sj, s - eps))) / (2 * eps)
        an = float(eval_spline_deriv(aj, bj, cj, sj, s))
        # The splice derivative ignores d(lambda)/ds (as in the reference, which
        # also differentiates segments only); the residual sigmoid tail
        # (exp(-15) * segment gap / 0.1 ~ 1e-5) bounds the agreement.
        assert abs(fd - an) < 1e-4


def test_natural_cubic_interpolates():
    t = np.array([0.0, 1.0, 2.5, 4.0, 6.0])
    y = np.array([0.0, 1.0, -0.5, 2.0, 1.0])
    a, b, c, d = natural_cubic_coeffs(t, y)
    for i in range(len(t) - 1):
        # value at segment start
        assert abs(d[i] - y[i]) < 1e-12
        # value at segment end
        h = t[i + 1] - t[i]
        val = a[i] * h**3 + b[i] * h**2 + c[i] * h + d[i]
        assert abs(val - y[i + 1]) < 1e-10


def test_cubic_spline_2d_closest_point():
    theta = np.linspace(0, np.pi / 2, 30)
    x = 5.0 * np.cos(theta)[::-1]
    y = 5.0 * np.sin(theta)[::-1]
    sp = CubicSpline2D(x, y)
    # Closest point to a point outside the arc
    s = sp.closest_s(np.array([4.3, 4.3]))
    pt = sp.at(s)
    assert np.linalg.norm(pt / np.linalg.norm(pt) - np.array([1, 1]) / np.sqrt(2)) < 0.02


def test_export_segments_clamps_at_end():
    x = np.linspace(0, 10, 11)
    y = np.zeros(11)
    sp = CubicSpline2D(x, y)
    seg = sp.export_segments(8, 5)
    assert seg["a_x"].shape == (5,)
    assert seg["start"][-1] == sp.x.starts[-1]  # clamped repeat of last segment


def test_cubic_spline_1d_roundtrip():
    s = np.linspace(0, 10, 15)
    v = 1.5 + np.sin(s * 0.5)
    sp = CubicSpline1D(s, v)
    mid = 0.5 * (s[:-1] + s[1:])
    vals = sp.spline.eval(mid)
    assert np.max(np.abs(vals - (1.5 + np.sin(mid * 0.5)))) < 0.01
