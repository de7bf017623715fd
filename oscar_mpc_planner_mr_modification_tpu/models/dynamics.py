"""Robot dynamics models as pure JAX functions.

Re-expresses the reference's CasADi dynamics models
(solver_generator/solver_model.py:49-437) as stateless dataclasses whose
``continuous(x, u)`` returns dx/dt as a jnp array. Discretization matches the
generated acados solver: explicit RK4 with 4 stages and 3 integration sub-steps over
one interval of ``integrator_step`` seconds
(solver_generator/generate_acados_solver.py:148-150).

Variable layout matches the reference convention ``z = (u, x)`` with ``nvar = nu+nx``
(solver_model.py:79-90), so module math written against :class:`ModelView` reads
identically to the CasADi module scripts.

Curvature-aware (CA-MPC) models integrate all but the last (spline-progress) state
with RK4 and then apply the discrete projected-progress update
(solver_model.py:242-271, 398-437). The reference could not use these with acados
(discrete spline update unsupported); here they are first-class since the whole
pipeline is one JAX program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.math import jnp_atan, jnp_atan2


class ModelView:
    """Name-based accessor over a traced ``z = (u, x)`` vector.

    Mirrors ``DynamicsModel.get`` (solver_model.py:136-144) so module cost/constraint
    code reads like the reference math.
    """

    __slots__ = ("_model", "_z")

    def __init__(self, model: "DynamicsModel", z):
        self._model = model
        self._z = z

    def get(self, name: str):
        m = self._model
        if name in m.states:
            return self._z[m.nu + m.states.index(name)]
        if name in m.inputs:
            return self._z[m.inputs.index(name)]
        raise KeyError(
            f"`{name}' is neither a state nor an input of model {m.name}"
        )

    def has(self, name: str) -> bool:
        return name in self._model.states or name in self._model.inputs


@dataclass(frozen=True)
class DynamicsModel:
    """Base dynamics model; subclasses define ``continuous``.

    ``lower_bound``/``upper_bound`` are over ``z = (u, x)``, length nvar.
    ``nx_integrate`` < nx means the trailing states are updated by
    ``discrete_update`` instead of RK4 (CA-MPC spline progress).
    """

    name: str = "base"
    nu: int = 0
    nx: int = 0
    states: Tuple[str, ...] = ()
    inputs: Tuple[str, ...] = ()
    lower_bound: Tuple[float, ...] = ()
    upper_bound: Tuple[float, ...] = ()
    nx_integrate: Optional[int] = None
    width: float = 0.65  # vehicle width, used by road constraints

    # -- layout ------------------------------------------------------------
    @property
    def nvar(self) -> int:
        return self.nu + self.nx

    def view(self, z) -> ModelView:
        return ModelView(self, z)

    def state_index(self, name: str) -> int:
        return self.states.index(name)

    def input_index(self, name: str) -> int:
        return self.inputs.index(name)

    def var_index(self, name: str) -> int:
        """Index into z=(u,x)."""
        if name in self.inputs:
            return self.inputs.index(name)
        return self.nu + self.states.index(name)

    def bounds_arrays(self):
        return (np.asarray(self.lower_bound, dtype=float),
                np.asarray(self.upper_bound, dtype=float))

    def get_bounds(self, name: str):
        i = self.var_index(name)
        return self.lower_bound[i], self.upper_bound[i], (
            self.upper_bound[i] - self.lower_bound[i])

    # -- dynamics ----------------------------------------------------------
    def continuous(self, x, u):
        raise NotImplementedError

    def discrete_update(self, x, u, x_integrated, ctx):
        """Post-integration discrete update hook (CA-MPC). Default: passthrough."""
        return x_integrated

    def discrete_dynamics(self, x, u, dt: float, ctx=None, num_steps: int = 3):
        """x_{k+1} = F(x_k, u_k): RK4 x ``num_steps`` sub-steps of dt/num_steps,
        matching acados ERK(4 stages, 3 steps) (generate_acados_solver.py:148-150)."""
        n_int = self.nx if self.nx_integrate is None else self.nx_integrate
        xi = x[:n_int]

        def f(xi_part):
            # Trailing non-integrated states are held at their current values for
            # the vector-field evaluation (they do not enter the integrated block).
            x_full = jnp.concatenate([xi_part, x[n_int:]]) if n_int < self.nx else xi_part
            return jnp.stack(self.continuous(x_full, u))[:n_int]

        h = dt / num_steps
        for _ in range(num_steps):
            k1 = f(xi)
            k2 = f(xi + 0.5 * h * k1)
            k3 = f(xi + 0.5 * h * k2)
            k4 = f(xi + h * k3)
            xi = xi + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        return self.discrete_update(x, u, xi, ctx)


# ---------------------------------------------------------------------------
# Concrete models (bounds and equations mirror solver_model.py:170-437)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class SecondOrderUnicycleModel(DynamicsModel):
    name: str = "second_order_unicycle"
    nu: int = 2
    nx: int = 4
    states: Tuple[str, ...] = ("x", "y", "psi", "v")
    inputs: Tuple[str, ...] = ("a", "w")
    lower_bound: Tuple[float, ...] = (-2.0, -2.0, -200.0, -200.0, -np.pi * 4, -2.0)
    upper_bound: Tuple[float, ...] = (2.0, 2.0, 200.0, 200.0, np.pi * 4, 3.0)

    def continuous(self, x, u):
        a, w = u[0], u[1]
        psi, v = x[2], x[3]
        return (v * jnp.cos(psi), v * jnp.sin(psi), w, a)


@dataclass(frozen=True)
class ContouringSecondOrderUnicycleModel(DynamicsModel):
    """Unicycle + spline progress state s with ds/dt = v (solver_model.py:193-214)."""

    name: str = "contouring_second_order_unicycle"
    nu: int = 2
    nx: int = 5
    states: Tuple[str, ...] = ("x", "y", "psi", "v", "spline")
    inputs: Tuple[str, ...] = ("a", "w")
    lower_bound: Tuple[float, ...] = (-2.0, -0.8, -2000.0, -2000.0, -np.pi * 4, -0.01, -1.0)
    upper_bound: Tuple[float, ...] = (2.0, 0.8, 2000.0, 2000.0, np.pi * 4, 3.0, 10000.0)

    def continuous(self, x, u):
        a, w = u[0], u[1]
        psi, v = x[2], x[3]
        return (v * jnp.cos(psi), v * jnp.sin(psi), w, a, v)


def _ca_spline_update(x, x_integrated, ctx):
    """Curvature-aware discrete progress update (solver_model.py:242-271).

    ctx must provide ``params`` (ParameterView with spline parameters) and
    ``num_segments``.
    """
    from ..ops.spline import Spline2D

    pos_x, pos_y = x[0], x[1]
    s = x[-1]

    path = Spline2D(ctx["params"], ctx["num_segments"], s)
    path_x, path_y = path.at(s)
    tx, ty = path.deriv_normalized(s)

    contour_error = ty * (pos_x - path_x) - tx * (pos_y - path_y)

    dpx = x_integrated[0] - pos_x
    dpy = x_integrated[1] - pos_y
    vt_t = dpx * tx + dpy * ty
    vn_t = dpx * ty - dpy * tx

    # INTENTIONAL DEVIATION from the reference: solver_model.py:266-267 uses
    # fmax(1/curvature, 1e5), i.e. it FLOORS R at 1e5 (so R >= 1e5 always,
    # which degenerates the update for every curvature > 1e-5; the reference
    # model is marked NOT TESTED). We instead CAP R at 1e5 by flooring the
    # curvature — physically sensible (R tracks the path's true radius) and
    # NaN-free on exactly straight splines; outputs differ from the reference
    # for curvature > 1e-5 by design.
    R = 1.0 / jnp.maximum(path.get_curvature(s), 1e-5)

    theta = jnp_atan2(vt_t, R - contour_error - vn_t)
    # expand_dims (not reshape-to-(1,)) keeps this polymorphic over a trailing
    # batch axis: x may be (nx,) or (nx, B) (lane-layout linearizer).
    return jnp.concatenate([x_integrated, jnp.expand_dims(s + R * theta, 0)])


@dataclass(frozen=True)
class ContouringSecondOrderUnicycleModelCurvatureAware(DynamicsModel):
    """CA-MPC unicycle: spline state updated by projected progress
    (solver_model.py:217-271)."""

    name: str = "contouring_second_order_unicycle_curvature_aware"
    nu: int = 2
    nx: int = 5
    states: Tuple[str, ...] = ("x", "y", "psi", "v", "spline")
    inputs: Tuple[str, ...] = ("a", "w")
    lower_bound: Tuple[float, ...] = (-4.0, -0.8, -2000.0, -2000.0, -np.pi * 4, -0.01, -1.0)
    upper_bound: Tuple[float, ...] = (4.0, 0.8, 2000.0, 2000.0, np.pi * 4, 3.0, 10000.0)
    nx_integrate: Optional[int] = 4

    def continuous(self, x, u):
        a, w = u[0], u[1]
        psi, v = x[2], x[3]
        return (v * jnp.cos(psi), v * jnp.sin(psi), w, a)

    def discrete_update(self, x, u, x_integrated, ctx):
        return _ca_spline_update(x, x_integrated, ctx)


@dataclass(frozen=True)
class ContouringSecondOrderUnicycleModelWithSlack(DynamicsModel):
    """Adds a slack state for SH-MPC soft constraints (solver_model.py:274-298)."""

    name: str = "contouring_second_order_unicycle_with_slack"
    nu: int = 2
    nx: int = 6
    states: Tuple[str, ...] = ("x", "y", "psi", "v", "spline", "slack")
    inputs: Tuple[str, ...] = ("a", "w")
    lower_bound: Tuple[float, ...] = (-2.0, -0.8, -2000.0, -2000.0, -np.pi * 4, -0.01,
                                      -1.0, 0.0)
    upper_bound: Tuple[float, ...] = (2.0, 0.8, 2000.0, 2000.0, np.pi * 4, 3.0,
                                      10000.0, 5000.0)

    def continuous(self, x, u):
        a, w = u[0], u[1]
        psi, v = x[2], x[3]
        return (v * jnp.cos(psi), v * jnp.sin(psi), w, a, v, jnp.zeros_like(v))


_WHEEL_BASE = 2.79  # Prius wheel base [m] (solver_model.py:329)


@dataclass(frozen=True)
class BicycleModel2ndOrder(DynamicsModel):
    """Kinematic bicycle with dynamic steering (solver_model.py:302-351)."""

    name: str = "bicycle_2nd_order"
    nu: int = 3
    nx: int = 6
    states: Tuple[str, ...] = ("x", "y", "psi", "v", "delta", "spline")
    inputs: Tuple[str, ...] = ("a", "w", "slack")
    lower_bound: Tuple[float, ...] = (-3.0, -1.5, 0.0, -1.0e6, -1.0e6, -np.pi * 4,
                                      -0.01, -0.55, -1.0)
    upper_bound: Tuple[float, ...] = (3.0, 1.5, 1.0e2, 1.0e6, 1.0e6, np.pi * 4, 5.0,
                                      0.55, 5000.0)
    width: float = 2.25

    def continuous(self, x, u):
        a, w = u[0], u[1]
        psi, v, delta = x[2], x[3], x[4]
        lr = _WHEEL_BASE / 2.0
        lf = _WHEEL_BASE / 2.0
        ratio = lr / (lr + lf)
        beta = jnp_atan(ratio * jnp.tan(delta))
        return (v * jnp.cos(psi + beta), v * jnp.sin(psi + beta),
                (v / lr) * jnp.sin(beta), a, w, v)


@dataclass(frozen=True)
class BicycleModel2ndOrderCurvatureAware(DynamicsModel):
    """CA-MPC bicycle (solver_model.py:355-437)."""

    name: str = "bicycle_2nd_order_curvature_aware"
    nu: int = 3
    nx: int = 6
    states: Tuple[str, ...] = ("x", "y", "psi", "v", "delta", "spline")
    inputs: Tuple[str, ...] = ("a", "w", "slack")
    lower_bound: Tuple[float, ...] = (-3.0, -1.5, 0.0, -1.0e6, -1.0e6, -np.pi * 4,
                                      -0.01, -0.55, -1.0)
    upper_bound: Tuple[float, ...] = (3.0, 1.5, 1.0e2, 1.0e6, 1.0e6, np.pi * 4, 8.0,
                                      0.55, 5000.0)
    nx_integrate: Optional[int] = 5
    width: float = 2.25
    lr: float = _WHEEL_BASE / 2.0

    def continuous(self, x, u):
        a, w = u[0], u[1]
        psi, v, delta = x[2], x[3], x[4]
        ratio = self.lr / (self.lr + self.lr)
        beta = jnp_atan(ratio * jnp.tan(delta))
        return (v * jnp.cos(psi + beta), v * jnp.sin(psi + beta),
                (v / self.lr) * jnp.sin(beta), a, w)

    def discrete_update(self, x, u, x_integrated, ctx):
        return _ca_spline_update(x, x_integrated, ctx)
