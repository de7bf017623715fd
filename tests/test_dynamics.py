"""Dynamics-model tests: RK4 discretization accuracy and bound layout."""

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.models import (
    SecondOrderUnicycleModel, ContouringSecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModelWithSlack, BicycleModel2ndOrder)


def test_unicycle_rk4_vs_scipy():
    from scipy.integrate import solve_ivp

    model = SecondOrderUnicycleModel()
    x0 = np.array([0.5, -0.2, 0.3, 1.2])
    u = np.array([0.4, -0.3])

    def f(t, x):
        return [x[3] * np.cos(x[2]), x[3] * np.sin(x[2]), u[1], u[0]]

    sol = solve_ivp(f, (0, 0.2), x0, rtol=1e-12, atol=1e-12)
    ours = np.asarray(model.discrete_dynamics(jnp.asarray(x0), jnp.asarray(u), 0.2))
    assert np.max(np.abs(ours - sol.y[:, -1])) < 1e-8  # RK4 with 3 substeps


def test_contouring_unicycle_spline_state():
    model = ContouringSecondOrderUnicycleModel()
    x0 = np.array([0.0, 0.0, 0.0, 2.0, 1.0])
    u = np.zeros(2)
    xn = np.asarray(model.discrete_dynamics(jnp.asarray(x0), jnp.asarray(u), 0.2))
    assert abs(xn[0] - 0.4) < 1e-12  # x advances v*dt
    assert abs(xn[4] - 1.4) < 1e-12  # spline progress advances v*dt


def test_slack_state_constant():
    model = ContouringSecondOrderUnicycleModelWithSlack()
    x0 = np.array([0.0, 0.0, 0.0, 1.0, 0.0, 3.0])
    xn = np.asarray(model.discrete_dynamics(jnp.asarray(x0), jnp.zeros(2), 0.2))
    assert abs(xn[5] - 3.0) < 1e-12


def test_bicycle_turns():
    model = BicycleModel2ndOrder()
    x0 = np.array([0.0, 0.0, 0.0, 5.0, 0.2, 0.0])
    xn = np.asarray(model.discrete_dynamics(jnp.asarray(x0), jnp.zeros(3), 0.2))
    assert xn[2] > 0.01  # yaw increases with positive steering
    assert xn[5] > 0.9  # spline state integrates velocity


def test_bounds_layout():
    model = ContouringSecondOrderUnicycleModel()
    lb, ub = model.bounds_arrays()
    assert lb.shape == (7,)
    assert model.get_bounds("a") == (-2.0, 2.0, 4.0)
    assert model.get_bounds("v")[0] == -0.01
    assert model.var_index("x") == 2
    assert model.var_index("w") == 1


def test_model_view_access():
    model = SecondOrderUnicycleModel()
    z = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    view = model.view(z)
    assert float(view.get("a")) == 1.0
    assert float(view.get("w")) == 2.0
    assert float(view.get("x")) == 3.0
    assert float(view.get("v")) == 6.0
