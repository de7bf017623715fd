"""Module-library unit tests: parameter counts, bound shapes, symbolic values.

Mirrors the reference's solver_generator/test/test_control_modules.py:27-136 -
exact parameter counts, constraint cardinality, and evaluation of the symbolic
cost/constraint expressions at known points.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.utils import default_settings, ParameterRegistry
from oscar_mpc_planner_mr_modification_tpu.models import (
    ContouringSecondOrderUnicycleModel, SecondOrderUnicycleModel)
from oscar_mpc_planner_mr_modification_tpu.modules import (
    ModuleManager, MPCBaseModule, ContouringModule, GoalModule, ConsistencyModule,
    EllipsoidConstraintModule, GaussianConstraintModule, LinearizedConstraintModule,
    ContouringConstraintModule, GuidanceConstraintModule, ScenarioConstraintModule,
    PathReferenceVelocityModule)


def make_settings(**kw):
    return default_settings(**kw)


def build(modules_fn, settings):
    mm = ModuleManager()
    modules_fn(mm, settings)
    reg = ParameterRegistry()
    mm.define_parameters(reg)
    return mm, reg


# ---------------------------------------------------------------------------
# Parameter counts (reference test_control_modules.py:27-67)
# ---------------------------------------------------------------------------
def test_contouring_parameter_count():
    settings = make_settings()
    mm, reg = build(lambda m, s: m.add_module(ContouringModule(s)), settings)
    # contour, lag, velocity, reference_velocity, terminal_angle,
    # terminal_contouring + 5 segments x (8 coeffs + 1 start)
    assert reg.npar == 6 + 5 * 9


def test_basic_configuration_parameter_count():
    settings = make_settings()

    def cfg(mm, s):
        base = mm.add_module(MPCBaseModule(s))
        base.weigh_variable("a", "acceleration")
        base.weigh_variable("w", "angular_velocity")
        base.weigh_variable("v", ["velocity", "reference_velocity"],
                            cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)
        mm.add_module(ContouringModule(s))
        mm.add_module(EllipsoidConstraintModule(s))

    mm, reg = build(cfg, settings)
    # 4 weights + (4 new contouring weights + 45 spline) + (1 radius + 1 offset
    # + 4 obstacles x 7)
    assert reg.npar == 4 + 49 + 30
    assert mm.constraint_number() == 4  # max_obstacles x n_discs


def test_tmpc_configuration_counts():
    settings = make_settings()

    def cfg(mm, s):
        mm.add_module(ConsistencyModule(s))
        mm.add_module(GuidanceConstraintModule(s))

    mm, reg = build(cfg, settings)
    # Guidance: 4 topology halfspaces x 3 params + ellipsoid submodule params
    assert mm.constraint_number() == 4 + 4  # linearized + ellipsoid
    assert reg.has_parameter("consistency_weight")
    assert reg.has_parameter("lin_constraint_0_a1")
    assert reg.has_parameter("ellipsoid_obst_3_chi")
    lb = mm.constraint_lower_bounds()
    ub = mm.constraint_upper_bounds()
    assert len(lb) == len(ub) == 8
    assert lb[:4] == [-np.inf] * 4 and ub[:4] == [0.0] * 4  # halfspaces
    assert lb[4:] == [1.0] * 4 and ub[4:] == [np.inf] * 4  # ellipsoids


def test_scenario_configuration_counts():
    settings = make_settings()
    mm, reg = build(lambda m, s: m.add_module(ScenarioConstraintModule(s)), settings)
    assert mm.constraint_number() == 24
    assert reg.npar == 1 + 24 * 3  # disc offset + 24 halfspaces x 3


# ---------------------------------------------------------------------------
# Symbolic evaluation at known points
# ---------------------------------------------------------------------------
def _eval_objective(mm, reg, model, settings, z, pvals, stage_idx=1):
    p = np.zeros(reg.npar)
    for name, val in pvals.items():
        p[reg.index(name)] = val
    return float(mm.objective(model, jnp.asarray(z), reg.view(jnp.asarray(p)),
                              settings, stage_idx))


def test_goal_cost_value():
    settings = make_settings()
    model = SecondOrderUnicycleModel()
    mm, reg = build(lambda m, s: m.add_module(GoalModule(s)), settings)
    z = np.array([0.0, 0.0, 1.0, 2.0, 0.0, 0.0])  # u=(0,0), x=(1,2,0,0)
    cost = _eval_objective(mm, reg, model, settings, z,
                           {"goal_weight": 2.0, "goal_x": 4.0, "goal_y": 6.0})
    expected = 2.0 * ((1 - 4) ** 2 + (2 - 6) ** 2) / (16 + 36 + 0.01)
    assert abs(cost - expected) < 1e-12


def test_consistency_cost_value():
    settings = make_settings()
    model = SecondOrderUnicycleModel()
    mm, reg = build(lambda m, s: m.add_module(ConsistencyModule(s)), settings)
    z = np.array([0.0, 0.0, 1.0, 2.0, 0.0, 0.0])
    cost = _eval_objective(mm, reg, model, settings, z,
                           {"consistency_weight": 0.05, "prev_traj_x": 0.5,
                            "prev_traj_y": 2.5})
    assert abs(cost - 0.05 * (0.25 + 0.25)) < 1e-12


def test_mpc_base_custom_cost():
    settings = make_settings()
    model = SecondOrderUnicycleModel()

    def cfg(mm, s):
        base = mm.add_module(MPCBaseModule(s))
        base.weigh_variable("a", "acceleration")
        base.weigh_variable("v", ["velocity", "reference_velocity"],
                            cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)

    mm, reg = build(cfg, settings)
    z = np.array([0.5, 0.0, 0.0, 0.0, 0.0, 1.0])  # a=0.5, v=1.0
    cost = _eval_objective(mm, reg, model, settings, z,
                           {"acceleration": 0.34, "velocity": 0.55,
                            "reference_velocity": 2.0})
    assert abs(cost - (0.34 * 0.25 + 0.55 * 1.0)) < 1e-12


def test_ellipsoid_constraint_value():
    settings = make_settings(max_obstacles=1)
    model = SecondOrderUnicycleModel()
    mm, reg = build(lambda m, s: m.add_module(EllipsoidConstraintModule(s)), settings)
    z = np.zeros(6)  # robot at origin, psi=0
    p = np.zeros(reg.npar)
    p[reg.index("ego_disc_radius")] = 0.5
    p[reg.index("ego_disc_0_offset")] = 0.0
    p[reg.index("ellipsoid_obst_0_x")] = 3.0
    p[reg.index("ellipsoid_obst_0_y")] = 0.0
    p[reg.index("ellipsoid_obst_0_psi")] = 0.0
    p[reg.index("ellipsoid_obst_0_major")] = 1.0
    p[reg.index("ellipsoid_obst_0_minor")] = 0.5
    p[reg.index("ellipsoid_obst_0_chi")] = 4.0  # sqrt(chi) = 2
    p[reg.index("ellipsoid_obst_0_r")] = 0.5
    cons = mm.constraints(model, jnp.asarray(z), reg.view(jnp.asarray(p)), settings, 1)
    # a-axis: (major*2 + r_disc + r_obst) = 2+0.5+0.5 = 3 -> (3/3)^2 = 1 on boundary
    assert abs(float(cons[0]) - 1.0) < 1e-10


def test_ellipsoid_rotation_matches_reference_convention():
    """The ellipse matrix must be R^T diag R with R(psi)=[[c,-s],[s,c]]
    (ellipsoid_constraints.py:96-106 + util/math.py:5). Under that product the
    value along direction u is |x|^2 (R u)^T diag (R u), so the major axis of
    the level set points along R^T e1 = (cos psi, -sin psi): for psi=+45deg the
    boundary sits at distance `major` along (1,-1) and `minor` along (1,1)."""
    settings = make_settings(max_obstacles=1)
    model = SecondOrderUnicycleModel()
    mm, reg = build(lambda m, s: m.add_module(EllipsoidConstraintModule(s)), settings)
    p = np.zeros(reg.npar)
    p[reg.index("ego_disc_radius")] = 0.0
    p[reg.index("ellipsoid_obst_0_x")] = 0.0
    p[reg.index("ellipsoid_obst_0_y")] = 0.0
    p[reg.index("ellipsoid_obst_0_psi")] = np.pi / 4
    p[reg.index("ellipsoid_obst_0_major")] = 2.0  # semi-axis a
    p[reg.index("ellipsoid_obst_0_minor")] = 1.0  # semi-axis b
    p[reg.index("ellipsoid_obst_0_chi")] = 1.0
    p[reg.index("ellipsoid_obst_0_r")] = 0.0

    def value_at(px, py):
        z = np.zeros(6)
        z[model.nu + 0] = px
        z[model.nu + 1] = py
        return float(mm.constraints(model, jnp.asarray(z),
                                    reg.view(jnp.asarray(p)), settings, 1)[0])

    d = 2.0 / np.sqrt(2.0)
    # Major axis R^T e1 = (1,-1)/sqrt2, boundary at distance 2.
    assert abs(value_at(d, -d) - 1.0) < 1e-8
    # Minor axis R^T e2 = (1,1)/sqrt2, boundary at distance 1.
    e = 1.0 / np.sqrt(2.0)
    assert abs(value_at(e, e) - 1.0) < 1e-8


def test_gaussian_constraint_matches_scipy_erfinv():
    from scipy.special import erfinv as scipy_erfinv

    settings = make_settings(max_obstacles=1)
    model = SecondOrderUnicycleModel()
    mm, reg = build(lambda m, s: m.add_module(GaussianConstraintModule(s)), settings)
    z = np.zeros(6)
    risk = 0.05
    p = np.zeros(reg.npar)
    p[reg.index("ego_disc_radius")] = 0.3
    p[reg.index("gaussian_obst_0_x")] = 4.0
    p[reg.index("gaussian_obst_0_y")] = 0.0
    p[reg.index("gaussian_obst_0_major")] = 0.2
    p[reg.index("gaussian_obst_0_minor")] = 0.1
    p[reg.index("gaussian_obst_0_risk")] = risk
    p[reg.index("gaussian_obst_0_r")] = 0.3
    cons = mm.constraints(model, jnp.asarray(z), reg.view(jnp.asarray(p)), settings, 1)
    # a = (-1, 0); a^T(p-mu) = 4; b = 0.6; penalty = erfinv(1-2r)*sqrt(2*sigma_x^2)
    expected = 4.0 - 0.6 - float(scipy_erfinv(1 - 2 * risk)) * np.sqrt(2 * 0.04)
    assert abs(float(cons[0]) - expected) < 1e-7  # Newton-polished erfinv accuracy


def test_linearized_constraint_value():
    settings = make_settings(max_obstacles=1)
    model = SecondOrderUnicycleModel()
    mod = LinearizedConstraintModule(settings)
    mm = ModuleManager()
    mm.add_module(mod)
    reg = ParameterRegistry()
    mm.define_parameters(reg)
    z = np.array([0.0, 0.0, 2.0, 1.0, 0.0, 0.0])
    p = np.zeros(reg.npar)
    p[reg.index("ego_disc_0_offset")] = 0.0
    p[reg.index("disc_0_lin_constraint_0_a1")] = 0.6
    p[reg.index("disc_0_lin_constraint_0_a2")] = 0.8
    p[reg.index("disc_0_lin_constraint_0_b")] = 1.0
    cons = mm.constraints(model, jnp.asarray(z), reg.view(jnp.asarray(p)), settings, 1)
    assert abs(float(cons[0]) - (0.6 * 2.0 + 0.8 * 1.0 - 1.0)) < 1e-12


def test_contouring_cost_on_straight_path():
    settings = make_settings()
    model = ContouringSecondOrderUnicycleModel()
    mm, reg = build(lambda m, s: m.add_module(ContouringModule(s)), settings)
    p = np.zeros(reg.npar)
    p[reg.index("contour")] = 0.1
    p[reg.index("lag")] = 0.2
    for i in range(5):  # straight line x(s) = s, y = 0
        p[reg.index(f"spline_x{i}_c")] = 1.0
        p[reg.index(f"spline{i}_start")] = 5.0 * i
    # robot at (2.0, 0.7), s = 1.5 -> contour error = -0.7... sign: dy*(px-x)-dx*(py-y)
    z = np.array([0.0, 0.0, 2.0, 0.7, 0.0, 0.0, 1.5])
    cost = float(mm.objective(model, jnp.asarray(z), reg.view(jnp.asarray(p)),
                              settings, 1))
    # contour err = 0*(2-1.5) - 1*(0.7-0) = -0.7; lag err = (2-1.5) = 0.5
    expected = 0.1 * 0.49 + 0.2 * 0.25
    assert abs(cost - expected) < 1e-9


def test_all_modules_construct_together():
    """Smoke: the full module set assembles one registry without collisions
    (reference test_control_modules.py:106-136)."""
    settings = make_settings()

    def cfg(mm, s):
        base = mm.add_module(MPCBaseModule(s))
        base.weigh_variable("a", "acceleration")
        mm.add_module(ContouringModule(s))
        mm.add_module(PathReferenceVelocityModule(s))
        mm.add_module(GoalModule(s))
        mm.add_module(ConsistencyModule(s))
        mm.add_module(EllipsoidConstraintModule(s))
        mm.add_module(ContouringConstraintModule(s))

    mm, reg = build(cfg, settings)
    assert reg.npar > 100
    assert mm.constraint_number() == 4 + 2
    model = ContouringSecondOrderUnicycleModel()
    z = np.zeros(model.nvar)
    p = np.random.default_rng(0).uniform(0.2, 1.0, reg.npar)
    cost = mm.objective(model, jnp.asarray(z), reg.view(jnp.asarray(p)), settings, 1)
    cons = mm.constraints(model, jnp.asarray(z), reg.view(jnp.asarray(p)), settings, 1)
    assert np.isfinite(float(cost))
    assert len(cons) == 6


def test_cody_erf_is_double_precision_exact():
    """jnp_erf (Cody/CALERF rational form - the Pallas-safe erf used inside
    the CC-MPC erfinv-Newton polish) matches scipy.special.erf to ~1 ulp
    across all three approximation regions and the saturated tail."""
    from scipy.special import erf as scipy_erf

    from oscar_mpc_planner_mr_modification_tpu.utils.math import jnp_erf

    x = np.concatenate([
        np.linspace(-8.0, 8.0, 20001),
        [0.0, 0.46875, -0.46875, 4.0, -4.0, 26.4, 27.0, -30.0, 1e-12]])
    ours = np.asarray(jnp_erf(jnp.asarray(x)))
    np.testing.assert_allclose(ours, scipy_erf(x), atol=5e-16)
