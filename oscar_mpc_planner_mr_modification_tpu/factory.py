"""Planner configurations: the analog of the per-system solver-definition scripts.

Mirrors mpc_planner_jackalsimulator/scripts/generate_jackalsimulator_solver.py:37-155:
each ``configuration_*`` assembles a (model, modules) pair; ``build_planner`` then
"generates the solver" (builds + jit-compiles the OCP) and wires the runtime
(Solver, Planner, T-MPC/scenario optimizers).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from .models import (ContouringSecondOrderUnicycleModel,
                     ContouringSecondOrderUnicycleModelWithSlack,
                     SecondOrderUnicycleModel)
from .modules import (ConsistencyModule, ContouringModule,
                      EllipsoidConstraintModule, GoalModule,
                      GuidanceConstraintModule, MPCBaseModule, ModuleManager,
                      PathReferenceVelocityModule, ScenarioConstraintModule)
from .ops.sqp import SQPConfig
from .planner import Planner
from .solver import Solver, build_ocp


def configuration_no_obstacles(settings):
    """scripts/generate_jackalsimulator_solver.py:37-59."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModel()

    base_module = modules.add_module(MPCBaseModule(settings))
    base_module.weigh_variable("a", "acceleration")
    base_module.weigh_variable("w", "angular_velocity")
    if not settings["contouring"]["dynamic_velocity_reference"]:
        base_module.weigh_variable(
            "v", ["velocity", "reference_velocity"],
            cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)

    modules.add_module(ContouringModule(settings))
    if settings["contouring"]["dynamic_velocity_reference"]:
        modules.add_module(PathReferenceVelocityModule(settings))
    return model, modules


def configuration_basic(settings):
    model, modules = configuration_no_obstacles(settings)
    modules.add_module(EllipsoidConstraintModule(settings))
    return model, modules


def configuration_tmpc(settings, constraint_submodule=None):
    model, modules = configuration_no_obstacles(settings)
    modules.add_module(GuidanceConstraintModule(
        settings, constraint_submodule=constraint_submodule))
    return model, modules


def configuration_tmpc_consistency_cost(settings, constraint_submodule=None):
    """The fork's active configuration (solver script :107-116,148)."""
    model, modules = configuration_no_obstacles(settings)
    if settings["JULES"]["consistency_enabled"]:
        modules.add_module(ConsistencyModule(settings))
    modules.add_module(GuidanceConstraintModule(
        settings, constraint_submodule=constraint_submodule))
    return model, modules


def configuration_lmpcc(settings):
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModel()
    base_module = modules.add_module(MPCBaseModule(settings))
    base_module.weigh_variable("a", "acceleration")
    base_module.weigh_variable("w", "angular_velocity")
    modules.add_module(GoalModule(settings))
    modules.add_module(PathReferenceVelocityModule(settings))
    modules.add_module(EllipsoidConstraintModule(settings))
    return model, modules


def configuration_safe_horizon(settings):
    """SH-MPC (solver script :70-92)."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModelWithSlack()
    base_module = modules.add_module(MPCBaseModule(settings))
    base_module.weigh_variable("a", "acceleration")
    base_module.weigh_variable("w", "angular_velocity")
    base_module.weigh_variable("slack", "slack")
    if not settings["contouring"]["dynamic_velocity_reference"]:
        base_module.weigh_variable(
            "v", ["velocity", "reference_velocity"],
            cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)
    modules.add_module(ContouringModule(settings))
    if settings["contouring"]["dynamic_velocity_reference"]:
        modules.add_module(PathReferenceVelocityModule(settings))
    modules.add_module(ScenarioConstraintModule(settings))
    return model, modules


def configuration_goal_tmpc(settings, constraint_submodule=None):
    """Goal-tracking T-MPC (no reference path): used for open-space scenarios."""
    modules = ModuleManager()
    model = SecondOrderUnicycleModel()
    base_module = modules.add_module(MPCBaseModule(settings))
    base_module.weigh_variable("a", "acceleration")
    base_module.weigh_variable("w", "angular_velocity")
    modules.add_module(GoalModule(settings))
    if settings["JULES"]["consistency_enabled"]:
        modules.add_module(ConsistencyModule(settings))
    modules.add_module(GuidanceConstraintModule(
        settings, constraint_submodule=constraint_submodule))
    return model, modules


def build_planner(model, modules, settings, dtype=jnp.float64,
                  sqp_config: Optional[SQPConfig] = None, clock=None) -> Planner:
    """Assemble OCP + Solver + Planner and wire custom optimizers (the analog of
    generate_solver + initializeModules)."""
    import time

    from .parallel.tmpc import TMPCOptimizer

    ocp = build_ocp(model, modules, settings)
    solver = Solver(ocp, settings, dtype=dtype, sqp_config=sqp_config)
    planner = Planner(solver, modules, settings)
    for module in modules:
        if isinstance(module, GuidanceConstraintModule):
            optimizer = TMPCOptimizer(solver, settings,
                                      clock=clock or time.monotonic)
            module.attach_optimizer(optimizer)
        if isinstance(module, ScenarioConstraintModule):
            from .parallel.scenario import ScenarioOptimizer

            module.attach_optimizer(ScenarioOptimizer(solver, settings))
    return planner


def prewarm_planner(planner: Planner, model, settings,
                    start_pose=(0.0, 0.0, 0.0), goal=(5.0, 0.0)) -> None:
    """Force the solver's JIT compile on a benign synthetic scene, then reset.

    A real-time deployment must not pay the first-solve compile (seconds to
    tens of seconds) inside its first control tick: a multi-robot fleet that
    compiles mid-episode broadcasts nothing meanwhile, so PEERS see
    many-second-stale plans (the reference avoids this because its solver is
    ahead-of-time generated C). Call once after :func:`build_planner`,
    before joining a fleet / starting the control timer."""
    from .planner.data_preparation import (define_robot_area,
                                           get_constant_velocity_prediction)
    from .solver import State
    from .types import DynamicObstacle, RealTimeData, ReferencePath

    state = State(model)
    state.set("x", float(start_pose[0]))
    state.set("y", float(start_pose[1]))
    state.set("psi", float(start_pose[2]))
    state.set("v", 0.1)
    data = RealTimeData()
    data.robot_area = define_robot_area(
        settings["robot"]["length"], settings["robot"]["width"],
        settings["n_discs"])
    data.goal = np.asarray(goal, dtype=float)
    data.goal_received = True
    far = np.asarray(start_pose[:2], dtype=float) + 50.0
    obstacles = []
    for i in range(int(settings["max_obstacles"])):
        o = DynamicObstacle(index=i, position=far.copy(), radius=0.3)
        o.prediction = get_constant_velocity_prediction(
            far, np.zeros(2), planner.solver.dt, planner.solver.N,
            probabilistic=bool(settings["probabilistic"]["enable"]))
        obstacles.append(o)
    data.dynamic_obstacles = obstacles
    # Path-following configurations additionally gate on a reference path:
    # provide a long straight one through the start pose.
    xs = [float(start_pose[0]) + 5.0 * k for k in range(11)]
    data.reference_path = ReferencePath(x=xs, y=[float(start_pose[1])] * 11)
    planner.on_data_received(data, "reference_path")
    planner.solve_mpc(state, data)
    planner.reset(None, None)


def configuration_bicycle(settings, curvature_aware: bool = False):
    """Prius-like bicycle-model contouring configuration (the reference's
    roadnavigation/vehicle use of BicycleModel2ndOrder, solver_model.py:302-437).
    The model carries a slack input weighed by MPCBase (weights/slack)."""
    from .models import (BicycleModel2ndOrder, BicycleModel2ndOrderCurvatureAware)

    modules = ModuleManager()
    model = (BicycleModel2ndOrderCurvatureAware() if curvature_aware
             else BicycleModel2ndOrder())
    base_module = modules.add_module(MPCBaseModule(settings))
    base_module.weigh_variable("a", "acceleration")
    base_module.weigh_variable("w", "angular_velocity")
    base_module.weigh_variable("slack", "slack")
    base_module.weigh_variable(
        "v", ["velocity", "reference_velocity"],
        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)
    modules.add_module(ContouringModule(settings))
    modules.add_module(EllipsoidConstraintModule(settings))
    return model, modules
