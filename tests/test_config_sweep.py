"""Configuration-space sweep: every factory configuration (plus settings
variations) through the FULL planner path — build_ocp assembly, runtime
module updates, per-stage parameter fill, solve, output extraction.

The reference validates configuration interactions only by launching
simulations per system package (mpc_planner_jackalsimulator/scripts/
generate_jackalsimulator_solver.py:37-155 enumerates them); here every
assembled configuration must produce a successful, finite, moving plan in a
benign scenario, so a module-interaction regression (bad parameter ordering,
shape mismatch, sign flip making a benign scenario infeasible) fails the CPU
suite instead of a sim run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu import factory
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    define_robot_area, ensure_obstacle_size)
from oscar_mpc_planner_mr_modification_tpu.sim import (
    Pedestrian, PedestrianSimulator)
from oscar_mpc_planner_mr_modification_tpu.sim.roadmap import straight_path
from oscar_mpc_planner_mr_modification_tpu.solver import State
from oscar_mpc_planner_mr_modification_tpu.types import RealTimeData
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

N = 8

CONFIGS = [
    ("no_obstacles", factory.configuration_no_obstacles, {}),
    ("no_obstacles_dynvref", factory.configuration_no_obstacles,
     {"contouring.dynamic_velocity_reference": True}),
    ("basic", factory.configuration_basic, {}),
    ("lmpcc", factory.configuration_lmpcc, {}),
    ("tmpc", factory.configuration_tmpc, {}),
    ("tmpc_consistency", factory.configuration_tmpc_consistency_cost, {}),
    ("goal_tmpc", factory.configuration_goal_tmpc, {}),
    # SH-MPC's data gate requires GAUSSIAN predictions (reference
    # scenario_constraints.cpp isDataReady): probabilistic obstacles here.
    ("safe_horizon", factory.configuration_safe_horizon,
     {"scenario_constraints.n_samples": 24, "probabilistic.enable": True,
      "_probabilistic_obstacles": True}),
    ("bicycle", factory.configuration_bicycle, {}),
]


def _apply_overrides(settings, overrides):
    for key, value in overrides.items():
        if key.startswith("_"):
            continue
        node = settings
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return settings


@pytest.mark.parametrize("name,conf,overrides",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_configuration_full_planner_ticks(name, conf, overrides):
    settings = _apply_overrides(
        default_settings(N=N, max_obstacles=2), overrides)
    model, modules = conf(settings)
    cfg = SQPConfig(n_sqp=6, n_qp_iter=10, mu_min=1e-9)
    planner = factory.build_planner(model, modules, settings,
                                    dtype=jnp.float64, sqp_config=cfg)

    state = State(model)
    state.set("v", 0.6)
    peds = [Pedestrian(np.array([6.0, 2.0]), np.array([6.0, -2.0]))]
    psim = PedestrianSimulator(peds, dt=0.2)

    n_ok = 0
    for tick in range(3):
        data = RealTimeData()
        data.robot_area = define_robot_area(0.65, 0.65, 1)
        data.reference_path = straight_path(length=20.0)
        data.goal = np.array([6.0, 0.0])
        data.goal_received = True
        prob = overrides.get("_probabilistic_obstacles", False)
        data.dynamic_obstacles = ensure_obstacle_size(
            psim.get_obstacles(N, probabilistic=prob), state,
            settings["max_obstacles"], N, 0.2, probabilistic=prob)
        if tick == 0:
            planner.on_data_received(data, "reference_path")
            planner.on_data_received(data, "goal")
            planner.on_data_received(data, "dynamic obstacles")
        out = planner.solve_mpc(state, data)
        assert np.isfinite(planner.solver.get_output_trajectory()).all(), name
        if out.success:
            n_ok += 1
            a = planner.get_solution(0, "a")
            w = planner.get_solution(0, "w")
            assert np.isfinite(a) and np.isfinite(w), name
            x = np.array(model.discrete_dynamics(
                jnp.asarray(state.as_array()), jnp.asarray(
                    [a, w] + [0.0] * (model.nu - 2)), 0.2))
            x[model.state_index("v")] = max(x[model.state_index("v")], 0.0)
            state.set_array(x)
        psim.step([state.get_position()])

    # A benign scenario must be solvable: at least the later ticks succeed
    assert n_ok >= 2, f"{name}: only {n_ok}/3 ticks succeeded"
    # And the robot must actually move forward
    assert state.get("x") > 0.1, f"{name}: no progress (x={state.get('x')})"
