"""System presets, local-planner plugin interface, live weight tuning."""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.systems import (
    CONFIGURATIONS, LocalPlannerInterface, WeightTuner, dingo_settings,
    jackal_settings, make_system_planner)


def test_system_presets():
    assert dingo_settings()["robot_radius"] == 0.25
    assert jackal_settings()["max_obstacles"] == 6
    assert jackal_settings(max_obstacles=3)["max_obstacles"] == 3
    assert set(CONFIGURATIONS) >= {"basic", "lmpcc", "tmpc",
                                   "tmpc_consistency_cost", "safe_horizon"}


def test_weight_tuner():
    planner, model, settings = make_system_planner(
        "dingo", "goal_tmpc", sqp_config=SQPConfig(n_sqp=3, n_qp_iter=8),
        N=10, guidance={"n_samples": 15})
    tuner = WeightTuner(planner)
    assert "acceleration" in tuner.tunable
    tuner.set("acceleration", 0.5)
    assert tuner.get("acceleration") == 0.5
    assert settings["weights"]["acceleration"] == 0.5
    with pytest.raises(KeyError):
        tuner.set("not_a_weight", 1.0)
    # Range clamping: rqt slider semantics (reference rqt_min/max metadata,
    # solver_generator/util/parameters.py:25-62; default range 0..100)
    lo, hi = tuner.range("acceleration")
    assert (lo, hi) == (0.0, 100.0)
    tuner.set("acceleration", -5.0)
    assert tuner.get("acceleration") == lo
    tuner.set("acceleration", 1e9)
    assert tuner.get("acceleration") == hi


def test_local_planner_interface_cycle():
    lp = LocalPlannerInterface(
        configuration="basic", N=12, max_obstacles=2,
        sqp_config=None)
    path = np.stack([np.linspace(0, 15, 20), np.zeros(20)], axis=1)
    assert lp.set_plan(path)
    v, w, ok = lp.compute_velocity_commands((0.0, 0.2, 0.0), 0.5)
    assert ok
    assert v > 0.3  # drives forward along the plan
    assert abs(w) < 1.0
    assert not lp.is_goal_reached()
