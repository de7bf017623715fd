"""Temporal-consistency cost versus the previously planned trajectory.

Reference: mpc_planner_modules/scripts/consistency_module.py:12-58 (symbolic);
runtime is a no-op shell (src/consistency_module.cpp:28-35) because the per-planner
previous-trajectory parameters are filled inside GuidanceConstraints::optimize()
(src/guidance_constraints.cpp:901-1133).
"""

from __future__ import annotations

from .base import ObjectiveModule


class ConsistencyModule(ObjectiveModule):
    module_name = "ConsistencyModule"
    description = "Penalizes deviation from the previous planned trajectory"

    def __init__(self, settings):
        self.settings = settings
        self.N = settings["N"]

    def define_parameters(self, params) -> None:
        params.add("consistency_weight", add_to_rqt_reconfigure=True)
        params.add("prev_traj_x")
        params.add("prev_traj_y")

    def get_value(self, model, params, settings, stage_idx):
        pos_x = model.get("x")
        pos_y = model.get("y")
        w = params.get("consistency_weight")
        prev_x = params.get("prev_traj_x")
        prev_y = params.get("prev_traj_y")
        return w * ((pos_x - prev_x) ** 2 + (pos_y - prev_y) ** 2)

    # Runtime: parameters are set by the T-MPC guidance module per planner; when no
    # guidance module is present, zero weight disables the cost safely.
    def set_parameters(self, buf, data, module_data) -> None:
        pass
