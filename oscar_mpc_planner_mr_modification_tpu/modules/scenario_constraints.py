"""SH-MPC scenario constraints (24 halfspaces per disc with slack).

Symbolic: mpc_planner_modules/scripts/scenario_constraints.py:14-94. The halfspace
parameters are filled at runtime from sampled obstacle scenarios; in the reference an
external ``scenario_module`` does this inside 4 OpenMP solver clones
(src/scenario_constraints.cpp:58-130). Here the scenario sampling, halfspace
extraction and the parallel solve live in :mod:`..parallel.scenario` as a batched
(vmapped) program; this module contributes the symbolic constraint structure and the
custom ``optimize`` dispatch.
"""

from __future__ import annotations

import numpy as np

from .base import ConstraintModule, ego_disc_position, EXIT_CODE_NOT_OPTIMIZED_YET

N_SCENARIO_CONSTRAINTS = 24  # reference scenario_constraints.py:26


class ScenarioConstraintModule(ConstraintModule):
    module_name = "ScenarioConstraints"
    description = "Avoid dynamic obstacles under motion uncertainty (SH-MPC)"

    def __init__(self, settings):
        self.settings = settings
        self.n_discs = settings["n_discs"]
        # Per-disc row count is N_SCENARIO_CONSTRAINTS; total nh scales
        # linearly with discs. DELIBERATE DIVERGENCE from the reference
        # (scripts/scenario_constraints.py:33-36,84-94), whose LinearConstraints
        # re-loops its already-disc-scaled n_constraints per disc: at
        # n_discs > 1 its parameter count goes quadratic and the emitted row
        # count (n_discs * 24*n_discs) mismatches its declared nh (24*n_discs).
        # The reference only ever ships n_discs = 1 for SH-MPC, where the two
        # agree; this version is consistent for any disc count.
        self.n_per_disc = N_SCENARIO_CONSTRAINTS
        self.n_constraints = self.n_per_disc * self.n_discs
        self.nh = self.n_constraints
        self.use_slack = True
        self._optimizer = None  # wired to parallel.scenario.ScenarioOptimizer

    def _constraint_name(self, index: int, disc_id: int) -> str:
        return f"disc_{disc_id}_scenario_constraint_{index}"

    def define_parameters(self, params) -> None:
        for d in range(self.n_discs):
            params.add(f"ego_disc_{d}_offset", bundle_name="ego_disc_offset")
            for i in range(self.n_per_disc):
                params.add(self._constraint_name(i, d) + "_a1")
                params.add(self._constraint_name(i, d) + "_a2")
                params.add(self._constraint_name(i, d) + "_b")

    def get_lower_bound(self):
        return [-np.inf] * self.n_constraints

    def get_upper_bound(self):
        return [0.0] * self.n_constraints

    def get_constraints(self, model, params, settings, stage_idx):
        constraints = []
        slack = model.get("slack") if self.use_slack else 0.0
        for d in range(self.n_discs):
            px, py = ego_disc_position(model, params, d)
            for i in range(self.n_per_disc):
                a1 = params.get(self._constraint_name(i, d) + "_a1")
                a2 = params.get(self._constraint_name(i, d) + "_a2")
                b = params.get(self._constraint_name(i, d) + "_b")
                if self.use_slack:
                    constraints.append(a1 * px + a2 * py - (b + slack))
                else:
                    constraints.append(a1 * px + a2 * py - b)
        return constraints

    def set_parameters(self, buf, data, module_data) -> None:
        """Disc offsets + far-away dummy halfspaces; the scenario optimizer
        overwrites the halfspace rows per parallel solver from its own
        samples (parallel/scenario.py::_fill_scenario_constraints)."""
        for d in range(self.n_discs):
            if len(data.robot_area) > d:
                buf.set(f"ego_disc_{d}_offset", data.robot_area[d].offset)
            for i in range(self.n_per_disc):
                name = self._constraint_name(i, d)
                buf.set(name + "_a1", 1.0)
                buf.set(name + "_a2", 0.0)
                buf.set(name + "_b", 1.0e4)

    # -- runtime: custom parallel optimize (scenario_constraints.cpp:58-108)
    def attach_optimizer(self, optimizer) -> None:
        self._optimizer = optimizer

    def optimize(self, state, data, module_data) -> int:
        if self._optimizer is None:
            return EXIT_CODE_NOT_OPTIMIZED_YET
        return self._optimizer.optimize(state, data, module_data)

    def on_data_received(self, data, data_name: str) -> None:
        if data_name == "dynamic obstacles" and self._optimizer is not None:
            self._optimizer.sample_scenarios(data)

    def is_data_ready(self, data) -> bool:
        from ..types import PredictionType

        if len(data.dynamic_obstacles) != self.settings["max_obstacles"]:
            return False
        return all(
            (not o.prediction.empty())
            and o.prediction.type in (PredictionType.GAUSSIAN,)
            for o in data.dynamic_obstacles
        )
