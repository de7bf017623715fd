"""Planner core: one-control-cycle orchestration.

Mirrors ``Planner::solveMPC`` (mpc_planner/src/planner.cpp:84-232): data-ready
gating, warmstart policy selection (shift/hold when feasible, braking ramp after an
infeasible cycle), module update + vectorized parameter fill, custom-``optimize``
dispatch with default-solve fallback, output extraction and the fork's topology
metadata propagation.
"""

from __future__ import annotations

import time
from typing import Optional

from ..modules.base import EXIT_CODE_NOT_OPTIMIZED_YET
from ..solver.solver import Solver
from ..types import ModuleData, PlannerOutput, Trajectory
from ..utils.profiling import BENCHMARKERS


class Planner:
    def __init__(self, solver: Solver, modules, settings=None):
        self.solver = solver
        self.modules = modules
        self.settings = settings if settings is not None else solver.settings
        self.module_data = ModuleData()
        self.output = PlannerOutput()
        self.was_reset = True
        self._startup_time = time.monotonic()
        # Wire the solver into modules (reference: modules receive the solver
        # pointer at construction, controller_module.h:35-60)
        for m in self.modules:
            m.solver = solver

    def is_objective_reached(self, state, data) -> bool:
        return all(m.is_objective_reached(state, data) for m in self.modules)

    def on_data_received(self, data, data_name: str) -> None:
        self.modules.on_data_received(data, data_name)

    def solve_mpc(self, state, data) -> PlannerOutput:
        was_feasible = self.output.success
        prev_topology = self.output.selected_topology_id

        self.output = PlannerOutput()
        self.output.previous_topology_id = prev_topology
        self.module_data = ModuleData()

        # 1. Data-ready gate (planner.cpp:97-109)
        if not self.modules.is_data_ready(data):
            self.output.success = False
            self.output.was_infeasible = False
            return self.output

        bench = BENCHMARKERS.get("planning")
        bench.start()

        # 2. Warmstart (planner.cpp:129-139)
        shift_forward = bool(
            self.settings.get("shift_previous_solution_forward", False)
            and self.settings.get("enable_output", True))
        if was_feasible:
            self.solver.initialize_warmstart(state, shift_forward)
        else:
            self.solver.initialize_with_braking(state)
        self.solver.set_xinit(state)

        # 3. Module updates (planner.cpp:141-148)
        self.modules.update_all(state, data, self.module_data)

        # 4. Parameter fill - vectorized over stages (planner.cpp:150-160)
        self.modules.set_all_parameters(self.solver.params, data, self.module_data)

        # 5. Latch warmstart (planner.cpp:166)
        self.solver.load_warmstart()

        # 6. Timeout budget: 1/f - used - 6ms (planner.cpp:168-169). The
        #    solver adapts its (statically compiled) iteration count to this
        #    budget (Solver.select_iterations). Budget tracking activates only
        #    when the caller stamped data.planning_start_time on the
        #    time.monotonic clock (real-vehicle/driver loops); sim-clock or
        #    unset stamps yield a non-positive budget, which the solver treats
        #    as "no budget information" and runs the full iteration count —
        #    keeping simulated runs deterministic.
        start = float(getattr(data, "planning_start_time", 0.0) or 0.0)
        used = (time.monotonic() - start) if start > 0.0 else float("inf")
        self.solver.solver_timeout = (
            1.0 / float(self.settings.get("control_frequency", 20))
            - used - 0.006)

        # 7. Optimize dispatch (planner.cpp:173-188)
        opt_bench = BENCHMARKERS.get("optimization")
        opt_bench.start()
        exit_flag = EXIT_CODE_NOT_OPTIMIZED_YET
        for module in self.modules:
            exit_flag = module.optimize(state, data, self.module_data)
            if exit_flag != EXIT_CODE_NOT_OPTIMIZED_YET:
                break
        if exit_flag == EXIT_CODE_NOT_OPTIMIZED_YET:
            exit_flag = self.solver.solve()
        opt_bench.stop()
        bench.stop()

        if exit_flag != 1:
            self.output.success = False
            self.output.was_infeasible = True
            self.output.exit_code = exit_flag
            return self.output

        # 8. Output extraction (planner.cpp:200-207)
        self.output.success = True
        self.output.exit_code = exit_flag
        self.output.objective = self.solver.info["pobj"]
        traj = Trajectory(dt=self.solver.dt)
        for k in range(self.solver.N):
            traj.add(self.solver.get_output(k, "x"), self.solver.get_output(k, "y"))
            traj.add_orientation(self.solver.get_output(k, "psi"))
        self.output.trajectory = traj

        # 9. Fork topology metadata (planner.cpp:213-224)
        md = self.module_data
        self.output.selected_topology_id = md.selected_topology_id
        self.output.selected_planner_index = md.selected_planner_index
        self.output.used_guidance = md.used_guidance
        self.output.trajectory_cost = md.trajectory_cost
        self.output.num_of_guidance_found = md.num_of_guidance_found
        self.output.non_guided_homology_failed = md.non_guided_homology_failed
        self.output.topology_changed = (
            prev_topology != md.selected_topology_id)
        return self.output

    def get_solution(self, k: int, var_name: str) -> float:
        return self.solver.get_output(k, var_name)

    def get_ego_prediction(self, k: int, var_name: str) -> float:
        return self.solver.get_ego_prediction(k, var_name)

    def visualize(self, state, data) -> None:
        for m in self.modules:
            m.visualize(data, self.module_data)

    def reset(self, state=None, data=None, success: bool = True) -> None:
        """planner.cpp:389-406."""
        self.modules.reset_all()
        self.solver.reset()
        if state is not None:
            state.reset()
        if data is not None:
            data.reset()
        self.output = PlannerOutput()
        self.was_reset = True
