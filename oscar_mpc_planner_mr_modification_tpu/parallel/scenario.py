"""SH-MPC scenario optimization as a batched JAX program.

Reference: mpc_planner_modules/src/scenario_constraints.cpp:31-130 + the external
``scenario_module``: 4 OpenMP solver clones, each drawing its own scenario samples
from the Gaussian obstacle predictions, building 24 halfspace constraints per stage
from the support scenarios, solving, and returning the lowest-cost feasible plan.

Here the solver axis is a vmap dimension: scenario sampling is vectorized numpy
(per-solver RNG streams), the halfspace extraction picks the closest samples per
stage w.r.t. the warmstart trajectory, and the 4 (or more) solves run as one
batched XLA program. Scaling the number of parallel scenario solvers is a batch-
size change, not a threading change.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..modules.scenario_constraints import N_SCENARIO_CONSTRAINTS
from ..ops.sqp import make_sqp_solver, SQPResult
from ..types import PredictionType


class ScenarioOptimizer:
    def __init__(self, solver, settings, seed: int = 0):
        self.solver = solver
        self.settings = settings
        self.n_solvers = int(settings["scenario_constraints"]["parallel_solvers"])
        self.n_samples = int(settings["scenario_constraints"].get("n_samples", 128))
        self.robot_radius = float(settings["robot_radius"])
        self.rng = np.random.default_rng(seed)
        if (jax.devices()[0].platform == "tpu"
                and solver.dtype == jnp.float32):
            from ..ops.sqp import make_fleet_sqp_solver

            fleet = make_fleet_sqp_solver(solver.ocp, solver.config,
                                          dtype=solver.dtype, backend="pallas")

            def batched(params, xinit, z_init):
                P = params.shape[0]
                return fleet(params, jnp.tile(xinit[None], (P, 1)), z_init)

            self._batched_solve = batched
        else:
            raw = make_sqp_solver(solver.ocp, solver.config, dtype=solver.dtype)
            self._batched_solve = jax.jit(jax.vmap(raw, in_axes=(0, None, 0)))
        reg = solver.ocp.registry
        self._a1_idx = np.array([
            reg.index(f"disc_0_scenario_constraint_{i}_a1")
            for i in range(N_SCENARIO_CONSTRAINTS)])
        self._a2_idx = np.array([
            reg.index(f"disc_0_scenario_constraint_{i}_a2")
            for i in range(N_SCENARIO_CONSTRAINTS)])
        self._b_idx = np.array([
            reg.index(f"disc_0_scenario_constraint_{i}_b")
            for i in range(N_SCENARIO_CONSTRAINTS)])
        # samples: (n_solvers, n_samples, n_obs, N, 2)
        self._samples = None
        self._sample_radii = None
        self.best_solver_index = -1

    # -- sampling (scenario_constraints.cpp:110-130) -----------------------
    def sample_scenarios(self, data) -> None:
        """Draw per-solver scenario sample trajectories from the Gaussian
        predictions (the scenario_module's IntegrateAndTranslateToMeanAndVariance
        capability)."""
        N = self.solver.N
        obstacles = [o for o in data.dynamic_obstacles
                     if not o.prediction.empty()]
        n_obs = len(obstacles)
        if n_obs == 0:
            self._samples = None
            return
        means = np.zeros((n_obs, N, 2))
        stds = np.zeros((n_obs, N, 2))
        radii = np.zeros(n_obs)
        for i, obs in enumerate(obstacles):
            mode = obs.prediction.modes[0]
            gaussian = obs.prediction.type == PredictionType.GAUSSIAN
            for k in range(N):
                step = mode[min(k, len(mode) - 1)]
                means[i, k] = step.position
                if gaussian:
                    stds[i, k] = (step.major_radius, step.minor_radius)
            radii[i] = obs.radius
        noise = self.rng.standard_normal(
            (self.n_solvers, self.n_samples, n_obs, N, 2))
        self._samples = means[None, None] + noise * stds[None, None]
        self._sample_radii = radii

    # -- optimize (scenario_constraints.cpp:58-108) ------------------------
    def optimize(self, state, data, module_data) -> int:
        if self._samples is None:
            self.sample_scenarios(data)
        if self._samples is None:
            return -999  # no obstacle data: fall back to the default solve

        P, N = self.n_solvers, self.solver.N
        params = np.repeat(self.solver.params.data[None], P, axis=0)
        warmstarts = np.repeat(self.solver._loaded_warmstart[None], P, axis=0)
        model = self.solver.ocp.model
        ix, iy = model.var_index("x"), model.var_index("y")

        for p in range(P):
            self._fill_scenario_constraints(params[p], warmstarts[p],
                                            self._samples[p], ix, iy)

        results: SQPResult = self._batched_solve(
            jnp.asarray(params), jnp.asarray(self.solver._xinit),
            jnp.asarray(warmstarts))
        costs = np.asarray(results.cost, dtype=float)
        success = np.asarray(results.success, dtype=bool)
        exit_codes = np.asarray(results.exit_code, dtype=int)

        feasible = np.where(success)[0]
        if len(feasible) == 0:
            self.best_solver_index = -1
            return int(exit_codes[0])
        best = int(feasible[np.argmin(costs[feasible])])
        self.best_solver_index = best
        self.solver.load_result(SQPResult(
            z=results.z[best], cost=results.cost[best],
            eq_res=results.eq_res[best], qp_comp=results.qp_comp[best],
            success=results.success[best], exit_code=results.exit_code[best]))
        self.solver.params.data[...] = params[best]
        module_data.trajectory_cost = float(costs[best])
        self._samples = None  # consume samples (resampled on new data)
        return int(exit_codes[best])

    def _fill_scenario_constraints(self, params_p, warmstart_p, samples, ix, iy
                                   ) -> None:
        """Per stage: halfspaces from the closest scenario samples (support
        scenarios) w.r.t. the warmstart trajectory."""
        n_rows = N_SCENARIO_CONSTRAINTS
        N = self.solver.N
        S, n_obs = samples.shape[0], samples.shape[1]
        params_p[:, self._a1_idx] = 1.0
        params_p[:, self._a2_idx] = 0.0
        params_p[:, self._b_idx] = 1.0e4
        for k in range(1, N):
            pos = warmstart_p[k, [ix, iy]]
            pts = samples[:, :, min(k - 1, samples.shape[2] - 1)].reshape(-1, 2)
            radii = np.repeat(self._sample_radii[None, :], S, axis=0).reshape(-1)
            d = np.linalg.norm(pts - pos[None], axis=1)
            order = np.argsort(d)[:n_rows]
            for row, j in enumerate(order):
                c = pts[j]
                diff = c - pos
                dist = np.linalg.norm(diff)
                if dist < 1e-9:
                    continue
                a = diff / dist
                margin = radii[j] + self.robot_radius
                params_p[k, self._a1_idx[row]] = a[0]
                params_p[k, self._a2_idx[row]] = a[1]
                params_p[k, self._b_idx[row]] = a @ c - margin
