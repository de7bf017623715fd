"""Control-module framework.

Unifies the reference's two-sided module system - Python symbolic definitions
(solver_generator/control_modules.py:4-38, mpc_planner_modules/scripts/*) and C++
runtime classes (mpc_planner_modules/include/mpc_planner_modules/controller_module.h:35-138)
- into single classes:

- *symbolic side* (used at OCP assembly / trace time): ``define_parameters``,
  ``get_value`` (objectives) / ``get_constraints`` + bounds (constraints). These run
  under ``jax.jit`` tracing on :class:`..models.dynamics.ModelView` /
  :class:`..utils.params.ParameterView` and read exactly like the CasADi scripts.
- *runtime side* (host, per control cycle): ``update(state, data, module_data)``,
  ``set_parameters(buf, data, module_data)`` filling the dense (N, npar)
  :class:`..utils.params.ParameterBuffer` (vectorized over stages, unlike the
  reference's per-k loops), ``is_data_ready``, ``is_objective_reached``,
  ``on_data_received``, ``reset``.

Modules that own their optimization (T-MPC guidance, SH-MPC scenario) implement
``optimize`` to replace the default solve, mirroring the custom-``optimize()``
dispatch in Planner::solveMPC (mpc_planner/src/planner.cpp:173-188).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

EXIT_CODE_NOT_OPTIMIZED_YET = -999  # sentinel mirroring the reference's dispatch


class Module:
    module_name: str = "Module"
    module_type: str = "objective"  # or "constraint"
    description: str = ""

    # -- symbolic side -----------------------------------------------------
    def define_parameters(self, params) -> None:
        pass

    # -- runtime side ------------------------------------------------------
    def update(self, state, data, module_data) -> None:
        pass

    def set_parameters(self, buf, data, module_data) -> None:
        """Fill the (N, npar) parameter buffer for this cycle."""

    def is_data_ready(self, data) -> bool:
        return True

    def missing_data(self, data) -> str:
        return ""

    def is_objective_reached(self, state, data) -> bool:
        return True

    def on_data_received(self, data, data_name: str) -> None:
        pass

    def optimize(self, state, data, module_data) -> int:
        """Custom optimization hook; EXIT_CODE_NOT_OPTIMIZED_YET = use default solve."""
        return EXIT_CODE_NOT_OPTIMIZED_YET

    # -- pipelined (two-phase) optimize ------------------------------------
    # Modules owning their optimization may also support an async split so a
    # real-time driver can overlap next-tick host work with the in-flight
    # device dispatch (Planner.solve_mpc_start/_finish). Contract:
    #   optimize_dispatch -> None   : module does not optimize (use default)
    #                     -> int    : resolved synchronously (exit code)
    #                     -> True   : dispatch in flight; call optimize_finish
    def optimize_dispatch(self, state, data, module_data):
        return None

    def optimize_finish(self, state, data, module_data) -> int:
        raise RuntimeError("optimize_finish without a pending dispatch")

    def refresh_state(self, state, module_data) -> None:
        """Re-derive state-bound quantities for the ACTUAL state after a
        pipelined ``prepare`` ran with a predicted one (e.g. the contouring
        progress used for xinit). Default: nothing to refresh."""

    #: True when set_parameters reads the solver's warmstart/solution buffer
    #: (e.g. linearized constraints project the ego prediction); pipelined
    #: drivers re-run those fills after the warmstart is initialized.
    fill_depends_on_solution: bool = False

    def reset(self) -> None:
        pass

    def save_data(self, data_saver) -> None:
        pass

    def visualize(self, data, module_data) -> None:
        pass


class ObjectiveModule(Module):
    module_type = "objective"

    def get_value(self, model, params, settings, stage_idx):
        """Stage cost contribution. ``stage_idx`` is static (1 = intermediate,
        N-1 = terminal), matching the acados build (generate_acados_solver.py:48-51)."""
        raise NotImplementedError


class ConstraintModule(Module):
    module_type = "constraint"
    nh: int = 0

    def get_constraints(self, model, params, settings, stage_idx) -> List:
        raise NotImplementedError

    def get_lower_bound(self) -> List[float]:
        raise NotImplementedError

    def get_upper_bound(self) -> List[float]:
        raise NotImplementedError


class ModuleManager:
    """Ordered module container + NLP assembly helpers.

    Replaces solver_generator/control_modules.py ``ModuleManager`` and the stage
    cost/constraint assembly of solver_definition.py:19-76.
    """

    def __init__(self):
        self.modules: List[Module] = []

    def add_module(self, module: Module) -> Module:
        self.modules.append(module)
        return module

    def __iter__(self):
        return iter(self.modules)

    # -- parameter definition (objectives first, then constraints - the order
    #    fixes parameter indices exactly like solver_definition.py:5-16) ----
    def define_parameters(self, params) -> None:
        for module in self.modules:
            if module.module_type == "objective":
                module.define_parameters(params)
        for module in self.modules:
            if module.module_type == "constraint":
                module.define_parameters(params)

    # -- symbolic assembly -------------------------------------------------
    def objective(self, model, z, p_view, settings, stage_idx):
        cost = 0.0
        view = model.view(z)
        for module in self.modules:
            if module.module_type == "objective":
                cost = cost + module.get_value(view, p_view, settings, stage_idx)
        return cost

    def constraints(self, model, z, p_view, settings, stage_idx) -> List:
        out: List = []
        view = model.view(z)
        for module in self.modules:
            if module.module_type == "constraint":
                out.extend(module.get_constraints(view, p_view, settings, stage_idx))
        return out

    def constraint_lower_bounds(self) -> List[float]:
        lb: List[float] = []
        for module in self.modules:
            if module.module_type == "constraint":
                lb.extend(module.get_lower_bound())
        return lb

    def constraint_upper_bounds(self) -> List[float]:
        ub: List[float] = []
        for module in self.modules:
            if module.module_type == "constraint":
                ub.extend(module.get_upper_bound())
        return ub

    def constraint_number(self) -> int:
        return sum(m.nh for m in self.modules if m.module_type == "constraint")

    # -- runtime orchestration helpers ------------------------------------
    def is_data_ready(self, data) -> bool:
        return all(m.is_data_ready(data) for m in self.modules)

    def missing_data(self, data) -> str:
        return " ".join(
            m.missing_data(data) for m in self.modules if not m.is_data_ready(data)
        )

    def update_all(self, state, data, module_data) -> None:
        for m in self.modules:
            m.update(state, data, module_data)

    def set_all_parameters(self, buf, data, module_data) -> None:
        for m in self.modules:
            m.set_parameters(buf, data, module_data)

    def on_data_received(self, data, data_name: str) -> None:
        for m in self.modules:
            m.on_data_received(data, data_name)

    def reset_all(self) -> None:
        for m in self.modules:
            m.reset()


def mode_risk_allocation(prediction, risk: float, max_modes: int):
    """Probability-aware per-mode risk split for GMM predictions.

    Allocates ``risk_j = risk / (M_active * p_j)`` (clipped to [1e-6, 0.49]) to
    each active mode so the total violation probability is bounded:
    ``sum_j p_j * risk_j <= risk``. Single-mode predictions get the full risk
    (reference behavior). Modes with missing/zero probabilities fall back to a
    uniform split. The reference rejects multi-mode input outright
    (ros1_jackalsimulator.cpp:346-349); this is the TPU build's extension.
    """
    m_active = max(1, min(len(prediction.modes), max_modes))
    if m_active == 1:
        return [float(risk)]
    probs = list(prediction.probabilities[:m_active])
    if len(probs) < m_active or any(p <= 0.0 for p in probs):
        probs = [1.0 / m_active] * m_active
    total = sum(probs)
    probs = [p / total for p in probs]
    return [float(np.clip(risk / (m_active * p), 1e-6, 0.49)) for p in probs]


def ego_disc_position(model_view, params, disc_id: int):
    """Position of ego collision disc ``disc_id`` given the current pose.

    Shared helper for all disc-based constraints (the reference repeats this block
    in each scripts/*.py, e.g. ellipsoid_constraints.py:108-112).
    """
    import jax.numpy as jnp

    pos_x = model_view.get("x")
    pos_y = model_view.get("y")
    try:
        psi = model_view.get("psi")
    except KeyError:
        psi = 0.0
    offset = params.get(f"ego_disc_{disc_id}_offset")
    return (pos_x + jnp.cos(psi) * offset, pos_y + jnp.sin(psi) * offset)
