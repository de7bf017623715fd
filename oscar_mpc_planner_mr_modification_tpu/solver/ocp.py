"""OCP assembly: modules + model -> pure JAX stage functions.

This is the TPU-native replacement for the reference's *solver generation* step
(solver_generator/generate_solver.py:13-61 + generate_acados_solver.py:27-200):
instead of emitting C code, we compose the module objectives/constraints into pure
functions of ``(z, p)`` and jit-compile the SQP engine around them.

Semantics mirrored from the acados build:
- the intermediate stage cost is the module objective with ``stage_idx=1`` and the
  terminal cost is the objective at ``stage_idx=N-1`` (generate_acados_solver.py:48-51);
  the terminal cost is evaluated at ``u=0`` (pure input penalties vanish there, as in
  acados where the terminal cost may not depend on u);
- constraints ``lh <= h(z, p) <= uh`` apply at stages 0..N-1; state bounds at stages
  1..N-1, input bounds at 0..N-1, stage N unconstrained
  (generate_acados_solver.py:94-112 + acados stage conventions);
- dynamics are RK4 with 3 sub-steps (generate_acados_solver.py:148-150);
- infinite bounds are replaced by +-1e15 at assembly (parse_constraint_bounds,
  generate_acados_solver.py:17-24) and dropped statically from the inequality rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List

import numpy as np

import jax.numpy as jnp

INF_BOUND = 1e15  # acados-style stand-in for inf


@dataclass
class OCP:
    model: object
    modules: object
    settings: dict
    registry: object  # ParameterRegistry
    N: int
    dt: float
    nh: int

    cost_stage: Callable = None  # (z (nvar,), p (npar,)) -> scalar
    cost_terminal: Callable = None  # (x (nx,), p (npar,)) -> scalar
    ineq: Callable = None  # (z, p) -> (nh,)
    dynamics: Callable = None  # (x, u, p) -> x_next
    lh: np.ndarray = None
    uh: np.ndarray = None
    lbz: np.ndarray = None
    ubz: np.ndarray = None

    @property
    def nx(self) -> int:
        return self.model.nx

    @property
    def nu(self) -> int:
        return self.model.nu

    @property
    def nvar(self) -> int:
        return self.model.nvar

    @property
    def npar(self) -> int:
        return self.registry.npar

    # Number of one-sided inequality rows per stage (finite bounds only), computed
    # statically at assembly. Layout (order matters, used by the SQP engine):
    #   [h lower rows | h upper rows | z lower box rows | z upper box rows]
    def ineq_row_spec(self):
        rows: List[tuple] = []
        for i in range(self.nh):
            if self.lh[i] > -INF_BOUND:
                rows.append(("hl", i))
        for i in range(self.nh):
            if self.uh[i] < INF_BOUND:
                rows.append(("hu", i))
        for j in range(self.nvar):
            if self.lbz[j] > -INF_BOUND:
                rows.append(("zl", j))
        for j in range(self.nvar):
            if self.ubz[j] < INF_BOUND:
                rows.append(("zu", j))
        return rows


def build_ocp(model, modules, settings) -> OCP:
    """Assemble the OCP (the analog of generate_solver())."""
    from ..utils.params import ParameterRegistry

    registry = ParameterRegistry()
    modules.define_parameters(registry)
    registry.freeze()

    N = int(settings["N"])
    dt = float(settings["integrator_step"])
    nu, nx = model.nu, model.nx

    lh = np.asarray(
        [b if np.isfinite(b) else -INF_BOUND
         for b in modules.constraint_lower_bounds()], dtype=float)
    uh = np.asarray(
        [b if np.isfinite(b) else INF_BOUND
         for b in modules.constraint_upper_bounds()], dtype=float)
    nh = modules.constraint_number()
    assert len(lh) == nh and len(uh) == nh

    lbz, ubz = model.bounds_arrays()
    lbz = np.where(np.isfinite(lbz), lbz, -INF_BOUND)
    ubz = np.where(np.isfinite(ubz), ubz, INF_BOUND)

    def cost_stage(z, p):
        return modules.objective(model, z, registry.view(p), settings, 1)

    def cost_terminal(x, p):
        # Shape-polymorphic over trailing batch axes (lane-layout linearizer:
        # x may be (nx,) or (nx, ...batch)); u-padding is zeros either way.
        z = jnp.concatenate(
            [jnp.zeros((nu,) + x.shape[1:], dtype=x.dtype), x])
        return modules.objective(model, z, registry.view(p), settings, N - 1)

    def ineq(z, p):
        cons = modules.constraints(model, z, registry.view(p), settings, 1)
        if len(cons) == 0:
            return jnp.zeros((0,), dtype=z.dtype)
        return jnp.stack(cons)

    def dynamics(x, u, p):
        ctx = {
            "params": registry.view(p),
            "num_segments": settings.get("contouring", {}).get("num_segments", 0),
        }
        return model.discrete_dynamics(x, u, dt, ctx=ctx)

    return OCP(
        model=model, modules=modules, settings=settings, registry=registry,
        N=N, dt=dt, nh=nh,
        cost_stage=cost_stage, cost_terminal=cost_terminal, ineq=ineq,
        dynamics=dynamics, lh=lh, uh=uh, lbz=lbz, ubz=ubz,
    )


def save_maps(ocp: OCP, directory: str) -> dict:
    """Emit the generated-artifact triple {parameter_map, model_map,
    solver_settings} as YAML.

    This is the contract the reference's online C++ layer compiles against
    (generate_solver.py:34-46: parameter_map.yaml name->index, model_map.yaml
    name->[x|u, index, lb, ub], solver_settings.yaml {N, nx, nu, nvar, npar}).
    Our runtime binds names directly through the registry objects, but the files
    keep the artifact surface inspectable and interoperable.
    """
    import os

    import yaml

    os.makedirs(directory, exist_ok=True)
    parameter_map = ocp.registry.save_map()

    model = ocp.model
    model_map = {}
    for i, name in enumerate(model.states):
        lb, ub, _ = model.get_bounds(name)
        model_map[name] = ["x", model.nu + i, float(lb), float(ub)]
    for i, name in enumerate(model.inputs):
        lb, ub, _ = model.get_bounds(name)
        model_map[name] = ["u", i, float(lb), float(ub)]

    solver_settings = {
        "N": ocp.N, "nx": ocp.nx, "nu": ocp.nu, "nvar": ocp.nvar,
        "npar": ocp.npar, "nh": ocp.nh,
        "integrator_step": ocp.dt,
        "solver": "tpu_sqp_ip",
    }

    paths = {}
    for name, payload in (("parameter_map", parameter_map),
                          ("model_map", model_map),
                          ("solver_settings", solver_settings)):
        path = os.path.join(directory, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(payload, f, sort_keys=False)
        paths[name] = path
    return paths
