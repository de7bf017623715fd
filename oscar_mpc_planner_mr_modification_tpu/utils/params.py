"""Named per-stage parameter registry.

Replaces the reference's ``Parameters`` class + generated ``parameter_map.yaml`` +
``mpc_planner_parameters.h`` setter glue (reference:
solver_generator/util/parameters.py:10-96, generate_cpp_files.py:11-260) with a single
Python object that serves both roles:

- at *assembly* time, modules register named parameters (in objective-then-constraint
  order, which fixes the flat per-stage index layout exactly like the reference's
  ``define_parameters`` at solver_definition.py:5-16), and symbolic module functions
  read them out of a traced ``(npar,)`` vector by name;
- at *runtime*, the planner fills a dense ``(N, npar)`` float array ("all_parameters",
  the analog of ``AcadosParameters::all_parameters``) using vectorized name-indexed
  setters. Bundles (e.g. ``ellipsoid_obst_x``) map a base name + integer index to a
  column, mirroring the generated ``setSolverParameter<Name>(k, params, value, index)``
  functions.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class ParameterView:
    """Name-indexed view over a traced flat parameter vector ``p`` of shape (npar,).

    Passed to symbolic module functions; ``get("contour")`` returns the traced scalar,
    mirroring the reference's ``params.get`` (solver_generator/util/parameters.py:79-83).
    """

    __slots__ = ("_reg", "_p")

    def __init__(self, registry: "ParameterRegistry", p):
        self._reg = registry
        self._p = p

    def get(self, name: str):
        return self._p[self._reg.index(name)]

    def has_parameter(self, name: str) -> bool:
        return self._reg.has_parameter(name)

    def get_bundle(self, bundle_name: str):
        """Return all parameters of a bundle as a stacked array (bundle_size,)."""
        idx = self._reg.bundle_indices(bundle_name)
        return self._p[np.asarray(idx)]


class ParameterRegistry:
    """Ordered named parameter registry with bundles.

    Mirrors reference ``Parameters.add`` semantics (duplicate adds are ignored,
    indices are assigned in first-add order; parameters.py:25-62).
    """

    def __init__(self):
        self._indices: Dict[str, int] = {}
        self._bundles: Dict[str, List[int]] = {}
        self.rqt_params: List[str] = []  # "tunable weight" subset, kept for parity
        # rqt slider metadata, parallel to rqt_params (reference
        # solver_generator/util/parameters.py:17-20,56-61)
        self.rqt_param_config_names: List[str] = []
        self.rqt_param_min_values: List[float] = []
        self.rqt_param_max_values: List[float] = []
        self._frozen = False

    # -- definition phase -------------------------------------------------
    def add(self, name: str, add_to_rqt_reconfigure: bool = False,
            bundle_name: Optional[str] = None,
            rqt_config_name: Optional[str] = None,
            rqt_min_value: float = 0.0, rqt_max_value: float = 100.0,
            **_ignored) -> None:
        """Register a parameter. ``rqt_min_value``/``rqt_max_value`` are the
        tuning-slider range for rqt-exposed weights (reference defaults
        0..100, solver_generator/util/parameters.py:25-32); runtime tuners
        (:class:`..systems.WeightTuner`) clamp to this range."""
        if self._frozen:
            raise RuntimeError("ParameterRegistry is frozen; cannot add parameters")
        if name in self._indices:
            return
        idx = len(self._indices)
        self._indices[name] = idx
        bundle = bundle_name if bundle_name is not None else name
        self._bundles.setdefault(bundle, []).append(idx)
        if add_to_rqt_reconfigure:
            self.rqt_params.append(name)
            self.rqt_param_config_names.append(
                rqt_config_name if rqt_config_name is not None
                else f'["weights"]["{name}"]')
            self.rqt_param_min_values.append(float(rqt_min_value))
            self.rqt_param_max_values.append(float(rqt_max_value))

    def rqt_range(self, name: str):
        """(min, max) slider range of an rqt-exposed parameter."""
        i = self.rqt_params.index(name)
        return self.rqt_param_min_values[i], self.rqt_param_max_values[i]

    def freeze(self) -> None:
        self._frozen = True

    # -- queries -----------------------------------------------------------
    def length(self) -> int:
        return len(self._indices)

    @property
    def npar(self) -> int:
        return len(self._indices)

    def index(self, name: str) -> int:
        return self._indices[name]

    def has_parameter(self, name: str) -> bool:
        return name in self._indices

    def has_bundle(self, bundle: str) -> bool:
        return bundle in self._bundles

    def bundle_indices(self, bundle: str) -> List[int]:
        return self._bundles[bundle]

    def names(self) -> List[str]:
        return list(self._indices.keys())

    def save_map(self) -> Dict[str, int]:
        """The parameter map (name -> flat index), the reference's parameter_map.yaml."""
        return dict(self._indices)

    def view(self, p) -> ParameterView:
        return ParameterView(self, p)

    # -- runtime fill ------------------------------------------------------
    def new_buffer(self, N: int, dtype=np.float64) -> "ParameterBuffer":
        return ParameterBuffer(self, N, dtype)


class ParameterBuffer:
    """Dense (N, npar) per-stage parameter array with name-indexed setters.

    The runtime analog of ``AcadosParameters::all_parameters`` (reference:
    mpc_planner_solver/include/.../acados_solver_interface.h:51-91) plus the generated
    setter functions. Setters are vectorized over stages: ``set("goal_x", 3.0)`` writes
    all N stages at once; pass an array of shape (N,) for per-stage values, or use
    ``set_stage`` for a single stage.
    """

    def __init__(self, registry: ParameterRegistry, N: int, dtype=np.float64):
        self.reg = registry
        self.N = int(N)
        self.data = np.zeros((self.N, registry.npar), dtype=dtype)

    def set(self, name: str, value) -> None:
        self.data[:, self.reg.index(name)] = value

    def set_stage(self, k: int, name: str, value: float) -> None:
        self.data[k, self.reg.index(name)] = value

    def set_bundle(self, bundle: str, index: int, value) -> None:
        """Bundle member setter: the analog of setSolverParameter<bundle>(k,..,index)."""
        self.data[:, self.reg.bundle_indices(bundle)[index]] = value

    def set_bundle_stage(self, k: int, bundle: str, index: int, value: float) -> None:
        self.data[k, self.reg.bundle_indices(bundle)[index]] = value

    def get(self, name: str):
        return self.data[:, self.reg.index(name)]

    def copy(self) -> "ParameterBuffer":
        out = ParameterBuffer(self.reg, self.N, self.data.dtype)
        out.data[...] = self.data
        return out
