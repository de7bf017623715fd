"""Spline velocity reference along the path.

Reference: mpc_planner_modules/scripts/path_reference_velocity.py:11-44 (declares the
``spline_v`` coefficient parameters; the cost itself lives in the contouring module);
runtime src/path_reference_velocity.cpp:12-70 fits a velocity spline and uploads its
segments.
"""

from __future__ import annotations

from .base import ObjectiveModule
from ..ops.spline_fit import CubicSpline1D


class PathReferenceVelocityModule(ObjectiveModule):
    module_name = "PathReferenceVelocity"
    description = "Tracks a dynamic velocity reference along the path"

    def __init__(self, settings):
        self.settings = settings
        self.num_segments = settings["contouring"]["num_segments"]
        self.velocity_spline: CubicSpline1D | None = None
        self.solver = None

    def define_parameters(self, params) -> None:
        for i in range(self.num_segments):
            params.add(f"spline_v{i}_a", bundle_name="spline_v_a")
            params.add(f"spline_v{i}_b", bundle_name="spline_v_b")
            params.add(f"spline_v{i}_c", bundle_name="spline_v_c")
            params.add(f"spline_v{i}_d", bundle_name="spline_v_d")

    def get_value(self, model, params, settings, stage_idx):
        return 0.0  # cost computed inside the contouring objective

    # -- runtime (path_reference_velocity.cpp:12-70) -----------------------
    def on_data_received(self, data, data_name: str) -> None:
        if data_name == "reference_path" and data.reference_path.has_velocity():
            s = data.reference_path.s if data.reference_path.has_distance() else None
            if s is None:
                import numpy as np

                x = np.asarray(data.reference_path.x)
                y = np.asarray(data.reference_path.y)
                s = np.concatenate(
                    [[0.0], np.cumsum(np.hypot(np.diff(x), np.diff(y)))])
            self.velocity_spline = CubicSpline1D(s, data.reference_path.v)

    def set_parameters(self, buf, data, module_data) -> None:
        if self.velocity_spline is None:
            # Constant reference velocity fallback: v(s) = v_ref as a degenerate cubic
            v_ref = float(self.settings["weights"]["reference_velocity"])
            for i in range(self.num_segments):
                buf.set(f"spline_v{i}_a", 0.0)
                buf.set(f"spline_v{i}_b", 0.0)
                buf.set(f"spline_v{i}_c", 0.0)
                buf.set(f"spline_v{i}_d", v_ref)
            return
        first = module_data.current_path_segment
        seg = self.velocity_spline.export_segments(first, self.num_segments)
        for i in range(self.num_segments):
            buf.set(f"spline_v{i}_a", seg["a"][i])
            buf.set(f"spline_v{i}_b", seg["b"][i])
            buf.set(f"spline_v{i}_c", seg["c"][i])
            buf.set(f"spline_v{i}_d", seg["d"][i])
