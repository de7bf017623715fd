"""Curvature-Aware MPC contouring objective (CA-MPC).

Reference: mpc_planner_modules/scripts/curvature_aware_contouring.py:15-123 — cost on
projected progress rate ``s_dot = v (cos psi, sin psi)·t_hat * projection_ratio`` and
squared distance to path; no lag cost. Runtime reuses the Contouring module's spline
handling (src/curvature_aware_contouring.cpp:1-51).
"""

from __future__ import annotations

import jax.numpy as jnp

from .contouring import ContouringModule
from ..ops.spline import Spline, Spline2D
from ..utils.math import haar_difference_without_abs, jnp_atan2


class CurvatureAwareContouringModule(ContouringModule):
    module_name = "CurvatureAwareContouring"
    description = "CA-MPC: curvature-aware contouring costs"

    def get_value(self, model, params, settings, stage_idx):
        pos_x = model.get("x")
        pos_y = model.get("y")
        psi = model.get("psi")
        v = model.get("v")
        s = model.get("spline")

        contour_weight = params.get("contour")
        velocity_weight = params.get("velocity")

        if self.dynamic_velocity_reference:
            if not params.has_parameter("spline_v0_a"):
                raise IOError(
                    "contouring/dynamic_velocity_reference is enabled, but there is "
                    "no PathReferenceVelocity module.")
            reference_velocity = Spline(params, "spline_v", self.num_segments, s).at(s)
        else:
            reference_velocity = params.get("reference_velocity")

        path = Spline2D(params, self.num_segments, s)
        path_x, path_y = path.at(s)
        path_dx_n, path_dy_n = path.deriv_normalized(s)

        # Projected progress rate (curvature_aware_contouring.py:79-82)
        path_ddx, path_ddy = path.deriv2(s)
        projection_ratio = 1.0 / (
            1.0 - ((pos_x - path_x) * path_ddx + (pos_y - path_y) * path_ddy))
        s_dot = v * (jnp.cos(psi) * path_dx_n + jnp.sin(psi) * path_dy_n) * projection_ratio

        contour_error_squared = (pos_x - path_x) ** 2 + (pos_y - path_y) ** 2

        cost = contour_weight * contour_error_squared
        cost = cost + velocity_weight * (s_dot - reference_velocity) ** 2

        if stage_idx == settings["N"] - 1:
            terminal_angle_weight = params.get("terminal_angle")
            terminal_contouring_mp = params.get("terminal_contouring")
            path_angle = jnp_atan2(path_dy_n, path_dx_n)
            angle_error = haar_difference_without_abs(psi, path_angle)
            cost = cost + terminal_angle_weight * angle_error**2
            cost = cost + terminal_contouring_mp * contour_weight * contour_error_squared
            cost = cost + terminal_contouring_mp * velocity_weight * (
                s_dot - reference_velocity) ** 2

        return cost

    def set_parameters(self, buf, data, module_data) -> None:
        super().set_parameters(buf, data, module_data)
        if not self.dynamic_velocity_reference:
            buf.set("reference_velocity",
                    float(self.settings["weights"]["reference_velocity"]))
            buf.set("velocity", float(self.settings["weights"]["velocity"]))
