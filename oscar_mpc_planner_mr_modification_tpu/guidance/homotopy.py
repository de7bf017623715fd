"""Homotopy classification of space-time trajectories around dynamic obstacles.

Equivalent of the external ``guidance_planner``'s homology machinery (used by the
reference at mpc_planner_modules/src/guidance_constraints.cpp:6,448-502,835-893 via
``FindTopologyClassForPath`` and the Homology/Winding comparison functions,
config/guidance_planner.yaml:12-16).

We use the *winding* formulation: for each dynamic obstacle, the total winding angle
of the trajectory around the obstacle's space-time trajectory (both sampled on the
same time grid). Two trajectories that pass an obstacle on different sides differ by
~+-pi in relative winding; trajectories in the same homotopy class have nearly equal
winding vectors. This matches the guidance_planner "Winding" comparison (with
``pass_threshold``) and is equivalent to the H-signature for 2D + time in practice.

All functions are numpy (host) but vectorized; a JAX twin of
:func:`signature_vector` is provided for on-device batched classification.
"""

from __future__ import annotations

import numpy as np


def winding_signature(path_xy: np.ndarray, obstacle_xy: np.ndarray) -> float:
    """Total signed winding angle of path around one obstacle trajectory.

    path_xy, obstacle_xy: (T, 2) sampled on the same time grid.
    """
    rel = path_xy - obstacle_xy
    ang = np.arctan2(rel[:, 1], rel[:, 0])
    d = np.diff(ang)
    d = np.mod(d + np.pi, 2.0 * np.pi) - np.pi  # wrap increments to (-pi, pi]
    return float(np.sum(d))


def signature_vector(path_xy: np.ndarray, obstacle_trajs: np.ndarray) -> np.ndarray:
    """(n_obstacles,) winding vector. obstacle_trajs: (n_obs, T, 2)."""
    if len(obstacle_trajs) == 0:
        return np.zeros(0)
    rel = path_xy[None, :, :] - obstacle_trajs  # (n_obs, T, 2)
    ang = np.arctan2(rel[..., 1], rel[..., 0])
    d = np.diff(ang, axis=1)
    d = np.mod(d + np.pi, 2.0 * np.pi) - np.pi
    return np.sum(d, axis=1)


def same_homotopy_class(sig_a: np.ndarray, sig_b: np.ndarray,
                        threshold: float = np.pi) -> bool:
    """Two trajectories are homotopy-equivalent iff their winding vectors agree to
    within ``threshold`` for every obstacle (passing side unchanged)."""
    if len(sig_a) == 0:
        return True
    return bool(np.all(np.abs(np.asarray(sig_a) - np.asarray(sig_b)) < threshold))


def jax_signature_vector(path_xy, obstacle_trajs):
    """JAX twin for on-device batched classification (vmap over paths)."""
    import jax.numpy as jnp

    rel = path_xy[None, :, :] - obstacle_trajs
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    d = jnp.diff(ang, axis=1)
    d = jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.sum(d, axis=1)
