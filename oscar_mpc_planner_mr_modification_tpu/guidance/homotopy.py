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


def h_signature_vector(path_xy: np.ndarray, obstacle_trajs: np.ndarray,
                       dt: float = 1.0) -> np.ndarray:
    """H-signature (Bhattacharya-style homology invariant) in (x, y, t).

    The guidance_planner's default comparison function ("Homology",
    config/guidance_planner.yaml:12). Each obstacle's space-time trajectory is
    a skeleton curve in 3D (extended to +-infinity in time at its endpoints so
    the curve is topologically a line); the signature is the line integral
    along the robot's space-time trajectory of the Biot-Savart field of that
    skeleton (unit current, closed form per straight segment). For two
    trajectories sharing endpoints the signature difference is the LINKING
    NUMBER of their closed loop with the skeleton: 0 for homotopic
    trajectories, +-1 when they pass the obstacle on different sides —
    threshold at 0.5 (:data:`H_CLASS_THRESHOLD`).

    path_xy: (K, 2); obstacle_trajs: (n_obs, T, 2); both on the same dt grid.
    """
    n_obs = len(obstacle_trajs)
    if n_obs == 0:
        return np.zeros(0)
    K = path_xy.shape[0]
    tp = np.arange(K) * dt
    P = np.concatenate([path_xy, tp[:, None]], axis=1)  # (K, 3)
    mids = 0.5 * (P[1:] + P[:-1])  # (K-1, 3)
    dls = P[1:] - P[:-1]
    T = obstacle_trajs.shape[1]
    to = np.arange(T) * dt
    t_extend = 1e3 * max(dt * max(K, T), 1.0)

    out = np.zeros(n_obs)
    for i, otr in enumerate(obstacle_trajs):
        S = np.concatenate([otr, to[:, None]], axis=1)  # (T, 3)
        S = np.vstack([S[:1] - [0.0, 0.0, t_extend], S,
                       S[-1:] + [0.0, 0.0, t_extend]])
        a, b = S[:-1], S[1:]  # (M, 3) segment endpoints
        d = b - a
        L = np.linalg.norm(d, axis=1, keepdims=True)
        dhat = d / np.maximum(L, 1e-12)
        r_a = mids[:, None, :] - a[None]  # (K-1, M, 3)
        r_b = mids[:, None, :] - b[None]
        cross = np.cross(np.broadcast_to(dhat[None], r_a.shape), r_a)
        rho2 = np.maximum(np.sum(cross**2, axis=-1), 1e-12)
        cos_a = (np.sum(dhat[None] * r_a, axis=-1)
                 / np.maximum(np.linalg.norm(r_a, axis=-1), 1e-12))
        cos_b = (np.sum(dhat[None] * r_b, axis=-1)
                 / np.maximum(np.linalg.norm(r_b, axis=-1), 1e-12))
        B = cross / rho2[..., None] * (cos_a - cos_b)[..., None]
        out[i] = float(np.sum(B.sum(axis=1) * dls)) / (4.0 * np.pi)
    return out


#: Class threshold for H-signatures: homotopic trajectories differ by ~0,
#: side flips by ~±1 (integer linking numbers).
H_CLASS_THRESHOLD = 0.5


def make_comparator(comparison_function: str, dt: float,
                    pass_threshold: float):
    """Comparator factory matching guidance_planner's ``comparison_function``
    option (Homology | Winding | UVD, config/guidance_planner.yaml:12-16).

    Returns ``(signature_fn(path, obstacle_trajs) -> vector, threshold)``.
    UVD is not signature-based (it compares trajectory PAIRS, see
    :func:`uvd_equivalent`) and is rejected here; the two signature
    comparators agree whenever passing sides are clear-cut and differ only on
    marginal geometry (pinned by tests/test_guidance.py)."""
    if comparison_function.lower() == "winding":
        return signature_vector, pass_threshold
    if comparison_function.lower() in ("homology", "h", "h_signature"):
        return (lambda path, trajs: h_signature_vector(path, trajs, dt=dt),
                H_CLASS_THRESHOLD)
    raise ValueError(
        f"unsupported comparison_function {comparison_function!r}; use "
        "'Winding' or 'Homology' (UVD is pairwise: guidance.homotopy."
        "uvd_equivalent)")


def uvd_equivalent(path_a: np.ndarray, path_b: np.ndarray,
                   obstacle_trajs: np.ndarray, margins) -> bool:
    """Uniform Visibility Deformation equivalence (the third guidance_planner
    comparator): two same-grid trajectories are UVD-equivalent iff for every
    time k the straight segment between a_k and b_k stays outside every
    obstacle disc at time k (the linear homotopy between them is
    collision-free)."""
    n = min(len(path_a), len(path_b))
    if len(obstacle_trajs) == 0:
        return True
    margins = np.broadcast_to(np.asarray(margins, dtype=float),
                              (len(obstacle_trajs),))
    a = np.asarray(path_a[:n])
    b = np.asarray(path_b[:n])
    obs = np.asarray(obstacle_trajs)[:, :n]  # (n_obs, n, 2)
    seg = b - a  # (n, 2)
    rel = obs - a[None]  # (n_obs, n, 2)
    denom = np.maximum(np.sum(seg * seg, axis=-1), 1e-12)  # (n,)
    tproj = np.clip(np.sum(rel * seg[None], axis=-1) / denom, 0.0, 1.0)
    closest = a[None] + tproj[..., None] * seg[None]  # (n_obs, n, 2)
    dist = np.linalg.norm(obs - closest, axis=-1)  # (n_obs, n)
    return bool(np.all(dist >= margins[:, None]))


def jax_signature_vector(path_xy, obstacle_trajs):
    """JAX twin for on-device batched classification (vmap over paths)."""
    import jax.numpy as jnp

    rel = path_xy[None, :, :] - obstacle_trajs
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    d = jnp.diff(ang, axis=1)
    d = jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.sum(d, axis=1)
