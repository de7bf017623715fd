#!/usr/bin/env python
"""Monte-Carlo planner study on device (parallel/rollout.py).

Sweeps a design question the reference would answer with hours of Gazebo
episodes — "how does the obstacle count affect goal-reach and safety?" —
by advancing thousands of closed-loop episodes per configuration entirely on
the accelerator (one dispatch each).

Run (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/demo_monte_carlo.py
Run (TPU): python examples/demo_monte_carlo.py   # fused kernel, much larger B
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
    make_batch_rollout, sample_scenes)


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # true-f64 on CPU
    B = int(os.environ.get("MC_B", "2048" if on_tpu else "64"))
    N = 20 if on_tpu else 10
    n_ticks = 50
    dtype = jnp.float32 if on_tpu else jnp.float64

    print(f"platform={platform}  B={B} episodes x {n_ticks} ticks, N={N}")
    print(f"{'n_obs':>6} {'reach':>7} {'collide':>8} {'solve_ok':>9} "
          f"{'min_dist':>9} {'wall_s':>7}")
    for n_obs in (1, 2, 3, 4):
        rollout, _ = make_batch_rollout(n_obstacles=n_obs, N=N,
                                        n_ticks=n_ticks, dtype=dtype)
        x0, goal, obs0, obs_vel = sample_scenes(B, n_obs, seed=7)
        args = tuple(map(jnp.asarray, (x0, goal, obs0, obs_vel)))
        m = rollout(*args)  # compile + run
        float(np.mean(np.asarray(m.reached)))
        t0 = time.perf_counter()
        m = rollout(*args)
        reach = float(np.mean(np.asarray(m.reached)))
        wall = time.perf_counter() - t0
        print(f"{n_obs:>6} {reach:>7.3f} "
              f"{float(np.mean(np.asarray(m.collided))):>8.3f} "
              f"{float(np.mean(np.asarray(m.solve_success_rate))):>9.3f} "
              f"{float(np.mean(np.asarray(m.min_obstacle_dist))):>9.2f} "
              f"{wall:>7.2f}")

    # Controller tuning in one dispatch: per-episode weight inputs sweep a
    # (contour x reference_velocity) grid against shared scenes — the
    # Monte-Carlo analog of the reference's rqt_reconfigure sliders.
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_contouring_rollout)

    rng = np.random.default_rng(0)
    n_w = 4 if not on_tpu else 8
    n_scenes, n_obs = (4, 2) if not on_tpu else (16, 3)
    wc_grid = np.geomspace(0.1, 1.5, n_w)
    wv_grid = np.linspace(1.5, 3.0, n_w)
    combos = np.stack(np.meshgrid(wc_grid, wv_grid, indexing="ij"),
                      axis=-1).reshape(-1, 2)
    Bw = len(combos) * n_scenes
    rollout, _ = make_contouring_rollout(
        n_obstacles=n_obs, N=N, n_ticks=n_ticks, dtype=dtype,
        per_episode_weights=("contour", "reference_velocity"))
    x0 = np.zeros((Bw, 5))
    x0[:, 3] = 0.8
    ox = np.tile(rng.uniform(3.0, 10.0, (n_scenes, n_obs)), (len(combos), 1))
    oy0 = rng.uniform(-2.5, 2.5, (n_scenes, n_obs)) + 1.0
    oy = np.tile(oy0, (len(combos), 1))
    vel = np.tile(np.stack(
        [rng.uniform(-0.1, 0.1, (n_scenes, n_obs)),
         -np.sign(oy0) * rng.uniform(0.3, 0.8, (n_scenes, n_obs))],
        axis=-1), (len(combos), 1, 1))
    m = rollout(jnp.asarray(x0), jnp.asarray(np.stack([ox, oy], axis=-1)),
                jnp.asarray(vel), jnp.asarray(np.repeat(combos[:, 0], n_scenes)),
                jnp.asarray(np.repeat(combos[:, 1], n_scenes)))
    prog = np.asarray(m.progress).reshape(len(combos), n_scenes).mean(1)
    coll = np.asarray(m.collided).reshape(len(combos), n_scenes).mean(1)
    best = int(np.argmax(np.where(coll == 0, prog, -1.0)))
    print(f"\nweight sweep ({len(combos)} combos x {n_scenes} scenes, one "
          f"dispatch): best safe combo contour={combos[best, 0]:.2f} "
          f"v_ref={combos[best, 1]:.2f} -> {prog[best]:.1f} m progress")


if __name__ == "__main__":
    main()
