#!/usr/bin/env python
"""Closed-loop Monte-Carlo throughput on hardware (parallel/rollout.py).

B closed-loop episodes x n_ticks control periods advanced entirely on device
in one dispatch (param fill -> fused SQP -> dynamics -> obstacle step ->
metrics). The reference's equivalent is one Gazebo episode per process in
real time: 60 ticks at 20 Hz = 3 s wall per episode per core.

Prints one JSON line with episodes/s, closed-loop ticks/s and scene metrics.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_batch_rollout, sample_scenes)

    B = int(os.environ.get("ROLLOUT_B", "4096"))
    N = int(os.environ.get("ROLLOUT_N", "20"))
    n_ticks = int(os.environ.get("ROLLOUT_TICKS", "60"))
    n_obs = int(os.environ.get("ROLLOUT_OBS", "3"))

    platform = jax.devices()[0].platform
    log(f"platform={platform} B={B} N={N} ticks={n_ticks}")
    rollout, ocp = make_batch_rollout(n_obstacles=n_obs, N=N, n_ticks=n_ticks,
                                      dtype=jnp.float32)
    x0, goal, obs0, obs_vel = sample_scenes(B, n_obs, seed=0)
    args = tuple(map(jnp.asarray, (x0, goal, obs0, obs_vel)))

    log("compiling (fused kernel inside lax.scan)...")
    m = rollout(*args)
    reached = float(np.mean(np.asarray(m.reached)))  # forces completion

    ts = []
    for i in range(4):
        x0i, goali, obs0i, veli = sample_scenes(B, n_obs, seed=i + 1)
        a = tuple(map(jnp.asarray, (x0i, goali, obs0i, veli)))
        t0 = time.perf_counter()
        m = rollout(*a)
        reached = float(np.mean(np.asarray(m.reached)))
        ts.append(time.perf_counter() - t0)
    dt_s = float(np.median(ts))
    result = {
        "metric": "closed_loop_episodes_per_s", "value": round(B / dt_s, 1),
        "unit": "episodes/s", "batch": B, "n_ticks": n_ticks, "horizon": N,
        "wall_s_per_batch": round(dt_s, 3),
        "closed_loop_ticks_per_s": round(B * n_ticks / dt_s, 1),
        "reached_rate": round(float(np.mean(np.asarray(m.reached))), 4),
        "collision_rate": round(float(np.mean(np.asarray(m.collided))), 4),
        "solve_success": round(
            float(np.mean(np.asarray(m.solve_success_rate))), 4),
        "platform": platform,
    }
    print(json.dumps(result), flush=True)

    # Phase 2: multi-robot joint planning (B episodes x R robots exchanging
    # plans every tick, the fork's core loop) on the antipodal-circle
    # benchmark.
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        antipodal_circle_scenes, make_multirobot_rollout)

    R = int(os.environ.get("ROLLOUT_ROBOTS", "4"))
    Bm = int(os.environ.get("ROLLOUT_MR_B", str(max(B // R, 1))))
    log(f"multi-robot: B={Bm} episodes x {R} robots, compiling...")
    mr, _ = make_multirobot_rollout(n_robots=R, N=N, n_ticks=n_ticks,
                                    dtype=jnp.float32)
    x0, goals = antipodal_circle_scenes(Bm, R, seed=0)
    mm = mr(jnp.asarray(x0), jnp.asarray(goals))
    float(np.mean(np.asarray(mm.all_reached)))
    ts = []
    for i in range(4):
        x0i, goalsi = antipodal_circle_scenes(Bm, R, seed=i + 1)
        t0 = time.perf_counter()
        mm = mr(jnp.asarray(x0i), jnp.asarray(goalsi))
        float(np.mean(np.asarray(mm.all_reached)))
        ts.append(time.perf_counter() - t0)
    dt_s = float(np.median(ts))
    result_mr = {
        "metric": "multirobot_episodes_per_s", "value": round(Bm / dt_s, 1),
        "unit": "episodes/s", "batch": Bm, "n_robots": R, "n_ticks": n_ticks,
        "horizon": N, "wall_s_per_batch": round(dt_s, 3),
        "robot_ticks_per_s": round(Bm * R * n_ticks / dt_s, 1),
        "all_reached_rate": round(
            float(np.mean(np.asarray(mm.all_reached))), 4),
        "collision_rate": round(float(np.mean(np.asarray(mm.collided))), 4),
        "solve_success": round(
            float(np.mean(np.asarray(mm.solve_success_rate))), 4),
        "platform": platform,
    }
    print(json.dumps(result_mr), flush=True)

    # Phase 3: closed-loop MPCC path following (BASELINE config 2 shape)
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_contouring_rollout)

    log(f"contouring: B={B} episodes, compiling...")
    cr, _ = make_contouring_rollout(n_obstacles=n_obs, N=N, n_ticks=n_ticks,
                                    dtype=jnp.float32)

    def contouring_scene(seed):
        r = np.random.default_rng(seed)
        x0c = np.zeros((B, 5), np.float32)
        x0c[:, 3] = 0.8
        ox = r.uniform(3.0, 14.0, (B, n_obs))
        oy = r.uniform(-2.5, 2.5, (B, n_obs)) + np.where(
            r.uniform(size=(B, n_obs)) < 0.5, -1.0, 1.0)
        obs0c = np.stack([ox, oy], axis=-1)
        velc = np.stack([r.uniform(-0.15, 0.15, (B, n_obs)),
                         -np.sign(oy) * r.uniform(0.3, 1.0, (B, n_obs))],
                        axis=-1)
        return (jnp.asarray(x0c), jnp.asarray(obs0c), jnp.asarray(velc))

    mc = cr(*contouring_scene(0))
    float(np.mean(np.asarray(mc.progress)))
    ts = []
    for i in range(4):
        a = contouring_scene(i + 1)
        t0 = time.perf_counter()
        mc = cr(*a)
        float(np.mean(np.asarray(mc.progress)))
        ts.append(time.perf_counter() - t0)
    dt_s = float(np.median(ts))
    result_c = {
        "metric": "contouring_episodes_per_s", "value": round(B / dt_s, 1),
        "unit": "episodes/s", "batch": B, "n_ticks": n_ticks, "horizon": N,
        "wall_s_per_batch": round(dt_s, 3),
        "closed_loop_ticks_per_s": round(B * n_ticks / dt_s, 1),
        "mean_progress_m": round(float(np.mean(np.asarray(mc.progress))), 2),
        "collision_rate": round(float(np.mean(np.asarray(mc.collided))), 4),
        "solve_success": round(
            float(np.mean(np.asarray(mc.solve_success_rate))), 4),
        "platform": platform,
    }
    print(json.dumps(result_c), flush=True)

    # Phase 4: closed-loop T-MPC++ — the full parallel-homotopy planner
    # (n_paths guided + 1 unguided planner, topology constraints, fair-cost
    # selection with consistency) per tick per episode, all on device.
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_tmpc_rollout, tmpc_scenes)

    n_paths = int(os.environ.get("ROLLOUT_PATHS", "4"))
    Bt = int(os.environ.get("ROLLOUT_TMPC_B", str(max(B // (n_paths + 1), 1))))
    n_obs_t = int(os.environ.get("ROLLOUT_TMPC_OBS", "4"))
    log(f"t-mpc: B={Bt} episodes x {n_paths + 1} planners, compiling...")
    tr, _ = make_tmpc_rollout(n_obstacles=n_obs_t, N=N, n_ticks=n_ticks,
                              n_paths=n_paths, dtype=jnp.float32)
    x0, obs0, obs_vel = tmpc_scenes(Bt, n_obs_t, seed=0)
    mt = tr(jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(obs_vel))
    float(np.mean(np.asarray(mt.progress)))
    ts = []
    for i in range(4):
        a = tuple(map(jnp.asarray, tmpc_scenes(Bt, n_obs_t, seed=i + 1)))
        t0 = time.perf_counter()
        mt = tr(*a)
        float(np.mean(np.asarray(mt.progress)))
        ts.append(time.perf_counter() - t0)
    dt_s = float(np.median(ts))
    result_t = {
        "metric": "tmpc_episodes_per_s", "value": round(Bt / dt_s, 1),
        "unit": "episodes/s", "batch": Bt, "n_planners": n_paths + 1,
        "n_ticks": n_ticks, "horizon": N,
        "wall_s_per_batch": round(dt_s, 3),
        "planner_solves_per_s": round(
            Bt * (n_paths + 1) * n_ticks / dt_s, 1),
        "mean_progress_m": round(float(np.mean(np.asarray(mt.progress))), 2),
        "collision_rate": round(float(np.mean(np.asarray(mt.collided))), 4),
        "plan_success": round(
            float(np.mean(np.asarray(mt.plan_success_rate))), 4),
        "planner_success": round(
            float(np.mean(np.asarray(mt.planner_success_rate))), 4),
        "guided_selected_rate": round(
            float(np.mean(np.asarray(mt.guided_selected_rate))), 4),
        "topology_switch_rate": round(
            float(np.mean(np.asarray(mt.topology_switch_rate))), 4),
        "platform": platform,
    }
    print(json.dumps(result_t), flush=True)


if __name__ == "__main__":
    main()
