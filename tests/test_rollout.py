"""Device-resident closed-loop Monte-Carlo evaluator (parallel/rollout.py).

The TPU-native analog of the reference's Gazebo experiment harness
(ros1_jackalsimulator.cpp:153-226 + experiment_util.cpp): B closed-loop
episodes advanced entirely on device in one dispatch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
    make_batch_rollout, sample_scenes)


@pytest.fixture(scope="module")
def rollout_and_metrics():
    rollout, ocp = make_batch_rollout(n_obstacles=3, N=10, n_ticks=30,
                                      dtype=jnp.float64, backend="xla")
    x0, goal, obs0, obs_vel = sample_scenes(16, 3, seed=1)
    m = rollout(jnp.asarray(x0), jnp.asarray(goal), jnp.asarray(obs0),
                jnp.asarray(obs_vel))
    return m, goal


def test_rollout_episodes_progress_and_avoid(rollout_and_metrics):
    m, goal = rollout_and_metrics
    # Most random crossing scenes are solvable within 30 ticks at N=10
    assert float(np.mean(np.asarray(m.reached))) >= 0.6
    # Episodes the solver handles (no repeated infeasibility -> no braking
    # stand-still) must stay outside the collision distance; a braking robot
    # can still be walked into by a crossing obstacle — the reference's
    # fallback has the same failure mode (ros1_jackalsimulator.cpp:190-201)
    succ = np.asarray(m.solve_success_rate) >= 0.9
    collided = np.asarray(m.collided)
    assert not bool(np.any(collided & succ))
    assert float(np.mean(collided)) <= 2 / 16
    assert float(np.min(np.asarray(m.min_obstacle_dist)[succ])) >= 0.625 - 1e-6
    assert float(np.mean(np.asarray(m.solve_success_rate))) >= 0.9


def test_rollout_moves_toward_goal(rollout_and_metrics):
    m, goal = rollout_and_metrics
    final = np.asarray(m.final_state)
    # Every episode ends closer to its goal than the 0-origin start
    d_final = np.linalg.norm(final[:, :2] - goal, axis=1)
    d_start = np.linalg.norm(goal, axis=1)
    assert np.all(d_final < d_start)


def test_rollout_is_one_jitted_program():
    """The whole episode batch must lower to ONE computation (no per-tick
    host dispatches): trace it and check it stays abstract end-to-end."""
    rollout, _ = make_batch_rollout(n_obstacles=2, N=5, n_ticks=4,
                                    dtype=jnp.float64, backend="xla")
    x0, goal, obs0, obs_vel = sample_scenes(4, 2, seed=0)
    shape = jax.eval_shape(rollout, jnp.asarray(x0), jnp.asarray(goal),
                           jnp.asarray(obs0), jnp.asarray(obs_vel))
    assert shape.reached.shape == (4,)
    assert shape.final_state.shape == (4, 4)


def test_multirobot_rollout_antipodal_circle():
    """B episodes x R robots of device-resident joint planning (the fork's
    trajectory-exchange loop, jules_ros1_jackalplanner.cpp:258-404, as one
    lax.scan): on the antipodal-circle benchmark every robot must reach its
    goal without robot-robot collision, respecting the exchanged-plan
    separation (2*radius + staleness margin)."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        antipodal_circle_scenes, make_multirobot_rollout)

    rollout, _ = make_multirobot_rollout(n_robots=4, N=12, n_ticks=55,
                                         dtype=jnp.float64, backend="xla")
    x0, goals = antipodal_circle_scenes(8, 4, radius=3.0, seed=2)
    m = rollout(jnp.asarray(x0), jnp.asarray(goals))
    assert bool(np.all(np.asarray(m.all_reached)))
    assert not bool(np.any(np.asarray(m.collided)))
    # Constraint separation: 2 * 0.325 + 0.15 margin, minus solver tolerance
    assert float(np.min(np.asarray(m.min_robot_dist))) >= 0.78
    assert float(np.mean(np.asarray(m.solve_success_rate))) >= 0.95


def test_contouring_rollout_follows_path_and_avoids():
    """Closed-loop MPCC path following on device (BASELINE config 2 shape):
    episodes progress along the straight reference at ~reference_velocity,
    deviate laterally to pass crossing obstacles, and respect the ellipsoid
    separation."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_contouring_rollout)

    rng = np.random.default_rng(3)
    B, n_obs = 8, 2
    rollout, ocp = make_contouring_rollout(
        n_obstacles=n_obs, N=10, n_ticks=50, dtype=jnp.float64, backend="xla")
    x0 = np.zeros((B, 5))
    x0[:, 3] = 0.8
    ox = rng.uniform(3.0, 10.0, (B, n_obs))
    oy = rng.uniform(-2.5, 2.5, (B, n_obs)) + np.where(
        rng.uniform(size=(B, n_obs)) < 0.5, -1.0, 1.0)
    obs0 = np.stack([ox, oy], axis=-1)
    obs_vel = np.stack([rng.uniform(-0.15, 0.15, (B, n_obs)),
                        -np.sign(oy) * rng.uniform(0.3, 1.0, (B, n_obs))],
                       axis=-1)
    m = rollout(jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(obs_vel))
    # 50 ticks at dt=0.2 and v_ref 2.0: well past 12 m along the path
    assert float(np.min(np.asarray(m.progress))) > 12.0
    assert not bool(np.any(np.asarray(m.collided)))
    assert float(np.min(np.asarray(m.min_obstacle_dist))) >= 0.625 - 1e-6
    assert float(np.mean(np.asarray(m.solve_success_rate))) >= 0.95
    # Lateral deviations stay bounded (avoidance, not divergence)
    assert float(np.max(np.asarray(m.max_lateral))) < 2.0


def test_rollout_shards_over_episode_axis():
    """Scaling demo: the Monte-Carlo evaluator is embarrassingly parallel
    over episodes — sharding the batch over an 8-device mesh must produce
    the unsharded results (XLA partitions the whole scan; no cross-episode
    communication exists to get wrong)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rollout, _ = make_batch_rollout(n_obstacles=2, N=6, n_ticks=8,
                                    dtype=jnp.float64, backend="xla")
    B = 16
    x0, goal, obs0, obs_vel = sample_scenes(B, 2, seed=5)
    args = tuple(map(jnp.asarray, (x0, goal, obs0, obs_vel)))
    ref = rollout(*args)

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("episodes",))
    shardings = [NamedSharding(mesh, P("episodes", *([None] * (a.ndim - 1))))
                 for a in args]
    sharded_args = [jax.device_put(a, s) for a, s in zip(args, shardings)]
    out = rollout(*sharded_args)
    # Outputs are sharded over the same axis and numerically identical
    np.testing.assert_allclose(np.asarray(out.min_obstacle_dist),
                               np.asarray(ref.min_obstacle_dist), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(out.reached),
                                  np.asarray(ref.reached))
    assert len(out.final_state.sharding.device_set) == 8


def test_multirobot_triggered_communication_reduces_traffic():
    """Event-triggered broadcast (decideCommunication, jules_…:1400-1482) in
    the device evaluator: GEOMETRIC + TIME + INFEASIBLE triggers cut the
    communication rate by the fork's headline 60-80 % while preserving
    safety and goal completion on the antipodal-circle benchmark."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        antipodal_circle_scenes, make_multirobot_rollout)

    x0, goals = antipodal_circle_scenes(8, 4, radius=3.0, seed=2)
    rollout, _ = make_multirobot_rollout(
        n_robots=4, N=12, n_ticks=55, dtype=jnp.float64, backend="xla",
        comm="triggered", geometric_threshold=0.5, heartbeat_ticks=10)
    m = rollout(jnp.asarray(x0), jnp.asarray(goals))
    assert bool(np.all(np.asarray(m.all_reached)))
    assert not bool(np.any(np.asarray(m.collided)))
    assert float(np.min(np.asarray(m.min_robot_dist))) >= 0.78
    rate = float(np.mean(np.asarray(m.comm_rate)))
    assert 0.1 <= rate <= 0.6, rate  # 40-90 % reduction vs always-broadcast


def test_contouring_weight_sweep_single_dispatch():
    """Per-episode weight inputs: one compiled evaluator sweeps a weight grid
    in one dispatch (the Monte-Carlo analog of the reference's rqt sliders).
    Physics must come out monotone: higher reference_velocity -> more
    progress; higher contour weight -> tighter tracking."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_contouring_rollout)

    rng = np.random.default_rng(3)
    combos = np.array([[0.2, 1.5], [0.2, 2.5], [1.0, 1.5], [1.0, 2.5]])
    n_scenes, n_obs = 4, 2
    B = len(combos) * n_scenes
    rollout, _ = make_contouring_rollout(
        n_obstacles=n_obs, N=10, n_ticks=50, dtype=jnp.float64, backend="xla",
        per_episode_weights=("contour", "reference_velocity"))
    x0 = np.zeros((B, 5))
    x0[:, 3] = 0.8
    ox = np.tile(rng.uniform(3.0, 10.0, (n_scenes, n_obs)), (len(combos), 1))
    oy0 = rng.uniform(-2.5, 2.5, (n_scenes, n_obs)) + 1.0
    oy = np.tile(oy0, (len(combos), 1))
    obs0 = np.stack([ox, oy], axis=-1)
    vel = np.tile(np.stack(
        [rng.uniform(-0.1, 0.1, (n_scenes, n_obs)),
         -np.sign(oy0) * rng.uniform(0.3, 0.8, (n_scenes, n_obs))],
        axis=-1), (len(combos), 1, 1))
    wc = np.repeat(combos[:, 0], n_scenes)
    wv = np.repeat(combos[:, 1], n_scenes)
    m = rollout(jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(vel),
                jnp.asarray(wc), jnp.asarray(wv))
    prog = np.asarray(m.progress).reshape(len(combos), n_scenes).mean(1)
    lat = np.asarray(m.max_lateral).reshape(len(combos), n_scenes).mean(1)
    assert prog[1] > prog[0] + 3.0 and prog[3] > prog[2] + 3.0  # v_ref
    assert lat[2] < lat[0] and lat[3] < lat[1]  # contour weight


def test_ccmpc_rollout_keeps_larger_margins():
    """CC-MPC flavor (BASELINE config 3): chance constraints with on-device
    uncertainty growth must keep LARGER obstacle margins than deterministic
    ellipsoids on identical scenes, at full solve success."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_contouring_rollout)

    rng = np.random.default_rng(3)
    B, n_obs = 8, 2
    x0 = np.zeros((B, 5))
    x0[:, 3] = 0.8
    ox = rng.uniform(3.0, 10.0, (B, n_obs))
    oy = rng.uniform(-2.5, 2.5, (B, n_obs)) + 1.0
    obs0 = np.stack([ox, oy], axis=-1)
    vel = np.stack([rng.uniform(-0.1, 0.1, (B, n_obs)),
                    -np.sign(oy) * rng.uniform(0.3, 0.8, (B, n_obs))], axis=-1)
    args = (jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(vel))

    mins = {}
    for cons in ("ellipsoid", "gaussian"):
        rollout, _ = make_contouring_rollout(
            n_obstacles=n_obs, N=10, n_ticks=50, dtype=jnp.float64,
            backend="xla", constraints=cons, risk=0.05, sigma_step=0.04)
        m = rollout(*args)
        assert float(np.mean(np.asarray(m.solve_success_rate))) >= 0.99, cons
        assert not bool(np.any(np.asarray(m.collided))), cons
        assert float(np.min(np.asarray(m.progress))) > 12.0, cons
        mins[cons] = float(np.min(np.asarray(m.min_obstacle_dist)))
    assert mins["gaussian"] > mins["ellipsoid"] + 0.05, mins


def test_tmpc_rollout_parallel_homotopy_closed_loop():
    """T-MPC++ closed-loop on device: every tick solves n_paths guided
    planners (lateral-offset seeds + linearized topology constraints) plus
    one unguided planner warmstarted from the previous winner, then the
    fair-cost selection with consistency preference executes the best plan
    (guidance_constraints.cpp:280-590 in one lax.scan)."""
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_tmpc_rollout, tmpc_scenes)

    B, n_obs = 8, 2
    rollout, ocp = make_tmpc_rollout(n_obstacles=n_obs, N=10, n_ticks=50,
                                     n_paths=2, dtype=jnp.float64,
                                     backend="xla")
    x0, obs0, obs_vel = tmpc_scenes(B, n_obs, seed=4)
    m = rollout(jnp.asarray(x0), jnp.asarray(obs0), jnp.asarray(obs_vel))

    # Planning works nearly every tick (the plan succeeds if ANY of the
    # P planners is feasible — T-MPC++'s whole point)
    assert float(np.mean(np.asarray(m.plan_success_rate))) >= 0.95
    # ...and beats the per-planner rate (the parallel portfolio pays off)
    assert (float(np.mean(np.asarray(m.plan_success_rate)))
            >= float(np.mean(np.asarray(m.planner_success_rate))))
    # Progress along the path at v_ref ~ 2: well past 10 m in 50 ticks
    assert float(np.min(np.asarray(m.progress))) > 10.0
    # Episodes the solver handles stay collision-free
    handled = np.asarray(m.plan_success_rate) >= 0.9
    assert not bool(np.any(np.asarray(m.collided) & handled))
    assert float(np.min(np.asarray(m.min_obstacle_dist)[handled])) >= 0.6
    # Selection statistics are rates; consistency keeps switching rare
    for rate in (m.guided_selected_rate, m.topology_switch_rate):
        r = np.asarray(rate)
        assert np.all((r >= 0.0) & (r <= 1.0))
    assert float(np.mean(np.asarray(m.topology_switch_rate))) <= 0.5


def test_tmpc_rollout_is_one_jitted_program():
    from oscar_mpc_planner_mr_modification_tpu.parallel.rollout import (
        make_tmpc_rollout, tmpc_scenes)

    rollout, _ = make_tmpc_rollout(n_obstacles=2, N=6, n_ticks=4, n_paths=2,
                                   dtype=jnp.float64, backend="xla")
    x0, obs0, obs_vel = tmpc_scenes(4, 2, seed=0)
    shape = jax.eval_shape(rollout, jnp.asarray(x0), jnp.asarray(obs0),
                           jnp.asarray(obs_vel))
    assert shape.progress.shape == (4,)
    assert shape.final_state.shape == (4, 5)
