"""Pipelined (two-phase) tick: overlap host work with the in-flight dispatch.

The reference's control cycle is fully serial (planner.cpp:84-232). The TPU
build adds a split API — ``Planner.prepare`` / ``solve_mpc_start`` /
``solve_mpc_finish`` — so a real-time driver can compute the NEXT tick's
guidance PRM + parameter fill while the current solve's device round trip is
in flight (exactly one dispatch in flight at a time). These tests pin:

1. the split optimize (dispatch + finish) is bitwise-identical to the
   synchronous path when fed identical inputs;
2. the packed-solve async halves (dispatch/fetch) equal the sync call;
3. the full pipelined closed loop (prepared with the planner's own
   one-step-ahead state prediction) drives the jackalsimulator T-MPC scenario
   with the same success/clearance quality as the serial loop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.factory import (
    build_planner, configuration_tmpc_consistency_cost)
from oscar_mpc_planner_mr_modification_tpu.ops.sqp import SQPConfig
from oscar_mpc_planner_mr_modification_tpu.planner.data_preparation import (
    define_robot_area, ensure_obstacle_size, get_constant_velocity_prediction)
from oscar_mpc_planner_mr_modification_tpu.solver import State
from oscar_mpc_planner_mr_modification_tpu.types import (DynamicObstacle,
                                                         RealTimeData)
from oscar_mpc_planner_mr_modification_tpu.utils import default_settings


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def make_planner(clock, road_constraints=True, N=20):
    settings = default_settings(
        N=N, max_obstacles=2,
        guidance={"n_samples": 40, "longitudinal_goals": 2,
                  "vertical_goals": 3},
        contouring={"add_road_constraints": road_constraints})
    model, modules = configuration_tmpc_consistency_cost(settings)
    planner = build_planner(model, modules, settings, dtype=jnp.float64,
                            sqp_config=SQPConfig(n_sqp=6, n_qp_iter=12),
                            clock=clock)
    return planner, model, settings


def make_data(settings, state, N, dt, obstacle=(4.0, 0.0)):
    data = RealTimeData()
    data.robot_area = define_robot_area(
        settings["robot"]["length"], settings["robot"]["width"],
        settings["n_discs"])
    path_x = np.linspace(0.0, 25.0, 30)
    data.reference_path.x = list(path_x)
    data.reference_path.y = [0.0] * 30
    obs = DynamicObstacle(index=0, position=np.asarray(obstacle, dtype=float),
                          radius=0.35)
    obs.prediction = get_constant_velocity_prediction(
        np.asarray(obstacle, dtype=float), np.zeros(2), dt, N)
    data.dynamic_obstacles = ensure_obstacle_size(
        [obs], state, settings["max_obstacles"], N, dt)
    return data


def test_split_tick_matches_sync_exactly():
    """prepare + start + finish with the ACTUAL state must reproduce the
    serial solve_mpc bit-for-bit on the first tick, and to well under the
    1e-3 control-error gate afterwards (road constraints off: with them on,
    the serial path reads the freshly-shifted warmstart during update while
    the prepared path documents one-tick staleness there).

    Ticks past the first are NOT bitwise: the split path re-anchors the
    contouring progress in refresh_state, whose first anchor uses the
    hint-windowed closest-s search (the module's segment hint is already
    set by prepare) while the serial path's first anchor is a full-path
    search — the two agree to ~1e-6 in s, which the PRM's discrete goal
    grid and the f64 IP iteration then carry as O(1e-6) solution noise."""
    N, dt = 20, 0.2
    clock_a, clock_b = FakeClock(), FakeClock()
    pa, model, settings = make_planner(clock_a, road_constraints=False, N=N)
    pb, _, _ = make_planner(clock_b, road_constraints=False, N=N)

    sa, sb = State(model), State(model)
    for s in (sa, sb):
        s.set("v", 0.5)

    d0 = make_data(settings, sa, N, dt)
    pa.on_data_received(d0, "reference_path")
    pb.on_data_received(d0, "reference_path")

    for step in range(6):
        da = make_data(settings, sa, N, dt)
        db = make_data(settings, sb, N, dt)
        out_a = pa.solve_mpc(sa, da)

        # "Perfect prediction": a COPY of the actual state (real pipelined
        # use hands prepare a separate predicted-state object; update()
        # mutates it, e.g. the contouring progress anchor, and must not
        # touch the state that feeds xinit).
        pred = State(model)
        pred.set_array(sb.as_array())
        assert pb.prepare(pred, db)
        pb.solve_mpc_start(sb, db)
        out_b = pb.solve_mpc_finish()

        assert out_a.success == out_b.success
        assert out_a.exit_code == out_b.exit_code
        if out_a.success:
            assert out_a.selected_topology_id == out_b.selected_topology_id
            assert out_a.selected_planner_index == out_b.selected_planner_index
            za = pa.solver.get_output_trajectory()
            zb = pb.solver.get_output_trajectory()
            if step == 0:
                np.testing.assert_array_equal(za, zb)
            else:
                np.testing.assert_allclose(za, zb, atol=1e-4)
            a = pa.get_solution(0, "a")
            w = pa.get_solution(0, "w")
        else:
            a, w = -3.0, 0.0
        for s in (sa, sb):
            x_next = model.discrete_dynamics(
                jnp.asarray(s.as_array()), jnp.asarray([a, w]), dt)
            s.set_array(np.asarray(x_next))
        clock_a.t += dt
        clock_b.t += dt


def test_start_without_prepare_falls_back_inline():
    """solve_mpc_start with no staged prepare (or stale data object) runs the
    host half inline and still completes the tick."""
    N, dt = 20, 0.2
    clock = FakeClock()
    planner, model, settings = make_planner(clock, N=N)
    state = State(model)
    state.set("v", 0.5)
    data = make_data(settings, state, N, dt)
    planner.on_data_received(data, "reference_path")
    planner.solve_mpc_start(state, data)
    out = planner.solve_mpc_finish()
    assert out.success


def test_gate_failure_resolves_at_finish():
    N, dt = 20, 0.2
    clock = FakeClock()
    planner, model, settings = make_planner(clock, N=N)
    state = State(model)
    data = RealTimeData()  # no reference path, no obstacles: gate fails
    planner.solve_mpc_start(state, data)
    out = planner.solve_mpc_finish()
    assert not out.success
    assert not out.was_infeasible  # gated, not infeasible (planner.cpp:97-109)


def test_packed_solve_dispatch_fetch_equals_sync():
    """ops-level: the async halves of make_buffered_packed_solve return the
    same packed bytes as the one-shot call."""
    import jax

    from oscar_mpc_planner_mr_modification_tpu.benchmarks import (
        build_tmpc_fleet, tmpc_bench_ocp)
    from oscar_mpc_planner_mr_modification_tpu.ops.sqp import (
        make_buffered_packed_solve, make_sqp_solver)

    ocp, settings = tmpc_bench_ocp(N=8, n_paths=2)
    config = SQPConfig(n_sqp=3, n_qp_iter=6)
    raw = make_sqp_solver(ocp, config, dtype=jnp.float64)
    batched = jax.vmap(raw, in_axes=(0, None, 0))
    P = 3
    solve = make_buffered_packed_solve(
        batched, P, ocp.N, ocp.npar, ocp.nx, ocp.nvar, jnp.float64)

    params, xinit, z_init, _ = build_tmpc_fleet(ocp, settings, 1)
    p = np.asarray(params[0])  # (P, N, npar) with P=n_paths+1=3
    x = np.asarray(xinit[0])
    z = np.asarray(z_init[0])

    sync = solve(p, x, z)
    handle = solve.dispatch(p, x, z)
    fetched = solve.fetch(handle)
    np.testing.assert_array_equal(sync, fetched)

    # Eager-fetch thread variant (opt-in; measured net-slower on the GIL-
    # holding axon tunnel, kept for GIL-releasing transports): same bytes,
    # result pulled by a daemon thread joined in fetch().
    import os

    os.environ["TMPC_EAGER_FETCH"] = "1"
    try:
        handle = solve.dispatch(p, x, z)
        assert isinstance(handle, tuple), "eager dispatch returns thread box"
        np.testing.assert_array_equal(sync, solve.fetch(handle))
    finally:
        os.environ.pop("TMPC_EAGER_FETCH", None)


def test_prepared_fill_tracks_moving_obstacles():
    """Regression: the prepared parameter fill must reach the dispatched
    buffer every tick. Round-5 bug: prepare() filled solver.params directly,
    and the in-flight tick's finish then copied the WINNING planner's (old)
    parameters back over it (the reference's post-solve copy,
    guidance_constraints.cpp:520-522) — so obstacle parameters stayed frozen
    at their first-tick positions and the pipelined robot planned straight
    through a crossing pedestrian. Static-obstacle tests cannot catch this
    (frozen == correct); this one pins the dispatched ellipsoid column to
    the moving obstacle's true predicted position."""
    from oscar_mpc_planner_mr_modification_tpu.parallel import tmpc as tmpc_mod

    N, dt = 20, 0.2
    clock = FakeClock()
    planner, model, settings = make_planner(clock, N=N)
    reg = planner.solver.ocp.registry
    cx = reg.index("ellipsoid_obst_0_x")
    cy = reg.index("ellipsoid_obst_0_y")

    dispatched = []
    orig = tmpc_mod.TMPCOptimizer._dispatch_batch

    def spy(self, params, xinit, warmstarts):
        dispatched.append((params[0, 1, cx], params[0, 1, cy]))
        return orig(self, params, xinit, warmstarts)

    tmpc_mod.TMPCOptimizer._dispatch_batch = spy
    try:
        state = State(model)
        state.set("v", 0.5)
        pos = np.array([5.0, 3.0])
        vel = np.array([0.0, -1.0])  # crossing pedestrian

        def moving_data(st, t):
            d = RealTimeData()
            d.robot_area = define_robot_area(
                settings["robot"]["length"], settings["robot"]["width"],
                settings["n_discs"])
            d.reference_path.x = list(np.linspace(0.0, 25.0, 30))
            d.reference_path.y = [0.0] * 30
            obs = DynamicObstacle(index=0, position=pos + vel * t, radius=0.35)
            obs.prediction = get_constant_velocity_prediction(
                pos + vel * t, vel, dt, N)
            d.dynamic_obstacles = ensure_obstacle_size(
                [obs], st, settings["max_obstacles"], N, dt)
            return d

        data = moving_data(state, 0.0)
        planner.on_data_received(data, "reference_path")
        expected = []
        for step in range(8):
            # stage 1 reads prediction step 0 = the obstacle position at the
            # data's build time (tick k's data was built at t = k*dt)
            expected.append(pos + vel * clock.t)
            planner.solve_mpc_start(state, data)
            pred = planner.predicted_next_state(state)
            next_data = moving_data(pred, clock.t + dt)
            planner.prepare(pred, next_data)
            out = planner.solve_mpc_finish()
            assert out.success
            a = planner.get_solution(0, "a")
            w = planner.get_solution(0, "w")
            x_next = model.discrete_dynamics(
                jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt)
            state.set_array(np.asarray(x_next))
            clock.t += dt
            data = next_data
    finally:
        tmpc_mod.TMPCOptimizer._dispatch_batch = orig

    got = np.asarray(dispatched)
    np.testing.assert_allclose(got, np.asarray(expected), atol=1e-9)


def test_pipelined_closed_loop_with_prediction():
    """Full pipelined loop: tick k dispatches, tick k+1's host half is
    prepared from the planner's own one-step prediction while the solve is
    'in flight', then the readback completes the tick. Quality must match
    the serial loop on the jackalsimulator scenario."""
    N, dt = 20, 0.2
    clock = FakeClock()
    planner, model, settings = make_planner(clock, N=N)
    state = State(model)
    state.set("v", 0.5)
    obstacle = np.array([4.0, 0.0])

    d0 = make_data(settings, state, N, dt)
    planner.on_data_received(d0, "reference_path")
    data = d0

    min_dist, n_success = np.inf, 0
    for step in range(28):
        planner.solve_mpc_start(state, data)
        # Overlap window: stage the NEXT tick's host work from the predicted
        # state (on CPU there is no real flight; the code path is identical).
        pred = planner.predicted_next_state(state)
        next_data = make_data(settings, pred, N, dt)
        planner.prepare(pred, next_data)
        out = planner.solve_mpc_finish()

        if out.success:
            n_success += 1
            a = planner.get_solution(0, "a")
            w = planner.get_solution(0, "w")
        else:
            a, w = -3.0, 0.0
        x_next = model.discrete_dynamics(
            jnp.asarray(state.as_array()), jnp.asarray([a, w]), dt)
        state.set_array(np.asarray(x_next))
        clock.t += dt
        data = next_data
        min_dist = min(min_dist,
                       np.linalg.norm(state.get_position() - obstacle))

    assert n_success >= 20, f"solved {n_success}/28"
    assert state.get("x") > 5.0, f"did not progress: {state}"
    assert min_dist > 0.6, f"too close to obstacle: {min_dist:.2f}"
