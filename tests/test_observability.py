"""Observability subsystem tests: experiment recorder, scene capture/render,
dashboard, generated-map export."""

import json
import os

import numpy as np

import jax.numpy as jnp

from oscar_mpc_planner_mr_modification_tpu.dashboard import render_dashboard
from oscar_mpc_planner_mr_modification_tpu.metrics import MetricsLog, MPCMetrics
from oscar_mpc_planner_mr_modification_tpu.solver.ocp import save_maps
from oscar_mpc_planner_mr_modification_tpu.utils.datasaver import (
    DataSaver, ExperimentUtil)
from oscar_mpc_planner_mr_modification_tpu.utils.profiling import (
    BENCHMARKERS, Instrumentor, profile_scope)
from oscar_mpc_planner_mr_modification_tpu.utils.visualization import (
    SceneRecorder)


def test_experiment_util_segments_and_exports(tmp_path):
    from oscar_mpc_planner_mr_modification_tpu.models import (
        SecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.solver import State
    from oscar_mpc_planner_mr_modification_tpu.types import (PlannerOutput,
                                                             RealTimeData)

    util = ExperimentUtil({"recording": {
        "enable": True, "folder": str(tmp_path), "file": "exp",
        "timestamp": False, "num_experiments": 2}})
    state = State(SecondOrderUnicycleModel())
    data = RealTimeData()
    out = PlannerOutput()
    out.success = True
    out.exit_code = 1
    for ep in range(2):
        util.set_start_experiment(now=0.0)
        for it in range(5):
            util.update(state, data, out, runtime_s=0.01, now=it * 0.2)
        path = util.on_task_complete(completed=True, collisions=0, now=1.0)
    assert path is not None and os.path.exists(path)
    payload = json.load(open(path))
    assert len(payload["iteration"]) == 10
    assert payload["metric_completed"] == [True, True]
    s = util.summary()
    assert s["experiments"] == 2 and s["completion_rate"] == 1.0


def test_scene_recorder_json_and_png(tmp_path):
    from oscar_mpc_planner_mr_modification_tpu.models import (
        SecondOrderUnicycleModel)
    from oscar_mpc_planner_mr_modification_tpu.solver import State
    from oscar_mpc_planner_mr_modification_tpu.types import (DynamicObstacle,
                                                             RealTimeData)

    rec = SceneRecorder()
    state = State(SecondOrderUnicycleModel())
    state.set("x", 1.0)
    data = RealTimeData()
    data.goal = np.array([5.0, 0.0])
    data.goal_received = True
    data.dynamic_obstacles = [DynamicObstacle(0, np.array([3.0, 0.5]))]
    for t in range(3):
        rec.capture(t * 0.2, state, data)
    jpath = rec.save_json(str(tmp_path / "scene.json"))
    assert len(json.load(open(jpath))) == 3
    ppath = rec.render(str(tmp_path / "scene.png"))
    assert os.path.getsize(ppath) > 1000


def test_dashboard_renders():
    log = MetricsLog()
    log.add(MPCMetrics(robot_ns="jackal1", planner_state="PLANNING_ACTIVE",
                       solver_success=True, objective=1.5, velocity=1.2,
                       communicated=True, communication_trigger="TIME"))
    log.add(MPCMetrics(robot_ns="jackal2", planner_state="GOAL_REACHED"))
    text = render_dashboard(log)
    assert "jackal1" in text and "PLANNING_ACTIVE" in text
    assert "bandwidth saving" in text


def test_profiling_scopes_and_benchmarkers(tmp_path):
    Instrumentor.get().begin_session("test", str(tmp_path / "trace.json"))
    with profile_scope("outer"):
        b = BENCHMARKERS.get("unit")
        b.start()
        b.stop()
    Instrumentor.get().end_session()
    trace = json.load(open(tmp_path / "trace.json"))
    assert any(ev["name"] == "outer" for ev in trace["traceEvents"])
    assert BENCHMARKERS.get("unit").mean >= 0.0


def test_save_maps_round_trip(tmp_path):
    import yaml

    from oscar_mpc_planner_mr_modification_tpu.factory import (
        configuration_basic)
    from oscar_mpc_planner_mr_modification_tpu.solver import build_ocp
    from oscar_mpc_planner_mr_modification_tpu.utils import default_settings

    settings = default_settings()
    model, modules = configuration_basic(settings)
    ocp = build_ocp(model, modules, settings)
    paths = save_maps(ocp, str(tmp_path))
    pmap = yaml.safe_load(open(paths["parameter_map"]))
    mmap = yaml.safe_load(open(paths["model_map"]))
    ss = yaml.safe_load(open(paths["solver_settings"]))
    assert pmap["contour"] == ocp.registry.index("contour")
    assert mmap["x"][0] == "x" and mmap["a"][0] == "u"
    assert ss["npar"] == ocp.npar and ss["N"] == settings["N"]


def test_web_dashboard_serves_live_metrics():
    """dashboard_web.DashboardServer: the live (rqt-role) surface serves the
    page and a JSON snapshot of the same MetricsLog the terminal renderer
    reads, over real HTTP."""
    import urllib.request

    from oscar_mpc_planner_mr_modification_tpu.dashboard_web import (
        DashboardServer, snapshot)

    log = MetricsLog()
    log.add(MPCMetrics(robot_ns="jackal1", planner_state="PLANNING_ACTIVE",
                       solver_success=True, objective=1.5, velocity=1.2,
                       position_x=2.0, position_y=-0.5,
                       communicated=True, communication_trigger="TIME"))
    snap = snapshot(log)
    assert snap["robots"][0]["ns"] == "jackal1"
    assert snap["robots"][0]["x"] == 2.0

    server = DashboardServer(log).start()
    try:
        page = urllib.request.urlopen(server.url, timeout=5).read().decode()
        assert "fleet telemetry" in page and "metrics.json" in page
        data = json.loads(urllib.request.urlopen(
            server.url + "metrics.json", timeout=5).read())
        assert data["robots"][0]["state"] == "PLANNING_ACTIVE"
        assert data["robots"][0]["comm"] == "TIME"
        # Live: a new record is visible on the next poll without restart
        log.add(MPCMetrics(robot_ns="jackal2",
                           planner_state="GOAL_REACHED"))
        data = json.loads(urllib.request.urlopen(
            server.url + "metrics.json", timeout=5).read())
        assert [r["ns"] for r in data["robots"]] == ["jackal1", "jackal2"]
    finally:
        server.stop()
