"""Event tracker + loggers (ref: sayn/logging/event_tracker.py,
task_event_tracker.py): stage/task/step events with ordinals and
durations, fan-out to console/file/collecting loggers, and the App
wiring that emits them around task execution."""

from __future__ import annotations

import json

from sayn_spark.logs import (
    CollectingLogger,
    ConsoleLogger,
    EventTracker,
    FileLogger,
)


def _tracker():
    log = CollectingLogger()
    t = EventTracker(run_id="test-run", loggers=[log], project_name="proj")
    return t, log


def test_stage_and_task_events_with_durations():
    t, log = _tracker()
    t.set_tasks(["a", "b"])
    t.start_stage("run", total_tasks=2)
    ta = t.get_task_tracker("a")
    ta.start_task()
    ta.start_step("setup")
    ta.start_step("run")
    ta.finish_task("success", 1.5)
    tb = t.get_task_tracker("b")
    tb.skip_task(reason="parents: ['a']")
    t.finish_current_stage(summary="1 ok, 0 failed, 1 skipped ")

    evs = [(e["event"], e.get("task")) for e in log.events]
    assert evs == [
        ("start_stage", None),
        ("start_task", "a"),
        ("start_step", "a"),
        ("finish_step", "a"),  # setup finished by starting run
        ("start_step", "a"),
        ("finish_step", "a"),  # run finished by finish_task
        ("finish_task", "a"),
        ("skip_task", "b"),
        ("finish_stage", None),
    ]
    finish = [e for e in log.events if e["event"] == "finish_task"][0]
    assert finish["status"] == "success"
    assert finish["duration"] == 1.5
    assert finish["task_order"] == 1 and finish["total_tasks"] == 2
    assert all(e["run_id"] == "test-run" for e in log.events)
    assert all(e["project_name"] == "proj" for e in log.events)
    stage_finish = log.events[-1]
    assert stage_finish["duration"] >= 0
    # every event inside the stage carries the stage name
    assert all(e["stage"] == "run" for e in log.events[:-1])


def test_task_messages_and_step_orders():
    t, log = _tracker()
    t.set_tasks(["a"])
    t.start_stage("run")
    ta = t.get_task_tracker("a")
    ta.set_run_steps(["extract", "load"])
    ta.start_step("extract")
    ta.info("loaded 10 rows", rows=10)
    msg = [e for e in log.events if e["event"] == "message"][0]
    assert msg["level"] == "info" and msg["rows"] == 10
    assert msg["step"] == "extract" and msg["step_order"] == 1
    assert msg["total_steps"] == 2


def test_file_logger_writes_json_lines(tmp_path):
    path = tmp_path / "logs" / "run.log"
    t = EventTracker(run_id="r", loggers=[FileLogger(path)])
    t.start_stage("run")
    t.finish_current_stage(summary="0 ok ")
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    evs = [json.loads(l) for l in lines]
    assert evs[0]["event"] == "start_stage"
    assert evs[1]["event"] == "finish_stage"
    assert evs[1]["duration"] >= 0
    assert evs[0]["ts"]  # iso-stamped


def test_console_logger_lines(capsys):
    c = ConsoleLogger()
    t = EventTracker(run_id="r", loggers=[c], project_name="p")
    t.set_tasks(["a", "b"])
    t.start_stage("run", total_tasks=2)
    ta = t.get_task_tracker("a")
    ta.start_task()
    ta.finish_task("success", 0.42)
    tb = t.get_task_tracker("b")
    tb.finish_task("failed", 0.1, error="boom")
    t.finish_current_stage(summary="1 ok, 1 failed, 0 skipped ")
    out = capsys.readouterr().out
    assert "run: start (2 tasks)" in out
    assert "[1/2] OK     a (0.42s)" in out
    assert "[2/2] FAIL   b (0.10s): boom" in out
    assert "run: done 1 ok, 1 failed, 0 skipped" in out


def test_app_run_emits_event_stream(spark, tmp_path):
    from sayn_spark.core.app import App
    from sayn_spark.operators.base import RunArguments, TaskStatus

    proj = tmp_path / "p"
    (proj / "tasks").mkdir(parents=True)
    (proj / "sql").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "sql" / "ok.sql").write_text("SELECT 1 AS x")
    (proj / "sql" / "boom.sql").write_text("SELECT * FROM no_such_table_qq")
    (proj / "tasks" / "g.yaml").write_text(
        """
tasks:
  good: {type: sql, materialisation: table, file_name: ok.sql, destination: log_t1}
  bad: {type: sql, materialisation: table, file_name: boom.sql, destination: log_t2}
  child: {type: dummy, parents: [bad]}
"""
    )
    log = CollectingLogger()
    tracker = EventTracker(run_id="apprun", loggers=[log], project_name="p")
    app = App(
        proj, spark=spark, run_arguments=RunArguments(command="run"), tracker=tracker
    )
    statuses = app.run(parallel=False)
    assert statuses["good"] == TaskStatus.SUCCESS
    assert statuses["bad"] == TaskStatus.FAILED
    assert statuses["child"] == TaskStatus.SKIPPED

    by_event = {}
    for e in log.events:
        by_event.setdefault(e["event"], []).append(e)
    assert len(by_event["start_stage"]) == 1
    finished = {e["task"]: e for e in by_event["finish_task"]}
    assert finished["good"]["status"] == "success"
    assert finished["good"]["duration"] > 0
    assert finished["bad"]["status"] == "failed"
    assert "no_such_table_qq" in finished["bad"]["error"] or finished["bad"]["error"]
    assert by_event["skip_task"][0]["task"] == "child"
    assert "1 ok, 1 failed, 1 skipped" in by_event["finish_stage"][0]["summary"]
    # steps were tracked inside each executed task
    steps = [e for e in by_event.get("finish_step", []) if e["task"] == "good"]
    assert {e["step"] for e in steps} >= {"setup", "run"}


def test_python_task_logs_through_tracker(spark, tmp_path):
    from sayn_spark.core.app import App
    from sayn_spark.operators.base import RunArguments, TaskStatus

    proj = tmp_path / "pp"
    (proj / "tasks").mkdir(parents=True)
    (proj / "python").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "tasks" / "g.yaml").write_text("tasks: {}\n")
    (proj / "python" / "t.py").write_text(
        "from sayn_spark.operators import task\n"
        "@task(name='talker')\n"
        "def talker(context, tracker):\n"
        "    tracker.info('hello from task', rows=3)\n"
    )
    log = CollectingLogger()
    tracker = EventTracker(run_id="py", loggers=[log])
    app = App(
        proj, spark=spark, run_arguments=RunArguments(command="run"), tracker=tracker
    )
    statuses = app.run(parallel=False)
    assert statuses["talker"] == TaskStatus.SUCCESS
    msg = [e for e in log.events if e["event"] == "message"][0]
    assert msg["task"] == "talker" and msg["message"] == "hello from task"
    assert msg["rows"] == 3
