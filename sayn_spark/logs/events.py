"""Event tracker: the run's event spine.

Re-expresses the reference's logging core
(/root/reference/sayn/logging/event_tracker.py:1-99 and
logging/task_event_tracker.py:1-90): an ``EventTracker`` owns the run
(run_id, current stage, ordered task list) and fans every event out to
registered loggers; each task gets a ``TaskEventTracker`` that stamps
task name/ordinal and tracks steps with durations.  Python tasks reach
it as ``self.tracker`` / the decorator's ``tracker`` argument — the
same surface the reference exposes (tasks/python.py:15-29).

Events are plain dicts: {event, context, stage, task?, duration?, ...,
run_id, project_name, ts}.  Loggers decide presentation; the tracker
never prints.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from typing import Any, Optional


class EventTracker:
    def __init__(
        self,
        run_id: Optional[str] = None,
        loggers: Optional[list] = None,
        project_name: str = "",
    ) -> None:
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.loggers = list(loggers or [])
        self.project_name = project_name
        self.tasks: list[str] = []
        self.current_stage: Optional[str] = None
        self._stage_start: Optional[datetime] = None
        self._broken_loggers: set[int] = set()  # warn once per faulty logger

    def register_logger(self, logger) -> None:
        self.loggers.append(logger)

    def close(self) -> None:
        """Close every logger that holds resources (file handles)."""
        for logger in self.loggers:
            close = getattr(logger, "close", None)
            if close is not None:
                close()

    def remove_logger(self, logger_type: type) -> None:
        self.loggers = [l for l in self.loggers if not isinstance(l, logger_type)]

    def set_tasks(self, tasks: list[str]) -> None:
        self.tasks = list(tasks)

    # -- stages (ref: logging/event_tracker.py:45-63) -------------------

    def start_stage(self, stage: str, **details: Any) -> None:
        self.current_stage = stage
        self._stage_start = datetime.now(timezone.utc)
        self.report_event(context="app", event="start_stage", **details)

    def finish_current_stage(self, **details: Any) -> None:
        start = self._stage_start or datetime.now(timezone.utc)
        duration = (datetime.now(timezone.utc) - start).total_seconds()
        self.report_event(
            context="app", event="finish_stage", duration=duration, **details
        )
        self.current_stage = None
        self._stage_start = None

    # -- task trackers (ref: logging/event_tracker.py:68-75) ------------

    def get_task_tracker(self, task_name: str) -> "TaskEventTracker":
        order = self.tasks.index(task_name) + 1 if task_name in self.tasks else None
        return TaskEventTracker(self, task_name, order)

    # -- fan-out (ref: logging/event_tracker.py:77-99) ------------------

    def report_event(self, **event: Any) -> None:
        event.setdefault("context", "app")
        event.setdefault("event", "unknown")
        if event["context"] == "task":
            event.setdefault("total_tasks", len(self.tasks))
        event.update(
            run_id=self.run_id,
            stage=self.current_stage,
            project_name=self.project_name,
            ts=datetime.now(timezone.utc),
        )
        for logger in self.loggers:
            # exception contract (hazard review r14): one faulty logger —
            # a user-registered one with a bug, a file handle on a full
            # disk — must neither kill the TASK whose lifecycle emitted
            # the event nor starve the loggers after it in the fan-out.
            # (The reference fans out unguarded: logging/event_tracker.py:
            # 97-99 — a logger bug there aborts the run.)
            try:
                logger.report_event(**event)
            except Exception as e:
                if id(logger) not in self._broken_loggers:
                    self._broken_loggers.add(id(logger))
                    import logging

                    logging.getLogger("sayn_spark").warning(
                        "logger %s raised %s reporting an event; its events "
                        "may be incomplete for this run (first failure: %s)",
                        type(logger).__name__,
                        type(e).__name__,
                        e,
                    )


class TaskEventTracker:
    """Per-task event facade (ref: logging/task_event_tracker.py).

    Task code only sees this: step bookkeeping with durations plus
    debug/info/warning/error messages, all stamped with the task's name
    and position in the run.
    """

    def __init__(self, tracker: EventTracker, task_name: str, task_order) -> None:
        self._tracker = tracker
        self._task_name = task_name
        self._task_order = task_order
        self._steps: list[str] = []
        self._current_step: Optional[str] = None
        self._step_start: Optional[datetime] = None

    def _report_event(self, event: str, **details: Any) -> None:
        details["event"] = event
        details["context"] = "task"
        details["task"] = self._task_name
        details["task_order"] = self._task_order
        details["step"] = self._current_step
        details["step_order"] = (
            self._steps.index(self._current_step) + 1
            if self._current_step in self._steps
            else None
        )
        details["total_steps"] = len(self._steps)
        self._tracker.report_event(**details)

    # -- lifecycle (called by App around setup/run/test) ----------------

    def start_task(self, **details: Any) -> None:
        self._report_event("start_task", **details)

    def finish_task(self, status: str, duration: float, **details: Any) -> None:
        self.finish_current_step()
        self._report_event("finish_task", status=status, duration=duration, **details)

    def skip_task(self, reason: str = "") -> None:
        self._report_event("skip_task", reason=reason)

    # -- steps (ref: task_event_tracker.py:40-76) -----------------------

    def set_run_steps(self, steps: list[str]) -> None:
        self._steps = list(steps)
        self._report_event("set_run_steps", steps=list(steps))

    def add_run_steps(self, steps) -> None:
        if isinstance(steps, str):
            steps = [steps]
        self._steps.extend(steps)
        self._report_event("set_run_steps", steps=list(steps))

    def start_step(self, step: str) -> None:
        self.finish_current_step()
        if step not in self._steps:
            self._steps.append(step)
        self._current_step = step
        self._step_start = datetime.now(timezone.utc)
        self._report_event("start_step")

    def finish_current_step(self, result: str = "ok") -> None:
        if self._current_step is None:
            return
        start = self._step_start or datetime.now(timezone.utc)
        duration = (datetime.now(timezone.utc) - start).total_seconds()
        self._report_event("finish_step", duration=duration, result=result)
        self._current_step = None
        self._step_start = None

    # -- messages (ref: task_event_tracker.py:78-90) --------------------

    def debug(self, message: str, **details: Any) -> None:
        self._report_event("message", level="debug", message=message, **details)

    def info(self, message: str, **details: Any) -> None:
        self._report_event("message", level="info", message=message, **details)

    def warning(self, message: str, **details: Any) -> None:
        self._report_event("message", level="warning", message=message, **details)

    def error(self, message: str, **details: Any) -> None:
        self._report_event("message", level="error", message=message, **details)
