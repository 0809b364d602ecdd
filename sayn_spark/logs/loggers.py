"""Loggers: event consumers for the EventTracker fan-out.

Three implementations mirroring the reference's set
(/root/reference/sayn/logging/console_logger.py, file_logger.py):

- ConsoleLogger — human-readable per-task lines with ordinals and
  durations plus a stage summary (the reference's non-fancy console).
- FileLogger — one JSON object per line, machine-readable run log.
- CollectingLogger — in-memory list, used by tests to assert the event
  stream.

The "fancy" live-updating TTY logger is intentionally not ported: it is
terminal-control presentation (cursor movement via its vendored ansi
helpers), meaningless for a batch engine's CI logs; its information
content (per-task progress/durations) is fully carried by the console
lines and JSON events here.
"""

from __future__ import annotations

import json
from typing import Any, Optional, TextIO


class Logger:
    def report_event(self, **event: Any) -> None:
        raise NotImplementedError

    def close(self) -> None:
        """Release any resources (file handles); default is a no-op."""


def _fmt_duration(seconds: Optional[float]) -> str:
    if seconds is None:
        return ""
    return f"{seconds:.2f}s" if seconds < 60 else f"{int(seconds // 60)}m{seconds % 60:.0f}s"


class ConsoleLogger(Logger):
    """Per-event console lines:

        [sayn-spark] run: start (7 tasks)
        [sayn-spark] run> [1/7] load_sources ...
        [sayn-spark] run> [1/7] OK     load_sources (0.42s)
        [sayn-spark] run: done 6 ok, 1 failed, 0 skipped (12.3s)
    """

    def __init__(self, debug: bool = False) -> None:
        self.is_debug = debug

    def print(self, line: str) -> None:  # split out for test capture
        print(f"[sayn-spark] {line}", flush=True)

    def report_event(self, **event: Any) -> None:
        ev = event.get("event")
        stage = event.get("stage") or "app"
        if ev == "message":
            if event.get("level") == "debug" and not self.is_debug:
                return
            task = f"{event['task']}: " if event.get("task") else ""
            self.print(f"{stage}: {event.get('level', 'info').upper()} {task}{event.get('message', '')}")
        elif ev == "start_stage":
            n = event.get("total_tasks")
            self.print(f"{stage}: start" + (f" ({n} tasks)" if n is not None else ""))
        elif ev == "finish_stage":
            summary = event.get("summary", "")
            self.print(
                f"{stage}: done {summary}({_fmt_duration(event.get('duration'))})".replace("  ", " ")
            )
        elif ev == "start_task":
            self.print(f"{stage}> {self._ord(event)} {event['task']} ...")
        elif ev == "finish_task":
            status = event.get("status", "?").upper()
            label = {"SUCCESS": "OK    ", "FAILED": "FAIL  "}.get(status, status)
            err = f": {event['error']}" if event.get("error") else ""
            self.print(
                f"{stage}> {self._ord(event)} {label} {event['task']} "
                f"({_fmt_duration(event.get('duration'))}){err}"
            )
        elif ev == "skip_task":
            self.print(f"{stage}> {self._ord(event)} SKIP   {event['task']}")
        elif ev == "finish_step" and self.is_debug:
            self.print(
                f"{stage}> {event['task']}: step {event.get('step')} "
                f"({_fmt_duration(event.get('duration'))})"
            )

    @staticmethod
    def _ord(event: dict) -> str:
        if event.get("task_order") and event.get("total_tasks"):
            return f"[{event['task_order']}/{event['total_tasks']}]"
        return "[-]"


class FileLogger(Logger):
    """JSON-lines run log (ref: logging/file_logger.py — the reference
    appends formatted text; JSON lines carry the same fields and stay
    parseable)."""

    def __init__(self, path, stream: Optional[TextIO] = None) -> None:
        self.path = path
        self._stream = stream
        self._owns_stream = stream is None
        if stream is None:
            from pathlib import Path

            p = Path(path)
            p.parent.mkdir(parents=True, exist_ok=True)
            self._stream = open(p, "a", encoding="utf-8")

    def report_event(self, **event: Any) -> None:
        # local capture: close() can run from another thread between the
        # None check and the write (a straggler task finishing after the
        # app closed the tracker) — a closed stream drops the event like
        # the None path does, instead of raising into the task thread
        stream = self._stream
        if stream is None:
            return  # closed — drop late events rather than raise
        event["ts"] = event["ts"].isoformat() if event.get("ts") else None
        try:
            stream.write(json.dumps(event, default=str) + "\n")
            stream.flush()
        except ValueError:
            pass  # stream closed mid-write; the event is late, drop it

    def close(self) -> None:
        # only close a stream this logger opened; injected streams
        # (tests passing StringIO) belong to the caller
        if self._owns_stream and self._stream is not None:
            self._stream.close()
        self._stream = None

    def __enter__(self) -> "FileLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class CollectingLogger(Logger):
    def __init__(self) -> None:
        self.events: list[dict] = []

    def report_event(self, **event: Any) -> None:
        self.events.append(event)
