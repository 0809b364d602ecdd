"""Jinja compilation layer (ref: utils/compiler.py:11-135).

Every task property and SQL file passes through Jinja with:
- project/task ``parameters`` (profile-overridable,
  ref core/settings.py:286-320)
- run-window globals ``full_load`` / ``start_dt`` / ``end_dt`` (dates
  rendered as quoted 'YYYY-MM-DD', ref utils/compiler.py:33-37)
- ``task.name`` / ``task.group`` (ref utils/compiler.py:127-135)
- ``src()`` / ``out()`` / ``config()`` macros injected per-task by the
  task wrapper (dependency capture + name rewriting,
  ref tasks/task_wrapper.py:438-457)

A second *prod* environment supports from_prod upstream reads
(ref utils/compiler.py:31-45).
"""

from __future__ import annotations

import datetime as dt
from types import SimpleNamespace
from typing import Any, Callable, Mapping, Optional

from jinja2 import Environment, StrictUndefined


def _render_date(v: Any) -> Any:
    if isinstance(v, (dt.date, dt.datetime)):
        d = v.date() if isinstance(v, dt.datetime) else v
        return f"'{d.isoformat()}'"
    return v


class Compiler:
    def __init__(
        self,
        parameters: Optional[Mapping[str, Any]] = None,
        prod_parameters: Optional[Mapping[str, Any]] = None,
        full_load: bool = False,
        start_dt: Optional[dt.date] = None,
        end_dt: Optional[dt.date] = None,
    ) -> None:
        yesterday = dt.date.today() - dt.timedelta(days=1)
        self.parameters = dict(parameters or {})
        self.prod_parameters = dict(prod_parameters or self.parameters)
        self.globals: dict[str, Any] = {
            "full_load": full_load,
            "start_dt": _render_date(start_dt or yesterday),
            "end_dt": _render_date(end_dt or yesterday),
        }
        self.env = Environment(undefined=StrictUndefined, keep_trailing_newline=True)

    def with_globals(self, **extra: Any) -> "Compiler":
        out = Compiler.__new__(Compiler)
        out.parameters = self.parameters
        out.prod_parameters = self.prod_parameters
        out.globals = {**self.globals, **extra}
        out.env = self.env
        return out

    def compile(self, template: str, use_prod_parameters: bool = False, **extra: Any) -> str:
        params = self.prod_parameters if use_prod_parameters else self.parameters
        ctx = {**params, **self.globals, **extra}
        return self.env.from_string(template).render(**ctx)

    def task_compiler(
        self,
        task_name: str,
        group: Optional[str] = None,
        src: Optional[Callable[[str], str]] = None,
        out: Optional[Callable[[str], str]] = None,
        config: Optional[Callable[..., str]] = None,
        task_parameters: Optional[Mapping[str, Any]] = None,
    ) -> "Compiler":
        """Per-task env with task.* and the src/out/config macros."""
        extra: dict[str, Any] = {
            "task": SimpleNamespace(name=task_name, group=group),
            **(task_parameters or {}),
        }
        if src is not None:
            extra["src"] = src
        if out is not None:
            extra["out"] = out
        if config is not None:
            extra["config"] = config
        return self.with_globals(**extra)
