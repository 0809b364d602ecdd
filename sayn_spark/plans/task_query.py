"""Task-selection query language (ref: utils/task_query.py:9-134):

    -t task          that task
    -t +task         task and its upstream closure
    -t task+         task and its downstream closure
    -t group:name    all tasks in YAML group `name`
    -t tag:name      all tasks tagged `name`
    -x ...           exclude (same grammar); include ∪, exclude −
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping

RE_TASK_QUERY = re.compile(
    r"^("
    r"(?!(group:|tag:))(?P<upstream>\+?)(?P<task>[a-zA-Z0-9][-_a-zA-Z0-9]*)(?P<downstream>\+?)|"
    r"group:(?P<group>[a-zA-Z0-9][-_a-zA-Z0-9]*)|"
    r"tag:(?P<tag>[a-zA-Z0-9][-_a-zA-Z0-9]*)"
    r")$"
)


class TaskQueryError(ValueError):
    pass


def get_query_component(tasks: Mapping[str, dict], query: str) -> list[dict]:
    """Parse one -t/-x item into task ops (ref: utils/task_query.py:20-85).

    ``tasks`` maps name -> {"group": str, "tags": [str]}.
    """
    match = RE_TASK_QUERY.match(query)
    if match is None:
        raise TaskQueryError(f"incorrect task query syntax {query!r}")
    parts = match.groupdict()

    if parts.get("tag") is not None:
        tag = parts["tag"]
        relevant = [k for k, v in tasks.items() if tag in v.get("tags", [])]
        if not relevant:
            raise TaskQueryError(f"undefined tag {tag!r}")
        return [{"task": t, "upstream": False, "downstream": False} for t in relevant]

    if parts.get("group") is not None:
        group = parts["group"]
        relevant = [k for k, v in tasks.items() if v.get("group") == group]
        if not relevant:
            raise TaskQueryError(f"undefined group {group!r}")
        return [{"task": t, "upstream": False, "downstream": False} for t in relevant]

    task = parts["task"]
    if task not in tasks:
        raise TaskQueryError(f"undefined task {task!r}")
    return [
        {
            "task": task,
            "upstream": parts["upstream"] == "+",
            "downstream": parts["downstream"] == "+",
        }
    ]


def get_query(
    tasks: Mapping[str, dict],
    include: Iterable[str] = (),
    exclude: Iterable[str] = (),
) -> tuple[list[dict], list[dict]]:
    """Parse full -t/-x lists (ref: utils/task_query.py:86-134)."""
    inc: list[dict] = []
    exc: list[dict] = []
    for q in include:
        inc.extend(get_query_component(tasks, q))
    for q in exclude:
        exc.extend(get_query_component(tasks, q))
    # de-duplicate keeping strongest flags
    def dedupe(ops: list[dict]) -> list[dict]:
        merged: dict[str, dict] = {}
        for op in ops:
            cur = merged.setdefault(
                op["task"], {"task": op["task"], "upstream": False, "downstream": False}
            )
            cur["upstream"] = cur["upstream"] or op["upstream"]
            cur["downstream"] = cur["downstream"] or op["downstream"]
        return list(merged.values())

    return dedupe(inc), dedupe(exc)
