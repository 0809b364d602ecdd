"""Task-DAG primitives: validation, toposort, closure queries.

Pure Python (no Spark) — mirrors the reference semantics of
`utils/dag.py:6-142`: a dag is ``{node: [parent, ...]}``; validation
rejects missing parents and cycles; topological_sort is Kahn-style and
also powers the "ready sets" used for concurrent execution (an
improvement over the reference's single-threaded loop,
`core/app.py:619`).
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Mapping, Sequence


class DagError(ValueError):
    pass


def validate_dag(dag: Mapping[str, Sequence[str]]) -> None:
    """Missing-parent + cycle detection (ref: utils/dag.py:6-58)."""
    missing = {
        (node, parent)
        for node, parents in dag.items()
        for parent in parents
        if parent not in dag
    }
    if missing:
        desc = ", ".join(f"{n} <- {p}" for n, p in sorted(missing))
        raise DagError(f"missing parents: {desc}")

    # iterative DFS cycle check
    WHITE, GREY, BLACK = 0, 1, 2
    color = {n: WHITE for n in dag}
    for root in dag:
        if color[root] != WHITE:
            continue
        stack: list[tuple[str, Iterable[str]]] = [(root, iter(dag[root]))]
        color[root] = GREY
        while stack:
            node, it = stack[-1]
            advanced = False
            for parent in it:
                if color[parent] == GREY:
                    raise DagError(f"cycle detected involving {parent!r}")
                if color[parent] == WHITE:
                    color[parent] = GREY
                    stack.append((parent, iter(dag[parent])))
                    advanced = True
                    break
            if not advanced:
                color[node] = BLACK
                stack.pop()


def topological_sort(dag: Mapping[str, Sequence[str]]) -> list[str]:
    """Kahn-style sort (ref: utils/dag.py:62-83); deterministic order
    (ties broken by insertion order of ``dag``)."""
    validate_dag(dag)
    pending = list(dag.keys())
    done: list[str] = []
    done_set: set[str] = set()
    while pending:
        progressed = False
        remaining = []
        for node in pending:
            if all(p in done_set for p in dag[node]):
                done.append(node)
                done_set.add(node)
                progressed = True
            else:
                remaining.append(node)
        pending = remaining
        if not progressed and pending:  # pragma: no cover (validate catches)
            raise DagError("dag has a cycle")
    return done


def _reverse(dag: Mapping[str, Sequence[str]]) -> dict[str, list[str]]:
    """parents->children map (ref: utils/misc.py:6-29)."""
    rev: dict[str, list[str]] = {n: [] for n in dag}
    for node, parents in dag.items():
        for p in parents:
            rev[p].append(node)
    return rev


def _closure(edges: Mapping[str, Sequence[str]], start: str) -> set[str]:
    seen: set[str] = set()
    q = deque(edges[start])
    while q:
        n = q.popleft()
        if n not in seen:
            seen.add(n)
            q.extend(edges[n])
    return seen


def upstream(dag: Mapping[str, Sequence[str]], node: str) -> set[str]:
    """All transitive parents (ref: utils/dag.py:87-93)."""
    return _closure(dag, node)


def downstream(dag: Mapping[str, Sequence[str]], node: str) -> set[str]:
    """All transitive children (ref: utils/dag.py:96-100)."""
    return _closure(_reverse(dag), node)


def query_dag(
    dag: Mapping[str, Sequence[str]],
    include: Iterable[dict],
    exclude: Iterable[dict],
) -> set[str]:
    """Apply parsed query operations (ref: utils/dag.py:103-142).

    Each op is {"task": name, "upstream": bool, "downstream": bool}.
    include ops union; exclude ops subtract.  Empty include = all tasks.
    """

    def expand(op: dict) -> set[str]:
        out = {op["task"]}
        if op.get("upstream"):
            out |= upstream(dag, op["task"])
        if op.get("downstream"):
            out |= downstream(dag, op["task"])
        return out

    include = list(include)
    selected = set(dag.keys()) if not include else set()
    for op in include:
        selected |= expand(op)
    for op in exclude:
        selected -= expand(op)
    return selected


def ready_sets(dag: Mapping[str, Sequence[str]]) -> list[list[str]]:
    """Topological *levels*: each level's tasks have all parents in
    earlier levels, so a level can run concurrently (thread pool over
    the shared SparkSession — Spark's scheduler is thread-safe).  This
    is the engine's improvement over the reference's sequential loop.
    """
    validate_dag(dag)
    level: dict[str, int] = {}
    for node in topological_sort(dag):
        level[node] = 1 + max((level[p] for p in dag[node]), default=-1)
    out: list[list[str]] = [[] for _ in range(max(level.values(), default=-1) + 1)]
    for node, lv in level.items():
        out[lv].append(node)
    return out
