"""Declared-column (DDL) spec validation and application.

Re-expresses the reference's pydantic DDL models
(/root/reference/sayn/database/__init__.py:20-98): a task's ``columns``
list declares name / type / dst_name / description / tests per column,
with strict validation — unknown keys, duplicate column names, and
unknown test types are rejected loudly at config time, exactly like
pydantic's ``Extra.forbid`` models in the reference.

Application is Spark-side instead of templated CREATE TABLE DDL: the
declared projection (rename via ``dst_name``, cast via ``type``) is a
``select`` over the task's SELECT — Catalyst folds it into the scan, so
declared columns also act as column pruning at 100 TB.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COLUMN_KEYS = {"name", "type", "dst_name", "description", "tests"}
_TEST_KEYS = {"name", "allowed_values", "execute"}
_TEST_TYPES = {"unique", "not_null", "allowed_values"}


def validate_columns(columns: list, task_name: str) -> list[dict]:
    """Normalize + validate a task's ``columns`` spec.

    Accepts the reference's shapes: plain strings (name only), dicts
    with optional type/dst_name/description/tests, tests as strings or
    dicts (ref: database/__init__.py:19-37, 75-98).  Returns a list of
    normalized dicts.  Raises ValueError on anything malformed.
    """
    out: list[dict] = []
    seen: set[str] = set()
    for i, c in enumerate(columns or []):
        if isinstance(c, str):
            c = {"name": c}
        if not isinstance(c, dict):
            raise ValueError(
                f"task {task_name!r}: columns[{i}] must be a string or mapping, "
                f"got {type(c).__name__}"
            )
        extra = set(c) - _COLUMN_KEYS
        if extra:
            raise ValueError(
                f"task {task_name!r}: columns[{i}] has unknown keys {sorted(extra)} "
                f"(allowed: {sorted(_COLUMN_KEYS)})"
            )
        name = c.get("name")
        if not name or not isinstance(name, str):
            raise ValueError(f"task {task_name!r}: columns[{i}] needs a string 'name'")
        if name in seen:
            # ref: database/__init__.py:88-94 (columns_unique validator)
            raise ValueError(f"task {task_name!r}: duplicate column {name!r}")
        seen.add(name)
        tests = []
        for j, t in enumerate(c.get("tests", []) or []):
            if isinstance(t, str):
                t = {"name": t}
            if not isinstance(t, dict):
                raise ValueError(
                    f"task {task_name!r}: column {name!r} tests[{j}] must be a "
                    f"string or mapping"
                )
            extra = set(t) - _TEST_KEYS
            if extra:
                raise ValueError(
                    f"task {task_name!r}: column {name!r} tests[{j}] has unknown "
                    f"keys {sorted(extra)}"
                )
            # a test with allowed_values but no name IS the
            # allowed_values test (ref: database/__init__.py:44-56)
            ttype = t.get("name") or (
                "allowed_values" if t.get("allowed_values") is not None else None
            )
            if ttype not in _TEST_TYPES:
                raise ValueError(
                    f"task {task_name!r}: column {name!r} has unknown test "
                    f"{ttype!r} (allowed: {sorted(_TEST_TYPES)})"
                )
            if ttype == "allowed_values" and not t.get("allowed_values"):
                raise ValueError(
                    f"task {task_name!r}: column {name!r} allowed_values test "
                    f"needs a non-empty allowed_values list"
                )
            tests.append(
                {
                    "type": ttype,
                    "allowed_values": list(t.get("allowed_values") or []),
                    "execute": bool(t.get("execute", True)),
                }
            )
        out.append(
            {
                "name": name,
                "type": c.get("type"),
                "dst_name": c.get("dst_name"),
                "description": c.get("description"),
                "tests": tests,
            }
        )
    return out


def project_columns(df: DataFrame, columns: list[dict], task_name: str) -> DataFrame:
    """RESTRICTIVE projection for copy tasks: the destination gets
    exactly the declared columns, in declared order, cast and renamed
    (ref: tasks/copy.py:559-624 syncs the copied column set the same
    way).  A declared column missing from the source fails loudly."""
    if not columns:
        return df
    _check_declared_exist(df, columns, task_name)
    cols = []
    for c in columns:
        col = F.col(c["name"])
        if c.get("type"):
            col = col.cast(c["type"])
        cols.append(col.alias(c.get("dst_name") or c["name"]))
    return df.select(*cols)


def transform_columns(df: DataFrame, columns: list[dict], task_name: str) -> DataFrame:
    """IN-PLACE rename/cast for sql/autosql tasks: declared columns are
    cast to their declared type and renamed to ``dst_name``; undeclared
    columns pass through in position.  Mirrors the reference's CTAS
    semantics (templates/create_table.sql:22-33 — a declared column
    list never restricts the SELECT) while actually applying the
    rename/cast the reference only stores as metadata."""
    if not columns:
        return df
    _check_declared_exist(df, columns, task_name)
    by_name = {c["name"]: c for c in columns}
    out = []
    for name in df.columns:
        c = by_name.get(name)
        if c is None:
            out.append(F.col(name))
            continue
        col = F.col(name)
        if c.get("type"):
            col = col.cast(c["type"])
        out.append(col.alias(c.get("dst_name") or name))
    return df.select(*out)


def _check_declared_exist(df: DataFrame, columns: list[dict], task_name: str) -> None:
    missing = [c["name"] for c in columns if c["name"] not in set(df.columns)]
    if missing:
        raise ValueError(
            f"task {task_name!r}: declared columns {missing} not produced by "
            f"the query (got {df.columns})"
        )


def destination_columns(columns: list[dict]) -> list[dict]:
    """The spec as seen by the DESTINATION table: after apply_columns,
    tests and introspection address columns by their dst_name."""
    return [
        {**c, "name": c.get("dst_name") or c["name"], "dst_name": None}
        for c in columns
    ]


def tests_spec(columns: list[dict]) -> list[dict[str, Any]]:
    """Flatten to the quality-plan shape (plans/quality.py):
    [{"name": col, "tests": ["unique" | "not_null" |
    {"allowed_values": [...]}]}] with execute=False tests dropped and
    columns addressed by their destination (renamed) name."""
    out: list[dict[str, Any]] = []
    for c in destination_columns(columns):
        tests: list[Any] = []
        for t in c["tests"]:
            if not t.get("execute", True):
                continue
            if t["type"] == "allowed_values":
                tests.append({"allowed_values": t["allowed_values"]})
            else:
                tests.append(t["type"])
        if tests:
            out.append({"name": c["name"], "tests": tests})
    return out
