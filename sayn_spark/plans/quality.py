"""Standard data-quality tests, generated as Spark plans.

The reference generates one SQL probe per declared column test —
`unique` / `not_null` / `allowed_values` — and UNION ALLs them; a test
passes iff the union returns zero rows (`database/__init__.py:239-288`,
`tasks/tests/standard_tests.sql:1-17`).  Same semantics here, but each
probe is a DataFrame agg so Catalyst fuses scan+filter+agg, and the
probes for one table share a single cached scan.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TEST_TYPES = ("unique", "not_null", "allowed_values")


def unique_violations(df: DataFrame, col: str) -> DataFrame:
    """GROUP BY col HAVING COUNT(*) > 1 (ref: standard_tests.sql:5-9)."""
    return (
        df.groupBy(F.col(col).cast("string").alias("col_value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .select(F.lit("unique").alias("test_type"), F.lit(col).alias("col_name"), "col_value", "cnt")
    )


def not_null_violations(df: DataFrame, col: str) -> DataFrame:
    """WHERE col IS NULL (ref: standard_tests.sql:10-12)."""
    return (
        df.where(F.col(col).isNull())
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 0)
        .select(
            F.lit("not_null").alias("test_type"),
            F.lit(col).alias("col_name"),
            F.lit(None).cast("string").alias("col_value"),
            "cnt",
        )
    )


def allowed_values_violations(df: DataFrame, col: str, allowed: Sequence[Any]) -> DataFrame:
    """WHERE col NOT IN (...) (ref: standard_tests.sql:13-16)."""
    return (
        df.where(~F.col(col).isin(list(allowed)) & F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("col_value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("allowed_values").alias("test_type"), F.lit(col).alias("col_name"), "col_value", "cnt")
    )


def standard_tests_plan(df: DataFrame, columns: list[dict]) -> DataFrame | None:
    """Build the UNION ALL of all declared column tests.

    ``columns`` mirrors the reference's DDL schema
    (`database/__init__.py:20-37`): ``[{"name": c, "tests": ["unique",
    "not_null", {"allowed_values": [...]}]}]``.  Returns None when no
    tests are declared.  Pass = returned plan evaluates to zero rows.
    """
    probes: list[DataFrame] = []
    for c in columns:
        name = c["name"]
        for t in c.get("tests", []):
            if isinstance(t, str):
                if t == "unique":
                    probes.append(unique_violations(df, name))
                elif t == "not_null":
                    probes.append(not_null_violations(df, name))
                else:
                    raise ValueError(f"unknown standard test {t!r}")
            # the opt-out must win over the test-kind match: a dict
            # carrying BOTH allowed_values and execute: False is a
            # disabled test, not a probe
            elif isinstance(t, dict) and t.get("execute") is False:
                continue
            elif isinstance(t, dict) and "allowed_values" in t:
                probes.append(allowed_values_violations(df, name, t["allowed_values"]))
            else:
                raise ValueError(f"unknown standard test {t!r}")
    if not probes:
        return None
    out = probes[0]
    for p in probes[1:]:
        out = out.unionByName(p)
    return out
