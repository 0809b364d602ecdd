"""Correctness queries that exercise the engine's own relational logic
(not user SQL): incremental merge, incremental extraction, standard
data-quality tests.  Each has a handwritten DuckDB oracle that encodes
the reference semantics independently of the engine code under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sayn_spark.functions.registry import T, register
from sayn_spark.functions.relational import dec
from sayn_spark.plans.materialise import incremental_filter, merge_dataframes
from sayn_spark.plans.quality import standard_tests_plan


@register(
    "q_incremental_merge",
    oracle="""
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS totalprice,
         CAST(o_orderdate AS DATE) AS orderdate
  FROM orders WHERE o_orderkey % 3 = 0
), dst AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS totalprice,
         CAST(o_orderdate AS DATE) AS orderdate
  FROM orders
)
SELECT * FROM dst WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = dst.o_orderkey)
UNION ALL
SELECT * FROM src
""",
)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-materialisation merge semantics (ref:
    tasks/autosql.py:349-358 + merge_tables.sql:1-12).

    dst = current orders table; src = a simulated update batch (every
    3rd order with a repriced total).  The merge must replace exactly
    the src keys and keep everything else.
    """
    o = T(spark, sf_dir, "orders")
    dst = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(dec("o_totalprice"), 2).cast("double").alias("totalprice"),
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )
    src = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(dec("o_totalprice") * F.lit(1.1).cast("decimal(3,1)"), 2)
            .cast("double")
            .alias("totalprice"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
    )
    return merge_dataframes(dst, src, delete_key="o_orderkey")


@register(
    "q_incremental_extract",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01' OR o_orderdate IS NULL
""",
)
def q_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental extraction predicate incl. the NULL-reload rule
    (ref: tasks/copy.py:668-675).  Pushes to the parquet scan."""
    o = T(spark, sf_dir, "orders")
    filtered = incremental_filter(o, "o_orderdate", "2000-01-01", include_null=True)
    return filtered.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        F.round(dec("o_totalprice"), 2).cast("double").alias("totalprice"),
    )


@register(
    "q_standard_tests",
    oracle="""
SELECT 'unique' AS test_type, 'c_custkey' AS col_name,
       CAST(c_custkey AS VARCHAR) AS col_value, COUNT(*) AS cnt
FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1
UNION ALL
SELECT 'not_null', 'c_custkey', NULL, COUNT(*)
FROM customer WHERE c_custkey IS NULL HAVING COUNT(*) > 0
UNION ALL
SELECT 'allowed_values', 'o_orderstatus', o_orderstatus, COUNT(*)
FROM orders WHERE o_orderstatus NOT IN ('F', 'O') AND o_orderstatus IS NOT NULL
GROUP BY o_orderstatus
""",
)
def q_standard_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-test generation (ref: database/__init__.py:239-288).

    customer.c_custkey: unique + not_null (expected clean -> no rows);
    orders.o_orderstatus restricted to {F, O} so the 'P' rows surface
    as allowed_values violations — exercising the failure path too.
    """
    cust = standard_tests_plan(
        T(spark, sf_dir, "customer"),
        [{"name": "c_custkey", "tests": ["unique", "not_null"]}],
    )
    orders = standard_tests_plan(
        T(spark, sf_dir, "orders"),
        [{"name": "o_orderstatus", "tests": [{"allowed_values": ["F", "O"]}]}],
    )
    assert cust is not None and orders is not None
    return cust.unionByName(orders)
