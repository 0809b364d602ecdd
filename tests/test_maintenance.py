"""Maintenance plans: small-file compaction and Morton (Z-order)
clustered writes — file-level effects verified against real parquet
output, not just plan strings."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sayn_spark.plans.maintenance import compact_table, zorder_by

SF = "/root/testdata/sf0.01"


def test_compact_table_reduces_files_and_keeps_rows(spark, tmp_path):
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    # simulate incremental-load accretion: 32 tiny files
    df.repartition(32).write.mode("overwrite").saveAsTable("frag_t")
    loc = spark.sql("DESCRIBE EXTENDED frag_t").where("col_name = 'Location'").collect()[0][
        "data_type"
    ].replace("file:", "")
    n_before = len([f for f in os.listdir(loc) if f.startswith("part-")])
    assert n_before >= 32

    n_files = compact_table(spark, "frag_t")
    assert n_files == 1  # 10k bigints << 128MB target
    loc2 = spark.sql("DESCRIBE EXTENDED frag_t").where("col_name = 'Location'").collect()[0][
        "data_type"
    ].replace("file:", "")
    n_after = len([f for f in os.listdir(loc2) if f.startswith("part-")])
    assert n_after == 1
    assert spark.table("frag_t").count() == 10000
    assert spark.table("frag_t").agg(F.sum("v")).collect()[0][0] == 9999 * 10000
    spark.sql("DROP TABLE frag_t")


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per parquet file, from footer statistics —
    the same stats Spark's scan uses to skip files."""
    spans = []
    for f in sorted(os.listdir(path)):
        if not f.startswith("part-") or not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_zorder_write_narrows_both_dimensions(spark, tmp_path):
    """After Z-ordering on (o_custkey, price_cents), BOTH columns'
    per-file spans must shrink vs a write sorted on o_custkey alone —
    that is the entire point: file skipping works on either predicate."""
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        )
    )
    n_files = 8
    single = str(tmp_path / "single")
    zord = str(tmp_path / "zorder")
    o.repartitionByRange(n_files, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(single)
    zorder_by(o, "o_custkey", "price_cents", n_files=n_files).write.parquet(zord)

    # same data either way
    assert (
        spark.read.parquet(zord).agg(F.sum("price_cents")).collect()[0][0]
        == o.agg(F.sum("price_cents")).collect()[0][0]
    )

    def avg_span(path, col):
        spans = _file_spans(path, col)
        return sum(hi - lo for lo, hi in spans) / len(spans)

    # single-column sort: custkey narrow, price spans ~full range per file
    # z-order: price spans must narrow a lot; custkey spans stay bounded
    assert avg_span(zord, "price_cents") < 0.7 * avg_span(single, "price_cents")
    full_cust = o.agg(F.max("o_custkey") - F.min("o_custkey")).collect()[0][0]
    assert avg_span(zord, "o_custkey") < 0.8 * full_cust


def test_zorder_plan_has_no_global_sort(spark):
    """The Morton scaling must come from a broadcast one-row bounds agg,
    never a single-partition global window."""
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", F.col("o_orderkey").alias("b")
    )
    df = zorder_by(o, "o_custkey", "b", n_files=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # no rank/ntile window over the data, and the sort is local
    # (global=false) above a range-partition exchange — the only
    # SinglePartition allowed is the one-row bounds aggregate
    assert "Window" not in plan
    assert "rangepartitioning(_z" in plan
    assert ", false, 0" in plan.split("Sort [_z")[1].splitlines()[0]
