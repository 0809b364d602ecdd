"""Bucketed tables co-locate joins: writing both sides bucketed on the
join key removes the Exchange from the join plan entirely — the
pre-partitioning strategy for repeatedly-joined 100 TB facts
(maps the reference's Redshift DISTKEY / BigQuery cluster DDL,
SURVEY §1.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sayn_spark.core.database import SparkDatabase


def test_bucketed_join_has_no_exchange(spark):
    db = SparkDatabase(spark)
    left = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    right = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    db.create_table("bk_left", left, bucket_by=(8, ["k"]), sort_by=["k"])
    db.create_table("bk_right", right, bucket_by=(8, ["k"]), sort_by=["k"])

    joined = (
        spark.table("bk_left")
        .hint("merge")  # force SMJ so bucketing (not broadcast) carries the join
        .join(spark.table("bk_right"), "k")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 1000

    # same join on unbucketed tables must shuffle — proves the assert bites
    db.create_table("nb_left", left)
    db.create_table("nb_right", right)
    plan2 = (
        spark.table("nb_left").hint("merge").join(spark.table("nb_right"), "k")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan2


def test_copy_from_parquet_file_source(spark, tmp_path):
    """copy task reading a parquet directory source via the source
    registry (the JDBC-less distributed copy path)."""
    from sayn_spark.core.compiler import Compiler
    from sayn_spark.core.objects import DbObjectCompiler
    from sayn_spark.operators import RunArguments, TaskContext
    from sayn_spark.operators.copy import CopyTask

    src_dir = tmp_path / "landing"
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    ).write.parquet(str(src_dir))

    ctx = TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={"landing": {"type": "parquet", "path": str(src_dir)}},
        project_dir=tmp_path,
    )
    t = CopyTask(
        "cp_file",
        {"source": {"connection": "landing"}, "destination": "cp_file_dst"},
        ctx,
    )
    t.config()
    t.run()
    assert spark.table("cp_file_dst").count() == 100
