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


def test_ann_vectors_and_dedup_bands_join_without_corpus_exchange(spark, tmp_path):
    """The task-built index tables are bucketed on their join keys, so
    a forced sort-merge probe join shuffles ONLY the probe side — the
    corpus side reads its buckets in place (one Exchange in the plan,
    vs two for an unbucketed control)."""
    from pathlib import Path

    from sayn_spark.core.compiler import Compiler
    from sayn_spark.core.objects import DbObjectCompiler
    from sayn_spark.operators import RunArguments, TaskContext
    from sayn_spark.operators.ann import AnnIndexTask
    from sayn_spark.streaming.materialise import dedup_ingest_batch

    db = SparkDatabase(spark)
    ctx = TaskContext(
        spark=spark,
        db=db,
        compiler=Compiler(parameters={}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=tmp_path,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    db.replace_table("bkt_emb", emb)
    t = AnnIndexTask(
        "bkt_ix", {"source": "bkt_emb", "index": "bkt_ix", "label_column": "label"}, ctx
    )
    t.config()
    t.run()

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    # bucketing only eliminates the scan-side exchange when bucket
    # count == spark.sql.shuffle.partitions; the session pins both at 32
    probes = spark.range(0, 50).select((F.col("id") % 16).alias("cell"))
    bucketed = probes.join(spark.table("bkt_ix_vectors").hint("merge"), "cell")
    db.create_table("bkt_ix_flat", spark.table("bkt_ix_vectors"))  # unbucketed control
    flat = probes.join(spark.table("bkt_ix_flat").hint("merge"), "cell")
    assert n_exchanges(bucketed) < n_exchanges(flat), (
        n_exchanges(bucketed),
        n_exchanges(flat),
    )

    # dedup band table: same property on (band_sig) probes
    for tbl in ("bkt_mh_idx", "bkt_mh_mt", "bkt_mh_bands"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    dedup_ingest_batch(
        docs.limit(100), 0, "bkt_mh_idx", "bkt_mh_mt", "/root/testdata/sf0.001",
        band_table="bkt_mh_bands",
    )
    bprobe = spark.table("bkt_mh_bands").select("band", "band_sig").limit(20)
    bjoin = bprobe.join(spark.table("bkt_mh_bands").hint("merge"), ["band_sig"])
    db.create_table("bkt_mh_bands_flat", spark.table("bkt_mh_bands"))
    fjoin = bprobe.join(spark.table("bkt_mh_bands_flat").hint("merge"), ["band_sig"])
    assert n_exchanges(bjoin) < n_exchanges(fjoin)
    for tbl in ("bkt_mh_idx", "bkt_mh_mt", "bkt_mh_bands", "bkt_mh_bands_flat"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
