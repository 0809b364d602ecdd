"""Copy-task tests (mirrors reference tests/test_task_copy.py:36-120+):
full copy, declared-DDL projection/rename, incremental merge incl. the
NULL-inc-key reload rule, append mode's _sayn_load_ts audit column, and
max_merge_rows chunking."""

from __future__ import annotations

import pytest

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.copy import LOAD_TS_COL, CopyTask


@pytest.fixture
def ctx(spark, tmp_path):
    return TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=tmp_path,
    )


def seed(db, table, rows, schema="id long, updated_at long, name string"):
    db.load_data(table, rows, schema=schema, replace=True)


def run_copy(ctx, name, cfg):
    t = CopyTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


def test_full_copy_with_ddl_rename(ctx, spark):
    seed(ctx.db, "cp_src", [{"id": 1, "updated_at": 1, "name": "a"}])
    run_copy(
        ctx,
        "cp1",
        {
            "source": {"table": "cp_src"},
            "destination": "cp_dst",
            "columns": [{"name": "id", "dst_name": "pk"}, {"name": "name"}],
        },
    )
    df = spark.table("cp_dst")
    assert df.columns == ["pk", "name"]
    assert [tuple(r) for r in df.collect()] == [(1, "a")]


def test_incremental_copy_merge_and_null_reload(ctx, spark):
    db = ctx.db
    seed(
        db,
        "cpi_src",
        [
            {"id": 1, "updated_at": 1, "name": "x"},
            {"id": 2, "updated_at": 2, "name": "y1"},
            {"id": 3, "updated_at": None, "name": "z"},
        ],
    )
    seed(
        db,
        "cpi_dst",
        [{"id": 1, "updated_at": 1, "name": "x"}, {"id": 2, "updated_at": None, "name": "y"}],
    )
    run_copy(
        ctx,
        "cpi",
        {
            "source": {"table": "cpi_src"},
            "destination": "cpi_dst",
            "incremental_key": "updated_at",
            "delete_key": "id",
        },
    )
    # dst max(updated_at)=1 -> loads id 1 (>=1), id 2 (>=1), id 3 (NULL);
    # merge replaces ids 1,2 and inserts 3
    assert [tuple(r) for r in spark.table("cpi_dst").orderBy("id").collect()] == [
        (1, 1, "x"),
        (2, 2, "y1"),
        (3, None, "z"),
    ]


def test_append_mode_adds_load_ts(ctx, spark):
    db = ctx.db
    seed(db, "cpa_src", [{"id": 1, "updated_at": 1, "name": "a"}])
    db.drop_object("cpa_dst")
    run_copy(
        ctx,
        "cpa",
        {
            "source": {"table": "cpa_src"},
            "destination": "cpa_dst",
            "incremental_key": "updated_at",
            "append": True,
        },
    )
    df = spark.table("cpa_dst")
    assert LOAD_TS_COL in df.columns  # ref: tasks/copy.py:458-461
    assert df.count() == 1
    # appending again re-loads rows >= max (inclusive) — appends, never merges
    run_copy(
        ctx,
        "cpa",
        {
            "source": {"table": "cpa_src"},
            "destination": "cpa_dst",
            "incremental_key": "updated_at",
            "append": True,
        },
    )
    assert spark.table("cpa_dst").count() == 2


def test_max_merge_rows_chunking(ctx, spark):
    db = ctx.db
    seed(db, "cpc_src", [{"id": i, "updated_at": i, "name": f"n{i}"} for i in range(1, 11)])
    seed(db, "cpc_dst", [{"id": 1, "updated_at": 1, "name": "n1"}])
    run_copy(
        ctx,
        "cpc",
        {
            "source": {"table": "cpc_src"},
            "destination": "cpc_dst",
            "incremental_key": "updated_at",
            "delete_key": "id",
            "max_merge_rows": 3,  # forces multiple bounded merge passes
        },
    )
    assert spark.table("cpc_dst").count() == 10
    assert [r.id for r in spark.table("cpc_dst").orderBy("id").collect()] == list(range(1, 11))


def test_validation_errors(ctx):
    with pytest.raises(ValueError, match="go together"):
        CopyTask(
            "bad", {"source": {"table": "s"}, "destination": "d", "incremental_key": "k"}, ctx
        ).config()
    with pytest.raises(ValueError, match="append excludes"):
        CopyTask(
            "bad2",
            {
                "source": {"table": "s"},
                "destination": "d",
                "incremental_key": "k",
                "delete_key": "id",
                "append": True,
            },
            ctx,
        ).config()


def test_copy_to_parquet_sink_partitioned(ctx, spark, tmp_path):
    """copy with a partitioned parquet sink destination (distributed
    export; partition dirs are prunable at read time)."""
    seed(ctx.db, "snk_src", [
        {"id": 1, "updated_at": 1, "name": "a"},
        {"id": 2, "updated_at": 1, "name": "b"},
        {"id": 3, "updated_at": 2, "name": "a"},
    ])
    out = str(tmp_path / "export")
    run_copy(ctx, "snk", {
        "source": {"table": "snk_src"},
        "destination": {"type": "parquet", "path": out, "partition_by": ["name"]},
    })
    back = spark.read.parquet(out)
    assert back.count() == 3
    import os
    assert sorted(d for d in os.listdir(out) if d.startswith("name=")) == ["name=a", "name=b"]


def test_copy_append_to_csv_sink(ctx, spark, tmp_path):
    seed(ctx.db, "csv_src", [{"id": 1, "updated_at": 1, "name": "x"}])
    out = str(tmp_path / "csv_out")
    cfg = {
        "source": {"table": "csv_src"},
        "destination": {"type": "csv", "path": out},
        "incremental_key": "updated_at",
        "append": True,
    }
    run_copy(ctx, "csvs", cfg)
    run_copy(ctx, "csvs", cfg)  # >= max reloads the boundary row, appends
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2
    assert "_sayn_load_ts" in back.columns


def test_copy_inc_to_file_sink_is_refused(ctx, tmp_path):
    with pytest.raises(ValueError, match="file sinks are append-only"):
        t = CopyTask("bad_sink", {
            "source": {"table": "snk_src"},
            "destination": {"type": "parquet", "path": str(tmp_path / "x")},
            "incremental_key": "updated_at",
            "delete_key": "id",
        }, ctx)
        t.config()
        t.run()


def test_append_schema_evolution(ctx, spark):
    """schema_evolution: appends may add new columns (mergeSchema)."""
    db = ctx.db
    seed(db, "se_src1", [{"id": 1, "updated_at": 1, "name": "a"}])
    db.drop_object("se_dst")
    cfg = {
        "source": {"table": "se_src1"},
        "destination": "se_dst",
        "incremental_key": "updated_at",
        "append": True,
        "schema_evolution": True,
    }
    run_copy(ctx, "se", cfg)
    # source gains a column; append must widen the destination
    db.load_data(
        "se_src2",
        [{"id": 2, "updated_at": 2, "name": "b", "extra": "new"}],
        schema="id long, updated_at long, name string, extra string",
        replace=True,
    )
    cfg2 = dict(cfg, source={"table": "se_src2"})
    run_copy(ctx, "se", cfg2)
    out = spark.table("se_dst")
    assert "extra" in out.columns
    assert out.count() == 2
    vals = {r.id: r.extra for r in out.collect()}
    assert vals[2] == "new" and vals[1] is None


def test_copy_to_orc_sink_roundtrip(ctx, spark, tmp_path):
    """ORC sink + source: the registry passes any Spark format string
    through, so columnar ORC export/import works like parquet (splittable,
    predicate-pushed at read)."""
    from sayn_spark.sources.registry import read_source

    seed(ctx.db, "orc_src", [
        {"id": 1, "updated_at": 1, "name": "a"},
        {"id": 2, "updated_at": 2, "name": "b"},
    ])
    out = str(tmp_path / "orc_out")
    run_copy(ctx, "orc", {
        "source": {"table": "orc_src"},
        "destination": {"type": "orc", "path": out},
    })
    back = read_source(spark, {"type": "orc", "path": out})
    assert sorted(r["name"] for r in back.collect()) == ["a", "b"]
    assert [f for f in __import__("os").listdir(out) if f.endswith(".orc") or f.startswith("part-")]
