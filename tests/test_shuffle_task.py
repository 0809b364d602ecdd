"""Lifecycle tests for the shuffle task: deterministic permutation
matching the oracle-verified q_epoch_shuffle design."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.shuffle import ShuffleTask

SF = "/root/testdata/sf0.001"


@pytest.fixture
def ctx(spark, tmp_path):
    return TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(parameters={}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=tmp_path,
    )


def _run(ctx, name, cfg):
    t = ShuffleTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


def _hv(seed, doc_id):
    return int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:15], 16)


def test_shuffle_is_the_seeded_permutation(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("sh_src", docs)
    _run(
        ctx,
        "sh",
        {"source": "sh_src", "destination": "sh_out", "seed": 42, "n_shards": 8},
    )
    rows = spark.table("sh_out").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r.hv == _hv(42, r.doc_id)
        assert r.shard == r.hv % 8
    # read order within a shard follows hv ascending (file sort order)
    shard0 = [
        r.hv for r in spark.table("sh_out").where("shard = 0").collect()
    ]
    # the table was written sortWithinPartitions(hv): per input split the
    # hv sequence is monotone; a full-shard read may interleave files, so
    # assert via the deterministic recomputation instead
    assert sorted(shard0) == sorted(
        _hv(42, r.doc_id) for r in rows if _hv(42, r.doc_id) % 8 == 0
    )

    # a different seed yields a different permutation of the same rows
    _run(
        ctx,
        "sh2",
        {"source": "sh_src", "destination": "sh2_out", "seed": 43, "n_shards": 8},
    )
    a = {r.doc_id: r.hv for r in rows}
    b = {r.doc_id: r.hv for r in spark.table("sh2_out").collect()}
    assert set(a) == set(b)
    assert a != b


def test_shuffle_config_validation(ctx):
    for cfg in ({}, {"source": "t"}, {"source": "t", "destination": "o", "n_shards": 0}):
        t = ShuffleTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()
