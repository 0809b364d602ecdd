"""Lifecycle tests for the embed task (operators/embed.py): the
feature-hash vectors must match a DuckDB replica bucket-for-bucket,
normalization must be exact, and the embed -> ann_index chain must
produce a searchable index whose results equal an in-test brute-force
over the same cells.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.ann import AnnIndexTask
from sayn_spark.operators.embed import EmbedTask

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


def _run(task_cls, ctx, name, cfg):
    t = task_cls(name, cfg, ctx)
    t.config()
    t.run()
    return t


def test_embed_feature_hash_matches_duckdb(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("em_src", docs)
    _run(
        EmbedTask,
        ctx,
        "em",
        {"source": "em_src", "destination": "em_out", "dim": 16},
    )
    got = {r.doc_id: list(r.embedding) for r in spark.table("em_out").collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want_rows = con.execute(
        """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
  FROM d
),
b AS (
  SELECT doc_id, (('0x' || substr(md5(t), 1, 8))::BIGINT) % 16 AS bucket FROM toks
),
c AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM b GROUP BY doc_id, bucket)
SELECT doc_id, bucket, cnt FROM c
"""
    ).fetchall()
    want: dict[int, list[float]] = {}
    for doc_id, bucket, cnt in want_rows:
        want.setdefault(doc_id, [0.0] * 16)[bucket] = float(cnt)
    assert got == want
    assert len(got) > 0


def test_embed_normalize_is_unit_length(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("em_n_src", docs.limit(50))
    _run(
        EmbedTask,
        ctx,
        "em_n",
        {"source": "em_n_src", "destination": "em_n_out", "dim": 16, "normalize": True},
    )
    for r in spark.table("em_n_out").collect():
        nrm = math.sqrt(sum(x * x for x in r.embedding))
        assert abs(nrm - 1.0) < 1e-9, r.doc_id


def test_embed_model_hook_raises(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("em_m_src", docs.limit(5))
    t = EmbedTask(
        "em_m",
        {"source": "em_m_src", "destination": "em_m_out", "method": "model"},
        ctx,
    )
    t.config()
    with pytest.raises(NotImplementedError, match="encoder"):
        t.run()


def test_embed_then_ann_index_chain(ctx, spark):
    """The declarative chain: embed -> ann_index -> search.  The
    index's nprobe=1 answers must equal an in-test brute-force top-3
    cosine restricted to each query's cell."""
    from sayn_spark.functions.similarity import ann_index_search

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("ch_src", docs)
    _run(
        EmbedTask,
        ctx,
        "ch_embed",
        {"source": "ch_src", "destination": "ch_emb", "dim": 64},
    )
    _run(
        AnnIndexTask,
        ctx,
        "ch_index",
        {"source": "ch_emb", "index": "ch_ix", "n_cells": 8, "id_column": "doc_id"},
    )
    queries = (
        spark.table("ch_emb")
        .where(F.col("doc_id") < 10)
        .select(F.col("doc_id").alias("query_id"), F.col("embedding").alias("e"))
    )
    got = {
        (r.query_id, r.rk): (r.neighbor_id, r.cos)
        for r in ann_index_search(spark, "ch_ix", queries, k=3, nprobe=1).collect()
    }

    vec = {r.vec_id: (r.cell, list(r.e)) for r in spark.table("ch_ix_vectors").collect()}
    import itertools

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nb), 6)

    for r in queries.collect():
        qid, qe = r.query_id, list(r.e)
        qcell = vec[qid][0]
        scored = sorted(
            (
                (-cos(qe, e), nid)
                for nid, (cell, e) in vec.items()
                if cell == qcell and nid != qid
            ),
        )[:3]
        for rk, (negc, nid) in enumerate(scored, start=1):
            assert got[(qid, rk)] == (nid, -negc), (qid, rk)


def test_embed_config_validation(ctx):
    for cfg in (
        {},
        {"source": "t"},
        {"source": "t", "destination": "o", "method": "bert"},
        {"source": "t", "destination": "o", "dim": 0},
    ):
        t = EmbedTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_embed_incremental_appends_only_new_rows(ctx, spark):
    """mode=incremental: a grown source re-encodes ONLY the new ids;
    reruns with an unchanged source are no-ops (replay-safe append)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    cfg = {
        "source": "em_i_src",
        "destination": "em_i_out",
        "dim": 16,
        "mode": "incremental",
    }
    spark.sql("DROP TABLE IF EXISTS em_i_out")
    wave1 = docs.where(F.col("doc_id") % 2 == 0)
    ctx.db.replace_table("em_i_src", wave1)
    _run(EmbedTask, ctx, "em_i", cfg)
    n1 = spark.table("em_i_out").count()
    assert n1 == wave1.count()
    first = {r.doc_id: list(r.embedding) for r in spark.table("em_i_out").collect()}

    ctx.db.replace_table("em_i_src", docs)
    _run(EmbedTask, ctx, "em_i", cfg)
    assert spark.table("em_i_out").count() == docs.count()
    # existing rows untouched (no re-encode, no duplicates)
    after = {r.doc_id: list(r.embedding) for r in spark.table("em_i_out").collect()}
    assert all(after[d] == v for d, v in first.items())

    _run(EmbedTask, ctx, "em_i", cfg)  # unchanged source -> no-op
    assert spark.table("em_i_out").count() == docs.count()
    spark.sql("DROP TABLE IF EXISTS em_i_out")


def test_embed_srp_dim_projects_with_seeded_table(ctx, spark):
    """srp_dim output must equal the seeded sign table applied to the
    UNPROJECTED embedding (numpy replica), and normalize must act on
    the projected space."""
    import numpy as np

    from sayn_spark.functions.similarity import srp_sign_table

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("em_srp_src", docs.limit(50))
    base_cfg = {
        "source": "em_srp_src",
        "destination": "em_srp_base",
        "dim": 32,
    }
    _run(EmbedTask, ctx, "em_b", base_cfg)
    _run(
        EmbedTask,
        ctx,
        "em_p",
        {**base_cfg, "destination": "em_srp_out", "srp_dim": 8},
    )
    base = {r.doc_id: np.array(r.embedding) for r in spark.table("em_srp_base").collect()}
    proj = {r.doc_id: np.array(r.embedding) for r in spark.table("em_srp_out").collect()}
    signs = srp_sign_table(8, 32)
    assert set(base) == set(proj)
    for d, v in base.items():
        want = signs @ v
        assert proj[d].shape == (8,)
        assert np.allclose(proj[d], want, rtol=0, atol=1e-9), d
    # normalize composes after projection: unit norm in the 8-dim space
    _run(
        EmbedTask,
        ctx,
        "em_pn",
        {**base_cfg, "destination": "em_srp_n", "srp_dim": 8, "normalize": True},
    )
    for r in spark.table("em_srp_n").collect():
        nrm = math.sqrt(sum(x * x for x in r.embedding))
        assert len(r.embedding) == 8 and abs(nrm - 1.0) < 1e-9
    for t in ("em_srp_src", "em_srp_base", "em_srp_out", "em_srp_n"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_embed_srp_dim_validation(ctx):
    for bad in (0, 64, 65):
        t = EmbedTask(
            "bad_srp",
            {"source": "s", "destination": "d", "dim": 64, "srp_dim": bad},
            ctx,
        )
        with pytest.raises(ValueError):
            t.config()
