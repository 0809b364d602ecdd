"""Lifecycle tests for the chunk task: chunk text/counts must match a
DuckDB replica token-for-token."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.chunk import ChunkTask

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
    t = ChunkTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


def test_chunk_matches_duckdb_replica(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text", "lang")
    ctx.db.replace_table("ck_src", docs)
    _run(
        ctx,
        "ck",
        {
            "source": "ck_src",
            "destination": "ck_out",
            "chunk_tokens": 16,
            "stride": 8,
            "carry_columns": ["lang"],
        },
    )
    got = {
        (r.doc_id, r.chunk_index): (r.chunk_start, r.n_tokens, r.chunk_text, r.lang)
        for r in spark.table("ck_out").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM d WHERE text IS NOT NULL
),
starts AS (
  SELECT doc_id, lang, t, len(t) AS n, unnest(generate_series(1, len(t), 8)) AS s
  FROM toks WHERE len(t) >= 1
)
SELECT doc_id, (s - 1) // 8 AS chunk_index, s AS chunk_start,
       LEAST(16, n - s + 1) AS n_tokens,
       array_to_string(t[s:s+15], ' ') AS chunk_text, lang
FROM starts
"""
        ).fetchall()
    }
    assert got == want
    assert len(got) > len({k[0] for k in got})  # long docs really split


def test_chunk_overlap_and_tail(ctx, spark):
    """stride < chunk_tokens overlaps; the tail chunk is short but kept."""
    src = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], schema="doc_id long, text string"
    )
    ctx.db.replace_table("ck_o_src", src)
    _run(
        ctx,
        "ck_o",
        {"source": "ck_o_src", "destination": "ck_o_out", "chunk_tokens": 6, "stride": 4},
    )
    rows = {
        r.chunk_index: (r.chunk_start, r.n_tokens, r.chunk_text)
        for r in spark.table("ck_o_out").collect()
    }
    assert rows[0] == (1, 6, "w0 w1 w2 w3 w4 w5")
    assert rows[1] == (5, 6, "w4 w5 w6 w7 w8 w9")  # 2-token overlap
    assert rows[2] == (9, 2, "w8 w9")  # short tail kept
    assert len(rows) == 3


def test_chunk_config_validation(ctx):
    for cfg in (
        {},
        {"source": "t"},
        {"source": "t", "destination": "o", "chunk_tokens": 0},
        {"source": "t", "destination": "o", "chunk_tokens": 8, "stride": 0},
        {"source": "t", "destination": "o", "chunk_tokens": 8, "stride": 9},
    ):
        t = ChunkTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_chunk_incremental_appends_only_new_ids(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    wave1 = docs.where("doc_id % 2 = 0")
    ctx.db.replace_table("ck_inc_src", wave1)
    cfg = {
        "source": "ck_inc_src",
        "destination": "ck_inc_out",
        "chunk_tokens": 16,
        "stride": 12,
        "mode": "incremental",
    }
    _run(ctx, "ck_inc", cfg)
    first = spark.table("ck_inc_out").count()
    assert first > 0
    # replay with the same source: no duplicates
    _run(ctx, "ck_inc", cfg)
    assert spark.table("ck_inc_out").count() == first
    # second wave appends exactly the new docs' chunks, equal to a
    # full rebuild over the union
    ctx.db.replace_table("ck_inc_src", docs)
    _run(ctx, "ck_inc", cfg)
    _run(ctx, "ck_full", {**cfg, "mode": "full", "destination": "ck_full_out"})
    inc = sorted(
        tuple(r) for r in spark.table("ck_inc_out").collect()
    )
    full = sorted(
        tuple(r) for r in spark.table("ck_full_out").collect()
    )
    assert inc == full
    for t in ("ck_inc_src", "ck_inc_out", "ck_full_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_chunk_incremental_restricts_before_explode(ctx, spark):
    """The incremental anti-join must sit BELOW the Generate (explode)
    in the plan: Catalyst does not push a semi-join through Generate,
    so gating after the explode would re-tokenize and re-explode the
    entire source on every incremental run (ADVICE r6)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("ck_plan_src", docs.where("doc_id % 2 = 0"))
    cfg = {
        "source": "ck_plan_src",
        "destination": "ck_plan_out",
        "chunk_tokens": 16,
        "stride": 12,
        "mode": "incremental",
    }
    _run(ctx, "ck_plan", cfg)
    # second run: rebuild the incremental frame exactly as run() does
    # and inspect its optimized plan
    work = (
        spark.table("ck_plan_src")
        .where(F.col("text").isNotNull())
        .withColumn("_toks", F.expr("filter(split(lower(text), ' '), x -> x != '')"))
        .where(F.size("_toks") >= 1)
        .join(
            spark.table("ck_plan_out").select("doc_id").distinct(),
            "doc_id",
            "left_anti",
        )
    )
    out = work.select(
        "doc_id",
        F.explode(F.expr("sequence(1, size(_toks), 12)")).alias("chunk_start"),
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    gen = next(i for i, l in enumerate(lines) if "Generate" in l)
    anti = next(i for i, l in enumerate(lines) if "LeftAnti" in l)
    # plans print root-first: the join must appear BELOW the Generate
    # (i.e. inside its input), never above it
    assert anti > gen, plan
    for t in ("ck_plan_src", "ck_plan_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _cdc_model(text, divisor=16):
    import hashlib

    toks = [t for t in text.lower().split(" ") if t]
    chunks, cur, cur_start = [], [], 1
    for i, x in enumerate(toks, start=1):
        if not cur:
            cur_start = i
        cur.append(x)
        if int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % divisor == 0:
            chunks.append((cur_start, cur))
            cur = []
    if cur:
        chunks.append((cur_start, cur))
    return chunks


def test_chunk_cdc_matches_pure_python(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    ctx.db.replace_table("ckc_src", docs)
    _run(
        ctx,
        "ckc",
        {
            "source": "ckc_src",
            "destination": "ckc_out",
            "method": "cdc",
            "carry_columns": ["lang"],
        },
    )
    got = {}
    for r in spark.table("ckc_out").collect():
        got[(r.doc_id, r.chunk_index)] = (r.chunk_start, r.n_tokens, r.chunk_text, r.lang)
    src = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    want = {}
    for doc_id, (text, lang) in src.items():
        for idx, (start, toks) in enumerate(_cdc_model(text)):
            want[(doc_id, idx)] = (start, len(toks), " ".join(toks), lang)
    assert got == want and got
    # chunk text reassembles the document exactly
    by_doc = {}
    for (doc_id, idx), (_s, _n, txt, _l) in sorted(got.items()):
        by_doc.setdefault(doc_id, []).append(txt)
    for doc_id, parts in by_doc.items():
        toks = [t for t in src[doc_id][0].lower().split(" ") if t]
        assert " ".join(parts) == " ".join(toks)


def test_chunk_cdc_config_and_incremental(ctx, spark):
    from sayn_spark.operators.chunk import ChunkTask

    # window params are rejected for cdc
    t = ChunkTask(
        "ckc_bad",
        {"source": "s", "destination": "d", "method": "cdc", "chunk_tokens": 64},
        ctx,
    )
    with pytest.raises(ValueError, match="method fixed only"):
        t.config()

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    wave1 = docs.where("doc_id % 2 = 0")
    ctx.db.replace_table("ckci_src", wave1)
    cfg = {
        "source": "ckci_src",
        "destination": "ckci_out",
        "method": "cdc",
        "mode": "incremental",
    }
    _run(ctx, "ckci1", cfg)
    n1 = spark.table("ckci_out").count()
    ctx.db.replace_table("ckci_src", docs)
    _run(ctx, "ckci2", cfg)
    n2 = spark.table("ckci_out").count()
    assert n2 > n1
    # incremental == full rebuild over the union (row-local chunking)
    ctx.db.replace_table("ckci_full_src", docs)
    _run(ctx, "ckci_full", {**cfg, "destination": "ckci_full_out", "source": "ckci_full_src", "mode": "full"})
    a = {tuple(r) for r in spark.table("ckci_out").collect()}
    b = {tuple(r) for r in spark.table("ckci_full_out").collect()}
    assert a == b
    # replay: no-op
    _run(ctx, "ckci3", cfg)
    assert spark.table("ckci_out").count() == n2
