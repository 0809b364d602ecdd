"""Lifecycle tests for the decontaminate task: n-gram overlap against
a held-out set, checked against a DuckDB replica."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.decontaminate import DecontaminateTask

SF = "/root/testdata/sf0.001"
N = 8  # contamination n-gram size for the test corpus's doc lengths


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
    t = DecontaminateTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


@pytest.fixture
def tables(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # eval set: 8-token snippets from every 9th doc (token offset 2) —
    # those docs share an 8-gram with the eval set by construction
    ev = (
        docs.where(F.col("doc_id") % 9 == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.expr(
                "concat_ws(' ', slice(filter(split(lower(text), ' '), x -> x != ''), 3, 8))"
            ).alias("text"),
        )
        .where(F.expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 8)
    )
    ctx.db.replace_table("dc_src", docs)
    ctx.db.replace_table("dc_eval", ev)
    return docs, ev


def _duckdb_contaminated(n):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return {
        r[0]
        for r in con.execute(
            f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t FROM d
),
src_g AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - {n} + 1),
         i -> array_to_string(t[i:i+{n}-1], ' '))) AS g
  FROM toks WHERE len(t) >= {n}
),
ev_raw AS (
  SELECT array_to_string((list_filter(string_split(lower(text), ' '), x -> x <> ''))[3:10], ' ') AS text
  FROM d WHERE doc_id % 9 = 0
    AND len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 10
),
ev_toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS t FROM ev_raw
),
ev_g AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - {n} + 1),
         i -> array_to_string(t[i:i+{n}-1], ' '))) AS g
  FROM ev_toks WHERE len(t) >= {n}
)
SELECT DISTINCT doc_id FROM src_g WHERE g IN (SELECT g FROM ev_g)
"""
        ).fetchall()
    }


def test_decontaminate_drop_matches_duckdb(ctx, spark, tables):
    docs, ev = tables
    _run(
        ctx,
        "dc",
        {
            "source": "dc_src",
            "eval_table": "dc_eval",
            "destination": "dc_out",
            "ngram": N,
            "mode": "drop",
        },
    )
    kept = {r.doc_id for r in spark.table("dc_out").collect()}
    contaminated = _duckdb_contaminated(N)
    all_ids = {r.doc_id for r in docs.collect()}
    assert kept == all_ids - contaminated
    # the planted snippet donors are contaminated by construction
    donors = {r.eval_id for r in ev.collect()}
    assert donors <= contaminated
    assert len(kept) > 0


def test_decontaminate_flag_mode(ctx, spark, tables):
    docs, _ = tables
    _run(
        ctx,
        "dc_f",
        {
            "source": "dc_src",
            "eval_table": "dc_eval",
            "destination": "dc_f_out",
            "ngram": N,
            "mode": "flag",
        },
    )
    out = spark.table("dc_f_out")
    assert out.count() == docs.count()  # nothing dropped
    flagged = {r.doc_id for r in out.where("is_contaminated").collect()}
    assert flagged == _duckdb_contaminated(N)


def test_decontaminate_short_docs_never_contaminated(ctx, spark):
    src = spark.createDataFrame(
        [(1, "only three words"), (2, "a b c d e f g h i j")],
        schema="doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "only three words plus more to reach eight tokens total here")],
        schema="eval_id long, text string",
    )
    ctx.db.replace_table("dc_s_src", src)
    ctx.db.replace_table("dc_s_eval", ev)
    _run(
        ctx,
        "dc_s",
        {
            "source": "dc_s_src",
            "eval_table": "dc_s_eval",
            "destination": "dc_s_out",
            "ngram": 8,
        },
    )
    # doc 1 has < 8 tokens -> no 8-grams -> survives even though its
    # whole text is a substring of the eval doc
    assert {r.doc_id for r in spark.table("dc_s_out").collect()} == {1, 2}


def test_decontaminate_config_validation(ctx):
    for cfg in (
        {},
        {"source": "t"},
        {"source": "t", "eval_table": "e"},
        {"source": "t", "eval_table": "e", "destination": "o", "mode": "nope"},
        {"source": "t", "eval_table": "e", "destination": "o", "ngram": 0},
    ):
        t = DecontaminateTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_decontaminate_incremental_appends_only_new_ids(ctx, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ev = docs.where("doc_id % 9 = 0").select(F.col("text").alias("text"))
    ctx.db.replace_table("dc_inc_ev", ev)
    wave1 = docs.where("doc_id % 2 = 0")
    ctx.db.replace_table("dc_inc_src", wave1)
    cfg = {
        "source": "dc_inc_src",
        "eval_table": "dc_inc_ev",
        "destination": "dc_inc_out",
        "ngram": 8,
        "load_mode": "incremental",
    }
    _run(ctx, "dc_inc", cfg)
    first = {r.doc_id for r in spark.table("dc_inc_out").collect()}
    assert first
    # replay: no duplicates, same keep set
    _run(ctx, "dc_inc", cfg)
    rows = spark.table("dc_inc_out").groupBy("doc_id").count()
    assert rows.where("count > 1").count() == 0
    assert {r.doc_id for r in spark.table("dc_inc_out").collect()} == first
    # second wave: final state equals a full rebuild over the union
    ctx.db.replace_table("dc_inc_src", docs)
    _run(ctx, "dc_inc", cfg)
    _run(ctx, "dc_full", {**cfg, "load_mode": "full", "destination": "dc_full_out"})
    got = {r.doc_id for r in spark.table("dc_inc_out").collect()}
    want = {r.doc_id for r in spark.table("dc_full_out").collect()}
    assert got == want
    for t in ("dc_inc_ev", "dc_inc_src", "dc_inc_out", "dc_full_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_decontaminate_overlap_frac_vs_duckdb(ctx, spark):
    """min_overlap_frac switches to per-pair containment: checked
    against a DuckDB replica of the thresholded rule on a corpus with
    a full-overlap and a partial-overlap planted eval doc."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # eval doc A: a verbatim 12-token span (donors exceed any threshold);
    # eval doc B: 9 corpus tokens + 5 out-of-corpus tokens (only the
    # 2 prefix 8-grams of its 7 can hit -> frac 2/7 < 0.5)
    ev = (
        docs.where("doc_id % 9 = 0")
        .select(
            F.expr(
                "concat_ws(' ', slice(filter(split(lower(text), ' '), x -> x != ''), 3, 12))"
            ).alias("text")
        )
        .where(F.expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 12)
        .unionByName(
            docs.where("doc_id % 11 = 0")
            .select(
                F.expr(
                    "concat_ws(' ', concat(slice(filter(split(lower(text), ' '), x -> x != ''), 2, 9),"
                    " array('qz1','qz2','qz3','qz4','qz5')))"
                ).alias("text")
            )
            .where(F.expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 14)
        )
    )
    ctx.db.replace_table("dc_of_src", docs)
    ctx.db.replace_table("dc_of_ev", ev)
    _run(
        ctx,
        "dc_of",
        {
            "source": "dc_of_src",
            "eval_table": "dc_of_ev",
            "destination": "dc_of_out",
            "ngram": 8,
            "min_overlap_frac": 0.5,
        },
    )
    kept = {r.doc_id for r in spark.table("dc_of_out").collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    ev_pd = ev.toPandas()
    con.register("ev_docs", ev_pd)
    dropped = {
        r[0]
        for r in con.execute(
            """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t FROM d
),
src_g AS (
  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
         i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM toks WHERE len(t) >= 8
),
ev_toks AS (
  SELECT text AS ev_key, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM ev_docs
),
ev_g AS (
  SELECT DISTINCT ev_key, unnest(list_transform(generate_series(1, len(t) - 7),
         i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM ev_toks WHERE len(t) >= 8
),
ev_n AS (SELECT ev_key, COUNT(*) AS n_ev FROM ev_g GROUP BY ev_key),
m AS (
  SELECT s.doc_id, e.ev_key, COUNT(*) AS n_matched
  FROM src_g s JOIN ev_g e USING (g) GROUP BY s.doc_id, e.ev_key
)
SELECT DISTINCT m.doc_id FROM m JOIN ev_n n USING (ev_key)
WHERE m.n_matched * 1000000 >= n.n_ev * 500000
"""
        ).fetchall()
    }
    all_ids = {r.doc_id for r in docs.collect()}
    assert kept == all_ids - dropped
    # the partial-overlap eval doc alone drops nobody (its 2/7 frac is
    # below 0.5): most %11 donors survive — the handful that don't are
    # corpus near-dups that contain some OTHER doc's full 12-token
    # span (verified for this corpus: doc 77 carries doc 459's span)
    partial_only = {
        r.doc_id
        for r in docs.where("doc_id % 11 = 0 AND doc_id % 9 != 0").collect()
    }
    assert partial_only and len(partial_only - dropped) > len(partial_only) // 2
    # any-gram rule at the same ngram drops strictly more (the partial
    # prefix grams hit): sanity that the threshold is doing work
    _run(
        ctx,
        "dc_any",
        {
            "source": "dc_of_src",
            "eval_table": "dc_of_ev",
            "destination": "dc_any_out",
            "ngram": 8,
        },
    )
    kept_any = {r.doc_id for r in spark.table("dc_any_out").collect()}
    assert kept_any <= kept and kept_any != kept
    for t in ("dc_of_src", "dc_of_ev", "dc_of_out", "dc_any_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_decontaminate_overlap_frac_validation(ctx):
    for bad in (0, -0.2, 1.5):
        t = DecontaminateTask(
            "bad_frac",
            {
                "source": "t",
                "eval_table": "e",
                "destination": "o",
                "min_overlap_frac": bad,
            },
            ctx,
        )
        with pytest.raises(ValueError):
            t.config()


def test_decontaminate_incremental_with_overlap_frac(ctx, spark):
    """min_overlap_frac is per-(doc, eval-doc) — independent of the
    scored batch — so load_mode: incremental must equal a full rebuild
    over the union and replay as a no-op."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ev = docs.where("doc_id % 9 = 0").select(
        F.expr(
            "concat_ws(' ', slice(filter(split(lower(text), ' '), x -> x != ''), 3, 12))"
        ).alias("text")
    )
    ctx.db.replace_table("dcif_ev", ev)
    cfg = {
        "source": "dcif_src",
        "eval_table": "dcif_ev",
        "destination": "dcif_out",
        "ngram": 8,
        "min_overlap_frac": 0.5,
        "load_mode": "incremental",
    }
    spark.sql("DROP TABLE IF EXISTS dcif_out")
    ctx.db.replace_table("dcif_src", docs.where("doc_id % 2 = 0"))
    _run(ctx, "dcif", cfg)
    first = {r.doc_id for r in spark.table("dcif_out").collect()}
    _run(ctx, "dcif", cfg)  # replay: no-op
    assert {r.doc_id for r in spark.table("dcif_out").collect()} == first
    ctx.db.replace_table("dcif_src", docs)
    _run(ctx, "dcif", cfg)
    _run(ctx, "dcff", {**cfg, "load_mode": "full", "destination": "dcff_out"})
    got = {r.doc_id for r in spark.table("dcif_out").collect()}
    want = {r.doc_id for r in spark.table("dcff_out").collect()}
    assert got == want and first <= got
    for t in ("dcif_ev", "dcif_src", "dcif_out", "dcff_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_decontaminate_semantic_vs_duckdb(ctx, spark):
    """method=semantic: the task's kept set must equal a DuckDB replica
    of the cosine screen, on an eval set of TOKEN-REVERSED copies —
    zero shared 8-grams (the ngram method finds nothing), identical
    bags of words (the semantic method catches every donor)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ctx.db.replace_table("dsem_src", docs)
    rev = F.expr(
        "concat_ws(' ', reverse(filter(split(lower(text), ' '), x -> x != '')))"
    )
    ev = docs.where(F.col("doc_id") % 9 == 0).select(rev.alias("text"))
    ctx.db.replace_table("dsem_eval", ev)
    _run(
        ctx,
        "dsem",
        {
            "source": "dsem_src",
            "eval_table": "dsem_eval",
            "destination": "dsem_out",
            "method": "semantic",
            "min_cosine": 0.95,
        },
    )
    got = {r.doc_id for r in spark.table("dsem_out").collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )
    kept = {
        r[0]
        for r in con.execute(
            """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t FROM d
),
ev AS (SELECT doc_id AS eval_id, list_reverse(t) AS t FROM toks WHERE doc_id % 9 = 0),
src_b AS (
  SELECT doc_id AS id, (('0x' || substr(md5(tok), 1, 8))::BIGINT) % 64 AS bucket,
         COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY id, bucket
),
ev_b AS (
  SELECT eval_id, (('0x' || substr(md5(tok), 1, 8))::BIGINT) % 64 AS bucket,
         COUNT(*) AS cnt
  FROM (SELECT eval_id, unnest(t) AS tok FROM ev) GROUP BY eval_id, bucket
),
src_l2 AS (SELECT id, CAST(SUM(cnt*cnt) AS BIGINT) AS l2 FROM src_b GROUP BY id),
ev_l2 AS (SELECT eval_id, CAST(SUM(cnt*cnt) AS BIGINT) AS l2 FROM ev_b GROUP BY eval_id),
dots AS (
  SELECT s.id, e.eval_id, CAST(SUM(s.cnt*e.cnt) AS BIGINT) AS dot
  FROM src_b s JOIN ev_b e USING (bucket) GROUP BY s.id, e.eval_id
),
bad AS (
  SELECT DISTINCT d2.id FROM dots d2
  JOIN src_l2 a ON a.id = d2.id JOIN ev_l2 b ON b.eval_id = d2.eval_id
  WHERE 10000 * d2.dot * d2.dot >= 9025 * a.l2 * b.l2
)
SELECT doc_id FROM d WHERE doc_id NOT IN (SELECT id FROM bad)
            """
        ).fetchall()
    }
    assert got == kept
    # every reversed-copy donor was caught...
    donors = {r.doc_id for r in docs.where("doc_id % 9 = 0").collect()}
    assert not (donors & got)
    # ...while the ngram method is blind to the same eval set
    _run(
        ctx,
        "dsem_ng",
        {
            "source": "dsem_src",
            "eval_table": "dsem_eval",
            "destination": "dsem_ng_out",
            "ngram": 8,
        },
    )
    ng_kept = {r.doc_id for r in spark.table("dsem_ng_out").collect()}
    assert donors <= ng_kept  # reversal destroyed every 8-gram


def test_decontaminate_semantic_validation(ctx):
    bad = [
        {"source": "t", "eval_table": "e", "destination": "o",
         "method": "semantic", "min_overlap_frac": 0.5},
        {"source": "t", "eval_table": "e", "destination": "o",
         "method": "semantic", "ngram": 8},
        {"source": "t", "eval_table": "e", "destination": "o",
         "method": "semantic", "min_cosine": 0.955},  # off-grid
        {"source": "t", "eval_table": "e", "destination": "o",
         "method": "semantic", "min_cosine": 0.0},
        {"source": "t", "eval_table": "e", "destination": "o",
         "min_cosine": 0.9},  # semantic-only option
        {"source": "t", "eval_table": "e", "destination": "o",
         "method": "nope"},
    ]
    for cfg in bad:
        t = DecontaminateTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()
