"""Lifecycle tests for the YAML-native dedup task type
(operators/dedup.py): full-mode output must hash-match an independent
DuckDB-oracle + union-find model, and incremental mode must maintain
the signature/band index across runs with stable match results.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext
from sayn_spark.operators.dedup import DedupTask

SF = "/root/testdata/sf0.001"


@pytest.fixture
def ctx(spark, tmp_path):
    return TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(parameters={}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={"sf_dir": SF},
        connections={},
        project_dir=tmp_path,
    )


def _task(ctx, name, cfg):
    t = DedupTask(name, cfg, ctx)
    t.config()
    t.run()
    return t


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return parent


def _oracle_minhash_pairs(con, threshold):
    """DuckDB replica of the engine's minhash probe (same shingles,
    same LCG permutations, same bands) over view ``corpus``."""
    from sayn_spark.functions.dedup import (
        _N_HASHES,
        _SQL_MH_BANDS,
        _SQL_SHINGLES,
        _SQL_SIG,
    )

    sql = f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh FROM corpus WHERE len({_SQL_SHINGLES}) > 0
),
sigs AS (SELECT doc_id, {_SQL_SIG} AS sig FROM sh),
bands AS {_SQL_MH_BANDS.format(src="sigs")},
candidates AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id > b.doc_id
)
SELECT id_a, id_b FROM candidates
JOIN sigs sa ON sa.doc_id = id_a
JOIN sigs sb ON sb.doc_id = id_b
WHERE CAST(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) AS DOUBLE)
      / {_N_HASHES} >= {threshold}
"""
    return [(a, b) for a, b in con.execute(sql).fetchall()]


def test_dedup_task_full_exact(ctx, spark):
    """Exact dedup through the task layer: keeps one min-id doc per
    identical-text group — checked against a DuckDB hash-group oracle."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    ctx.db.replace_table("dd_exact_src", corpus)
    _task(
        ctx,
        "dd_exact",
        {"source": "dd_exact_src", "destination": "dd_exact_out", "method": "exact"},
    )
    got = {r.doc_id for r in spark.table("dd_exact_out").collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        r[0]
        for r in con.execute(
            """
            WITH corpus AS (
              SELECT doc_id, text FROM d
              UNION ALL SELECT doc_id + 100000, text FROM d)
            SELECT MIN(doc_id) FROM corpus GROUP BY md5(text)
            """
        ).fetchall()
    }
    assert got == want


def test_dedup_task_full_minhash_matches_oracle(ctx, spark):
    """Full-mode minhash dedup end-to-end: the task's kept set must
    equal DuckDB-oracle pairs -> union-find -> min-per-cluster — the
    registered-query oracle mechanism applied to the task layer."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zz qq")).alias("text"),
        )
    )
    ctx.db.replace_table("dd_mh_src", corpus)
    _task(
        ctx,
        "dd_mh",
        {
            "source": "dd_mh_src",
            "destination": "dd_mh_out",
            "method": "minhash",
            "threshold": 0.5,
        },
    )
    got = {r.doc_id for r in spark.table("dd_mh_out").collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW corpus AS SELECT doc_id, text FROM d "
        "UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM d"
    )
    pairs = _oracle_minhash_pairs(con, 0.5)
    parent = _union_find(pairs)
    all_ids = {r[0] for r in con.execute("SELECT doc_id FROM corpus").fetchall()}
    roots = {}
    for n in parent:
        x = n
        while parent[x] != x:
            x = parent[x]
        roots.setdefault(x, set()).add(n)
    dropped = {n for members in roots.values() for n in members} - set(roots)
    assert got == all_ids - dropped
    assert len(dropped) > 0  # the planted mutations actually deduped


def test_dedup_task_keep_best(ctx, spark):
    """keep=best retains the highest-score doc per cluster (ties ->
    lowest id), not the lowest id."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", 0.2),
        (2, "alpha beta gamma delta epsilon zeta eta theta", 0.9),
        (3, "alpha beta gamma delta epsilon zeta eta theta", 0.9),
        (4, "completely different text about storage engines and joins", 0.1),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string, quality double")
    ctx.db.replace_table("dd_best_src", df)
    _task(
        ctx,
        "dd_best",
        {
            "source": "dd_best_src",
            "destination": "dd_best_out",
            "method": "exact",
            "keep": "best",
            "score_column": "quality",
        },
    )
    got = {r.doc_id for r in spark.table("dd_best_out").collect()}
    assert got == {2, 4}


def test_dedup_task_config_validation(ctx):
    bad = [
        {},  # no source
        {"source": "t"},  # full mode without destination
        {"source": "t", "destination": "o", "method": "nope"},
        {"source": "t", "destination": "o", "keep": "best"},  # no score_column
        {"source": "t", "mode": "incremental"},  # no index/matches
        {
            "source": "t",
            "mode": "incremental",
            "index_table": "i",
            "matches_table": "m",
            "method": "jaccard",  # incremental requires minhash
        },
        {"source": "t", "destination": "o", "threshold": 1.5},
        {"source": "t", "destination": "o", "verify": "nope"},
        {"source": "t", "destination": "o", "method": "jaccard", "verify": "exact"},
    ]
    for cfg in bad:
        t = DedupTask("bad", cfg, ctx)
        with pytest.raises(ValueError):
            t.config()


def test_dedup_task_incremental_lifecycle(ctx, spark):
    """Two-run (plus rerun) lifecycle of the catalog-managed signature
    index: run 1 seeds index + bucketed band table, run 2 processes
    only the NEW source rows, reports the planted near-dups against the
    stored index, and grows both tables by exactly the novel docs;
    run 3 with an unchanged source is a no-op."""
    for t in (
        "dd_inc_src",
        "dd_inc_index",
        "dd_inc_index_bands",
        "dd_inc_matches",
        "dd_inc_out",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    cfg = {
        "source": "dd_inc_src",
        "mode": "incremental",
        "method": "minhash",
        "threshold": 0.5,
        "index_table": "dd_inc_index",
        "matches_table": "dd_inc_matches",
        "destination": "dd_inc_out",
    }

    # run 1: 80% of the corpus
    wave1 = docs.where(F.col("doc_id") % 10 < 8)
    ctx.db.replace_table("dd_inc_src", wave1)
    _task(ctx, "dd_inc", cfg)
    n1 = wave1.count()
    idx1 = spark.table("dd_inc_index").count()
    out1 = spark.table("dd_inc_out").count()
    assert idx1 + spark.table("dd_inc_matches").count() >= n1  # all docs accounted
    assert spark.table("dd_inc_index_bands").count() == idx1 * 4  # 4 bands/doc

    # run 2: source grows by the remaining 20% plus planted near-dups
    # of wave-1 docs — only the NEW rows form the batch
    wave2_new = docs.where(F.col("doc_id") % 10 >= 8).unionByName(
        wave1.where(F.col("doc_id") % 37 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat("text", F.lit(" zz")).alias("text"),
        )
    )
    ctx.db.replace_table("dd_inc_src", wave1.unionByName(wave2_new))
    _task(ctx, "dd_inc", cfg)
    matches2 = spark.table("dd_inc_matches").where("ingest_id = 1")
    planted = {
        r.doc_id + 300000
        for r in wave1.where(F.col("doc_id") % 37 == 0).collect()
    }
    caught = {r.batch_id for r in matches2.collect()}
    assert planted <= caught  # every planted near-dup found vs the stored index
    idx2 = spark.table("dd_inc_index").count()
    assert idx2 > idx1  # index grew by the novel docs
    assert spark.table("dd_inc_index_bands").count() == idx2 * 4
    # index ids and destination ids stay disjoint from the matched dups
    assert (
        spark.table("dd_inc_index")
        .join(matches2.select(F.col("batch_id").alias("doc_id")), "doc_id")
        .count()
        == 0
    )
    out2 = spark.table("dd_inc_out").count()
    assert out2 > out1

    # run 3: unchanged source -> empty batch -> nothing moves
    _task(ctx, "dd_inc", cfg)
    assert spark.table("dd_inc_index").count() == idx2
    assert spark.table("dd_inc_matches").where("ingest_id >= 2").count() == 0
    assert spark.table("dd_inc_out").count() == out2
    for t in (
        "dd_inc_src",
        "dd_inc_index",
        "dd_inc_index_bands",
        "dd_inc_matches",
        "dd_inc_out",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_band_table_self_heals(ctx, spark):
    """Simulated crash between the index append and the band append:
    the band table is rebuilt from index-minus-band-table on the next
    trigger, so corpus docs can never stay invisible to probes."""
    from pyspark.sql import functions as SF_

    from sayn_spark.streaming.materialise import dedup_ingest_batch

    idx, mt, bt = "heal_idx", "heal_mt", "heal_idx_bands"
    for t in (idx, mt, bt):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    texts = {
        1: "one two three four five six seven eight nine ten eleven twelve",
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        3: "red orange yellow green blue indigo violet crimson amber teal",
    }
    b0 = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    dedup_ingest_batch(b0, 0, idx, mt, SF, band_table=bt)
    assert spark.table(bt).count() == spark.table(idx).count() * 4

    # simulate the partial failure: band rows for doc 2 went missing
    ctx.db.replace_table(
        "heal_tmp", spark.table(bt).where(SF_.col("doc_id") != 2)
    )
    spark.sql(f"DROP TABLE {bt}")
    ctx.db.create_table(
        bt, spark.table("heal_tmp"), mode="overwrite", bucket_by=(32, ["band_sig"])
    )
    assert spark.table(bt).count() == (spark.table(idx).count() - 1) * 4

    # next trigger repairs the divergence while processing its own batch
    b1 = spark.createDataFrame(
        [(10, "totally different words about parquet shuffles and joins")],
        "doc_id long, text string",
    )
    dedup_ingest_batch(b1, 1, idx, mt, SF, band_table=bt)
    assert spark.table(bt).count() == spark.table(idx).count() * 4
    assert spark.table(bt).where(SF_.col("doc_id") == 2).count() == 4
    for t in (idx, mt, bt, "heal_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_destination_self_heals(ctx, spark):
    """Simulated crash before the destination append: the next run
    derives the destination from index-minus-destination, restoring
    the lost rows even though its batch is empty."""
    from pyspark.sql import functions as SF_

    for t in ("heal2_src", "heal2_idx", "heal2_idx_bands", "heal2_mt", "heal2_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").limit(50)
    ctx.db.replace_table("heal2_src", docs)
    cfg = {
        "source": "heal2_src",
        "mode": "incremental",
        "method": "minhash",
        "index_table": "heal2_idx",
        "matches_table": "heal2_mt",
        "destination": "heal2_out",
    }
    _task(ctx, "heal2", cfg)
    n_out = spark.table("heal2_out").count()
    victim = spark.table("heal2_out").select("doc_id").first().doc_id
    ctx.db.replace_table(
        "heal2_out",
        spark.table("heal2_out").where(SF_.col("doc_id") != victim),
        tmp_swap=True,
    )
    assert spark.table("heal2_out").count() == n_out - 1

    # unchanged source -> empty batch, but the destination still heals
    _task(ctx, "heal2", cfg)
    assert spark.table("heal2_out").count() == n_out
    assert spark.table("heal2_out").where(SF_.col("doc_id") == victim).count() == 1
    for t in ("heal2_src", "heal2_idx", "heal2_idx_bands", "heal2_mt", "heal2_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dedup_task_minhash_exact_verify(ctx, spark):
    """verify=exact: LSH candidates, but the EXACT shingle Jaccard
    decides — checked against a DuckDB replica that verifies candidates
    with list_intersect instead of the signature estimate."""
    from sayn_spark.functions.dedup import _SQL_MH_BANDS, _SQL_SHINGLES, _SQL_SIG

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zz qq")).alias("text"),
        )
    )
    ctx.db.replace_table("dd_ex_src", corpus)
    _task(
        ctx,
        "dd_ex",
        {
            "source": "dd_ex_src",
            "destination": "dd_ex_out",
            "method": "minhash",
            "verify": "exact",
            "threshold": 0.5,
        },
    )
    got = {r.doc_id for r in spark.table("dd_ex_out").collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW corpus AS SELECT doc_id, text FROM d "
        "UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM d"
    )
    pairs = [
        (a, b)
        for a, b in con.execute(
            f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh FROM corpus WHERE len({_SQL_SHINGLES}) > 0
),
sigs AS (SELECT doc_id, {_SQL_SIG} AS sig FROM sh),
bands AS {_SQL_MH_BANDS.format(src="sigs")},
candidates AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id > b.doc_id
)
SELECT id_a, id_b FROM candidates
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
"""
        ).fetchall()
    ]
    parent = _union_find(pairs)
    all_ids = {r[0] for r in con.execute("SELECT doc_id FROM corpus").fetchall()}
    roots = {}
    for n in parent:
        x = n
        while parent[x] != x:
            x = parent[x]
        roots.setdefault(x, set()).add(n)
    dropped = {n for members in roots.values() for n in members} - set(roots)
    assert got == all_ids - dropped
    assert len(dropped) > 0


def test_dedup_task_exact_null_texts_never_dedupe(ctx, spark):
    """Docs with NULL text are not copies of each other: md5(NULL) is
    NULL and a naive hash-group would collapse them into one cluster."""
    rows = [(1, "same words here"), (2, "same words here"), (3, None), (4, None)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    ctx.db.replace_table("dd_null_src", df)
    _task(
        ctx,
        "dd_null",
        {"source": "dd_null_src", "destination": "dd_null_out", "method": "exact"},
    )
    got = {r.doc_id for r in spark.table("dd_null_out").collect()}
    assert got == {1, 3, 4}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VOCAB = [f"t{i}" for i in range(10)]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=5, max_size=18),
        min_size=3,
        max_size=10,
    )
)
def test_dedup_task_jaccard_matches_model_on_random_corpora(spark, data):
    """Property: full-mode jaccard dedup == shingle-Jaccard edges ->
    union-find -> keep-min, computed by a pure-python model, on random
    dense-vocabulary corpora (exact verify — no LSH probability)."""
    from pathlib import Path

    from sayn_spark.core.compiler import Compiler
    from sayn_spark.core.objects import DbObjectCompiler
    from sayn_spark.functions.registry import release_persisted

    ctx = TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(parameters={}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=Path("/tmp"),
    )
    docs = {i: toks for i, toks in enumerate(data)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], schema="doc_id long, text string"
    )
    ctx.db.replace_table("pp_src", df)
    try:
        _task(
            ctx,
            "pp",
            {
                "source": "pp_src",
                "destination": "pp_out",
                "method": "jaccard",
                "threshold": 0.5,
            },
        )
        got = {r.doc_id for r in spark.table("pp_out").collect()}
    finally:
        release_persisted()

    def shingles(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in docs.items()}
    pairs = []
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                pairs.append((a, b))
    parent = _union_find(pairs)
    roots = {}
    for n in parent:
        x = n
        while parent[x] != x:
            x = parent[x]
        roots.setdefault(x, set()).add(n)
    dropped = {n for m in roots.values() for n in m} - set(roots)
    assert got == set(docs) - dropped


def test_incremental_short_docs_converge(ctx, spark):
    """Docs too short to shingle (< 3 tokens) or with NULL text carry
    no minhash signature, but must still reach the index (empty sig,
    no band rows) and the destination — and must LEAVE the batch, so
    an unchanged source stays a no-op instead of re-selecting them
    forever."""
    for t in ("short_src", "short_idx", "short_idx_bands", "short_mt", "short_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "hello world"),  # 2 tokens -> zero 3-shingles
        (3, None),  # NULL text
        (4, "alpha beta gamma delta epsilon zeta eta theta iota"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    ctx.db.replace_table("short_src", src)
    cfg = {
        "source": "short_src",
        "mode": "incremental",
        "method": "minhash",
        "index_table": "short_idx",
        "matches_table": "short_mt",
        "destination": "short_out",
    }
    _task(ctx, "short", cfg)
    idx = spark.table("short_idx")
    assert {r.doc_id for r in idx.collect()} == {1, 2, 3, 4}
    # sigless docs hold an empty signature and contribute no band rows
    assert idx.where("size(sig) = 0").count() == 2
    assert spark.table("short_idx_bands").where("doc_id in (2, 3)").count() == 0
    assert {r.doc_id for r in spark.table("short_out").collect()} == {1, 2, 3, 4}

    # rerun with an unchanged source: nothing moves, nothing re-probes
    _task(ctx, "short", cfg)
    assert spark.table("short_idx").count() == 4
    assert not ctx.db.table_exists("short_mt")  # no matches ever formed
    assert spark.table("short_out").count() == 4
    for t in ("short_src", "short_idx", "short_idx_bands", "short_mt", "short_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_band_heal_runs_before_probe(ctx, spark):
    """The crash-residue repair must precede the probe: if a prior run
    died between the index append and the band append, the VERY NEXT
    ingest containing a near-dup of the orphaned doc must still report
    the match (healing only at append time would mis-declare it novel
    one ingest too late — a permanent duplicate)."""
    from pyspark.sql import functions as SF_

    from sayn_spark.streaming.materialise import dedup_ingest_batch

    idx, mt, bt = "hb_idx", "hb_mt", "hb_idx_bands"
    for t in (idx, mt, bt, "hb_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    b0 = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten eleven"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    dedup_ingest_batch(b0, 0, idx, mt, SF, threshold=0.5, band_table=bt)

    # simulate the crash residue: doc 2 indexed but bandless
    ctx.db.replace_table("hb_tmp", spark.table(bt).where(SF_.col("doc_id") != 2))
    spark.sql(f"DROP TABLE {bt}")
    ctx.db.create_table(
        bt, spark.table("hb_tmp"), mode="overwrite", bucket_by=(32, ["band_sig"])
    )

    # the next batch holds a near-dup of the ORPHANED doc — the pre-probe
    # heal must make doc 2 visible to this very probe
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota kappa zz")],
        "doc_id long, text string",
    )
    dedup_ingest_batch(b1, 1, idx, mt, SF, threshold=0.5, band_table=bt)
    m = spark.table(mt).where("ingest_id = 1").collect()
    assert {(r.batch_id, r.corpus_id) for r in m} == {(10, 2)}
    # and doc 10 was NOT mis-admitted to the index
    assert spark.table(idx).where("doc_id = 10").count() == 0
    for t in (idx, mt, bt, "hb_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_destination_honours_table_properties(ctx, spark):
    """Incremental-mode destination writes pass table_properties
    through, same as full mode (bucketed catalog layout survives)."""
    for t in ("tp_src", "tp_idx", "tp_idx_bands", "tp_mt", "tp_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(30)
    )
    ctx.db.replace_table("tp_src", docs)
    cfg = {
        "source": "tp_src",
        "mode": "incremental",
        "method": "minhash",
        "index_table": "tp_idx",
        "matches_table": "tp_mt",
        "destination": "tp_out",
        "table_properties": {"bucket_by": ["doc_id"], "buckets": 8},
    }
    _task(ctx, "tp", cfg)
    ddl = spark.sql("SHOW CREATE TABLE tp_out").first()[0]
    assert "CLUSTERED BY" in ddl and "8 BUCKETS" in ddl
    for t in ("tp_src", "tp_idx", "tp_idx_bands", "tp_mt", "tp_out"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dedup_keep_soft_matches_registered_weights(ctx, spark):
    """keep: soft must keep every row and weight it 1e6/cluster_size —
    checked against an exact-text DuckDB replica."""
    import duckdb

    from sayn_spark.operators.dedup import DedupTask

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where("doc_id % 3 = 0").select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    ctx.db.replace_table("dsoft_src", corpus)
    t = DedupTask(
        "dsoft",
        {
            "source": "dsoft_src",
            "destination": "dsoft_out",
            "method": "exact",
            "keep": "soft",
        },
        ctx,
    )
    t.config()
    t.run()
    out = {r.doc_id: r.weight_ppm for r in spark.table("dsoft_out").collect()}
    assert len(out) == corpus.count()  # nothing dropped
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            """
WITH corpus AS (
  SELECT doc_id, text FROM d
  UNION ALL SELECT doc_id + 500000, text FROM d WHERE doc_id % 3 = 0
),
g AS (SELECT doc_id, md5(text) AS h FROM corpus WHERE text IS NOT NULL),
cs AS (SELECT h, COUNT(*) AS n FROM g GROUP BY h)
SELECT g.doc_id, CAST(1000000 // cs.n AS BIGINT) FROM g JOIN cs USING (h)
"""
        ).fetchall()
    }
    for d, w in want.items():
        assert out[d] == w, (d, out[d], w)
    # planted copies weigh <= 500000, and their originals match
    assert all(out[d + 500000] <= 500000 for d in range(0, 50, 3))


def test_dedup_keep_soft_validation(ctx):
    from sayn_spark.operators.dedup import DedupTask

    t = DedupTask(
        "bad_soft",
        {
            "source": "s",
            "index_table": "i",
            "matches_table": "m",
            "mode": "incremental",
            "keep": "soft",
        },
        ctx,
    )
    with pytest.raises(ValueError):
        t.config()
    t2 = DedupTask(
        "bad_soft2",
        {"source": "s", "destination": "d", "method": "passages", "keep": "soft"},
        ctx,
    )
    with pytest.raises(ValueError):
        t2.config()
