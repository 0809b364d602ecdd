"""Deterministic sampling + sketch-estimation operators for
training-data pipelines.

Sampling uses content hashes, not RNG: a row is in the sample iff
md5(key) mod N == 0 — reproducible across engines, runs, and cluster
sizes (the property that matters when you re-materialise a 100 TB
sample and need the same rows back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sayn_spark.functions.dedup import (
    _N_HASHES,
    _SPARK_BASES,
    _SPARK_SIG,
    _SQL_SIG,
    _SQL_SHINGLES,
    _doc_corpus,
    _staged_shingles,
)
from sayn_spark.functions.registry import T, persist_tracked, register

# deterministic 1-in-5 bucket from the doc_id's md5
_SPARK_BUCKET = "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 5"
_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 5"


@register(
    "q_stratified_sample",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_total,
       COUNT(*) FILTER ({_SQL_BUCKET} = 0) AS n_sampled,
       ROUND(CAST(COUNT(*) FILTER ({_SQL_BUCKET} = 0) AS DOUBLE) / COUNT(*), 6) AS rate
FROM documents
GROUP BY lang
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: ~20% of documents per language
    stratum, membership decided by content hash (no RNG, no state).

    At 100 TB this is a pure map-side filter — no shuffle, no
    sampleBy() RNG whose results change with partitioning.
    """
    d = T(spark, sf_dir, "documents")
    in_sample = F.expr(_SPARK_BUCKET) == 0
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(in_sample.cast("long")).alias("n_sampled"),
        F.round(F.sum(in_sample.cast("long")).cast("double") / F.count(F.lit(1)), 6).alias(
            "rate"
        ),
    )


@register(
    "q_minhash_jaccard_estimate",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
),
shingled AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM corpus WHERE len({_SQL_SHINGLES}) > 0),
sigs AS (SELECT doc_id, sh, {_SQL_SIG} AS sig FROM shingled)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2])) AS DOUBLE)
             / {_N_HASHES}, 4) AS jaccard_est,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard_true
FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 100000
""",
)
def q_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch math check: MinHash signature agreement estimates Jaccard
    (E[matches/16] = J).  Computed for the planted near-dup pairs so
    estimate and truth sit side by side.
    """
    from sayn_spark.functions.dedup import _fan_out

    corpus = _fan_out(_doc_corpus(spark, sf_dir, mutate=" zz qq"), spark, sf_dir)
    shingled = _staged_shingles(corpus).where(F.size("sh") > 0)
    sigs = (
        shingled.select("doc_id", "sh", F.expr(_SPARK_BASES).alias("bases"))
        .select("doc_id", "sh", F.expr(_SPARK_SIG).alias("sig"))
    )
    # both join sides read this — persist or the signature pipeline
    # (shingle + 16 minhash perms) runs twice
    sigs = persist_tracked(sigs)
    a = sigs.alias("a")
    b = sigs.alias("b")
    est = F.round(
        F.expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), m -> m))").cast("double")
        / _N_HASHES,
        4,
    )
    common = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    true_j = F.round(
        common.cast("double") / (F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - common), 6
    )
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 100000).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        est.alias("jaccard_est"),
        true_j.alias("jaccard_true"),
    )


_N_SHARDS = 8


@register(
    "q_epoch_shuffle",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM documents
)
SELECT hv % {_N_SHARDS} AS shard, COUNT(*) AS n_docs,
       MIN(hv) AS min_hv, MAX(hv) AS max_hv,
       CAST(SUM(doc_id % 1000000007) AS BIGINT) AS id_sum,
       arg_min(doc_id, hv) AS first_doc
FROM h GROUP BY hv % {_N_SHARDS}
""",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + sharding: every document gets a
    pseudo-random-but-reproducible position hv = md5(seed|doc_id); shard
    = hv mod {_N_SHARDS}, within-shard read order = ascending hv.  The
    same seed always yields the same global permutation on any cluster
    size — how a 100 TB training corpus is re-shuffled per epoch without
    RNG state (write with repartition(shard) + sortWithinPartitions(hv);
    here we return per-shard counts, hash range, id checksum, and the
    first document in read order to pin the permutation).  The checksum
    sums ids mod 1e9+7 (the q_table_checksum shape): raw BIGINT id sums
    overflow on hash-derived ids at corpus scale (review r13, the
    label-prop convergence class).
    """
    d = T(spark, sf_dir, "documents")
    hv = F.expr(
        "cast(conv(substr(md5(concat('42|', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    )
    h = d.select("doc_id", hv.alias("hv"))
    return h.groupBy((F.col("hv") % _N_SHARDS).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("hv").alias("min_hv"),
        F.max("hv").alias("max_hv"),
        F.sum(F.col("doc_id") % 1000000007).alias("id_sum"),
        F.expr("min_by(doc_id, hv)").alias("first_doc"),
    )


_CAP_PER_SOURCE = 10


@register(
    "q_source_cap",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('cap|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM documents
),
ranked AS (
  SELECT doc_id, source, hv,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
  FROM h
)
SELECT doc_id, source, rk FROM ranked WHERE rk <= {_CAP_PER_SOURCE}
""",
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the RefinedWeb/C4 domain-frequency
    control: no single source (domain) may contribute more than
    {_CAP_PER_SOURCE} documents, and WHICH documents survive is decided
    by a seeded content hash, so the capped corpus is reproducible
    across engines, runs, and cluster sizes (a capped re-crawl keeps
    the same winners instead of re-rolling them).

    Scale: the rank-<=cap filter directly above a row_number window is
    rewritten by Catalyst into WindowGroupLimit (partial mode BEFORE
    the shuffle), so each map partition forwards at most cap rows per
    source — the shuffle moves O(partitions x sources x cap) slim rows
    no matter how skewed the source distribution is, never the full
    corpus.  Plan-pinned in tests/test_round7.py.
    """
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents")
    hv = F.expr(
        "cast(conv(substr(md5(concat('cap|', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    )
    w = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        d.select("doc_id", "source", hv.alias("hv"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _CAP_PER_SOURCE)
        .select("doc_id", "source", "rk")
    )


_WS_K = 100


@register(
    "q_weighted_sample_es",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, GREATEST(n_chars, 1) AS w,
         CAST(ROUND(-LN((('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                        / 4294967296.0) * 100000000) AS BIGINT) AS nlnu_i8
  FROM documents
),
ranked AS (
  SELECT doc_id, source, w,
         CAST((nlnu_i8 * 1000000) // w AS BIGINT) AS key_scaled,
         ROW_NUMBER() OVER (ORDER BY (nlnu_i8 * 1000000) // w, doc_id) AS rk
  FROM keyed
)
SELECT doc_id, source, w, key_scaled, rk FROM ranked WHERE rk <= {_WS_K}
""",
)
def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    (A-ES, 2006): each document draws key u^(1/w) with u from a seeded
    content hash and w = its character count; the {_WS_K} largest keys
    are the sample.  Equivalent (and implemented as) the {_WS_K}
    SMALLEST values of -ln(u)/w — the exponential-jumps formulation —
    so heavier documents are proportionally likelier to survive while
    the draw stays fully reproducible: no RNG, membership is a pure
    function of (seed, doc_id, weight), stable across engines, runs,
    and cluster sizes.  This is the quality-weighted subsampling step
    between scoring and training-mix assembly (sample by quality score
    instead of uniformly).

    Determinism: u is a 32-bit hash fraction; -ln(u) rounds ONCE into
    integer 1e-8 units (margin measured in
    tests/test_oracle_fragility.py), then the per-doc key is integer
    floor division of positive operands (Spark ``div`` == DuckDB
    ``//``), and ranking is integer with doc_id tie-break.

    Scale shape: the key is a map-side expression (no shuffle to draw
    it); rank-<=k over the global order compiles to WindowGroupLimit
    (per-partition partial top-k before the single-group exchange), so
    the shuffle carries O(partitions x k) slim rows.  At 100 TB swap
    the global top-k for a per-shard k (add shard to the partition
    key) or a threshold pass (take keys under a calibrated cutoff,
    one scan, no exchange at all)."""
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents")
    nlnu = F.expr(
        "cast(round(-ln((cast(conv(substr(md5(concat('ws|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) + 1)"
        " / 4294967296.0) * 100000000) as bigint)"
    )
    keyed = d.select(
        "doc_id",
        "source",
        F.expr("greatest(n_chars, 1)").alias("w"),
        nlnu.alias("nlnu_i8"),
    )
    w_rk = Window.orderBy(F.expr("(nlnu_i8 * 1000000) div w"), F.col("doc_id"))
    return (
        keyed.withColumn("key_scaled", F.expr("cast((nlnu_i8 * 1000000) div w as bigint)"))
        .withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") <= _WS_K)
        .select("doc_id", "source", "w", "key_scaled", "rk")
    )


_SPLIT_SQL_BUCKET = "(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 10"
_SPLIT_SPARK_BUCKET = (
    "cast(conv(substr(md5(concat('split|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 10"
)


@register(
    "q_train_val_test_split",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, lang,
         CASE WHEN {_SPLIT_SQL_BUCKET} < 8 THEN 'train'
              WHEN {_SPLIT_SQL_BUCKET} < 9 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
strata AS (SELECT lang, COUNT(*) AS n_lang FROM assigned GROUP BY lang)
SELECT a.split, a.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST((COUNT(*) * 1000) // s.n_lang AS BIGINT) AS share_permille,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM assigned a JOIN strata s USING (lang)
GROUP BY a.split, a.lang, s.n_lang
""",
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10 by content
    hash) with a per-stratum audit — the split step every supervised
    corpus needs, done the reproducible way: membership is a pure
    function of the document id (md5 bucket mod 10), so the split
    survives re-materialisation, engine changes, and cluster resizes,
    and a document can never migrate between splits when the corpus
    grows (the leakage mode RNG splits suffer).  The report shows, per
    (split, language): document count, realized permille of the
    stratum (integer floor — hash splits hit 800/100/100 only in
    expectation), and an id checksum pinning the exact membership.

    Scale shape: assignment is a map-side projection (zero shuffle to
    decide); the audit is one map-side-combinable aggregate plus a
    broadcast join of the stratum totals.  Writing the actual splits
    is `partitionBy(split)` on the same expression — still no
    shuffle."""
    d = T(spark, sf_dir, "documents")
    b = F.expr(_SPLIT_SPARK_BUCKET)
    split = (
        F.when(b < 8, "train").when(b < 9, "val").otherwise("test")
    )
    assigned = d.select("doc_id", "lang", split.alias("split"))
    strata = assigned.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    return (
        assigned.join(F.broadcast(strata), "lang")
        .groupBy("split", "lang", "n_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .select(
            "split",
            "lang",
            "n_docs",
            F.expr("cast((n_docs * 1000) div n_lang as bigint)").alias(
                "share_permille"
            ),
            "id_sum",
        )
    )
