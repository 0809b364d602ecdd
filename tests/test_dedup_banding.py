"""Banded-candidate dedup must return EXACTLY the all-pairs result.

The round-3 rewrite replaced the standalone all-pairs SimHash and
embedding-cosine verifiers with banded/LSH-gated plans (equi-joins on
band keys, exact verify on candidates only).  Recall arguments:

- SimHash: pigeonhole — Hamming <= 6 over a 64-bit signature split into
  8 byte-bands leaves >= 2 bands untouched, so every qualifying pair
  shares a band.  Recall is exact by construction, for ANY data.
- Cosine: bit-identical vectors collide in every hyperplane table, and
  the qualifying pairs in the test corpora are all exact copies
  (asserted below), so LSH gating loses nothing here; the two-table
  union keeps the worst-case miss rate < 3% for barely-in-threshold
  pairs on adversarial data.

These tests run the demoted all-pairs helpers (kept exactly for this
purpose) against the registered banded queries at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sayn_spark.functions import REGISTRY
from sayn_spark.functions.dedup import (
    _cosine_allpairs,
    _cosine_corpus,
    _simhash_allpairs,
    _simhash_signatures,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_banded_simhash_equals_allpairs(spark):
    banded = REGISTRY["q_dedup_simhash"].fn(spark, SF)
    sig = _simhash_signatures(spark, SF)
    allpairs = _simhash_allpairs(sig)
    got = _rows(banded, ["id_a", "id_b", "hamming"])
    want = _rows(allpairs, ["id_a", "id_b", "hamming"])
    assert got == want
    assert len(got) > 0


def test_lsh_gated_cosine_equals_allpairs(spark):
    gated = REGISTRY["q_dedup_embedding_cosine"].fn(spark, SF)
    normed = _cosine_corpus(spark, SF)
    allpairs = _cosine_allpairs(normed)
    got = _rows(gated, ["id_a", "id_b", "cos"])
    want = _rows(allpairs, ["id_a", "id_b", "cos"])
    assert got == want
    assert len(got) > 0


def test_fan_out_guard_scales_with_source_size(spark):
    """_fan_out repartitions ONLY when the source file is too small to
    split into enough input partitions: tiny local files get full-width
    parallelism; a source whose estimated split count already covers the
    cluster width is passed through untouched (no extra shuffle)."""
    from sayn_spark.functions.dedup import _doc_corpus, _fan_out

    width = spark.sparkContext.defaultParallelism
    corpus = _doc_corpus(spark, SF, mutate=None)
    # tiny file (KBs) vs 128MB default maxPartitionBytes -> repartition
    out = _fan_out(corpus, spark, SF)
    assert out.rdd.getNumPartitions() == width

    # pretend partitions are 1KB: the same file now "splits" into far
    # more input partitions than cores -> passthrough, no Exchange
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        out2 = _fan_out(corpus, spark, SF)
        assert out2 is corpus
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_cosine_threshold_pairs_are_exact_copies(spark):
    """Documents the recall precondition: every >= 0.99 pair in the
    test corpus is a bit-identical copy (so deterministic LSH bucket
    collision is guaranteed, not probabilistic)."""
    normed = _cosine_corpus(spark, SF)
    pairs = _cosine_allpairs(normed)
    e = normed.select(F.col("vec_id"), F.col("e"))
    joined = (
        pairs.join(e.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea")), "id_a")
        .join(e.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb")), "id_b")
    )
    n_diff = joined.where(F.col("ea") != F.col("eb")).count()
    assert n_diff == 0
