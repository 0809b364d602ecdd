"""Regression tests for the round-3 advisory findings:

1. ``_fan_out`` must survive unit-suffixed ``maxPartitionBytes`` values
   ("128m", "1g") and must size directory-style parquet datasets by
   summing part files, not by the directory dentry size.
2. ``_simhash_signatures`` must drop zero-token documents (they would
   otherwise share an all-zero signature, collide in every band, and
   diverge from the DuckDB oracle whose ``unnest`` drops them).
3. Query-builder ``persist()`` calls are tracked and releasable so
   long-lived sessions don't accumulate cached partitions.
4. ``FileLogger`` owns its file handle: ``close()`` releases it, App
   teardown invokes it, and a closed logger drops late events.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sayn_spark.functions.dedup import (
    _dataset_bytes,
    _fan_out,
    _parse_byte_string,
    _simhash_allpairs,
    _simhash_signatures,
)

SF = "/root/testdata/sf0.001"


# -- 1. byte-string parsing and directory sizing ------------------------


def test_parse_byte_string_units():
    assert _parse_byte_string("134217728") == 134217728
    assert _parse_byte_string("128m") == 128 * 1024**2
    assert _parse_byte_string("128mb") == 128 * 1024**2
    assert _parse_byte_string("64MB") == 64 * 1024**2
    assert _parse_byte_string("1g") == 1024**3
    assert _parse_byte_string("512k") == 512 * 1024
    assert _parse_byte_string("10b") == 10
    # unparseable values fall back to the 128 MiB default, never raise
    assert _parse_byte_string("weird") == 134217728
    assert _parse_byte_string("") == 134217728
    assert _parse_byte_string(None) == 134217728
    assert _parse_byte_string("12x") == 134217728
    assert _parse_byte_string("0") == 1  # clamped to a safe divisor


def test_fan_out_accepts_unit_suffixed_conf(spark):
    from sayn_spark.functions.dedup import _doc_corpus

    corpus = _doc_corpus(spark, SF, mutate=None)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # a tiny file vs 128m -> fans out; must not raise on the suffix
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        out = _fan_out(corpus, spark, SF)
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        # 1k splits the same file into >> cores pieces -> passthrough
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        assert _fan_out(corpus, spark, SF) is corpus
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_dataset_bytes_sums_directory_part_files(spark, tmp_path):
    src = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    dest = str(tmp_path / "documents.parquet")
    src.repartition(4).write.parquet(dest)
    total = _dataset_bytes(dest)
    # the dentry itself is a few KiB; the part files hold the data
    assert total > os.path.getsize(dest)
    part_sum = sum(
        os.path.getsize(os.path.join(dest, f))
        for f in os.listdir(dest)
        if not f.startswith((".", "_"))
    )
    assert total == part_sum
    assert _dataset_bytes(str(tmp_path / "missing.parquet")) is None


def test_fan_out_passthrough_on_large_directory_dataset(spark, tmp_path):
    """A directory dataset whose summed part bytes already split wider
    than the cluster must pass through untouched — the old getsize(dir)
    saw ~4 KiB and would have forced the shuffle exactly there."""
    src = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    dest_dir = str(tmp_path)
    src.repartition(4).write.parquet(os.path.join(dest_dir, "documents.parquet"))
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        assert _fan_out(src, spark, dest_dir) is src
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


# -- 2. zero-token documents --------------------------------------------


def _write_docs_with_blanks(spark, tmp_path) -> str:
    """A documents table where 3 docs are empty/whitespace-only."""
    base = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .limit(20)
    )
    # note: the tokenizer (and the DuckDB oracle) split on ' ' only, so
    # "zero-token" means empty or spaces-only text; a tab would survive
    # as a 1-char token in both engines
    blanks = spark.createDataFrame(
        [(901, ""), (902, "   "), (903, "     ")], ["doc_id", "text"]
    )
    dest = str(tmp_path / "documents.parquet")
    base.unionByName(blanks).coalesce(1).write.parquet(dest)
    return str(tmp_path)

def test_simhash_drops_zero_token_docs(spark, tmp_path):
    sf_dir = _write_docs_with_blanks(spark, tmp_path)
    sig = _simhash_signatures(spark, sf_dir)
    ids = {r.doc_id for r in sig.select("doc_id").collect()}
    # the blank originals are dropped; their +100000 corpus copies keep
    # the planted " zz qq" suffix, carry 2 tokens, and correctly stay
    assert ids.isdisjoint({901, 902, 903})
    assert {100901, 100902, 100903} <= ids
    # and no all-zero signature survives for anyone
    n_zero = sig.where(F.expr("aggregate(sig, 0, (a, x) -> a + x) = 0")).count()
    assert n_zero == 0


def test_simhash_banded_still_exact_with_blank_docs(spark, tmp_path):
    """With blanks in the corpus the banded plan still equals all-pairs
    over the (token-bearing) signatures — the DuckDB-oracle semantics."""
    from sayn_spark.functions import REGISTRY

    sf_dir = _write_docs_with_blanks(spark, tmp_path)
    banded = REGISTRY["q_dedup_simhash"].fn(spark, sf_dir)
    want = _simhash_allpairs(_simhash_signatures(spark, sf_dir))
    got_rows = sorted(tuple(r) for r in banded.collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert got_rows == want_rows
    assert len(got_rows) > 0  # the planted near-dup pairs are found


# -- 3. persist bookkeeping ---------------------------------------------


def test_persist_tracked_release(spark):
    from sayn_spark.functions.registry import persist_tracked, release_persisted

    release_persisted()  # drop anything earlier tests left behind
    df = persist_tracked(spark.range(100).withColumn("x", F.col("id") * 2))
    df.count()
    assert df.storageLevel.useMemory
    assert release_persisted() == 1
    assert not df.storageLevel.useMemory
    assert release_persisted() == 0  # list drained, idempotent


def test_queries_release_their_intermediates(spark):
    from sayn_spark.functions import REGISTRY
    from sayn_spark.functions.registry import release_persisted

    release_persisted()
    REGISTRY["q_dedup_minhash_lsh"].fn(spark, SF).count()
    assert release_persisted() >= 1


# -- 4. FileLogger lifecycle --------------------------------------------


def test_file_logger_close_releases_handle(tmp_path):
    from sayn_spark.logs import FileLogger

    path = tmp_path / "run.log"
    logger = FileLogger(path)
    logger.report_event(event="message", level="info", message="hi", ts=None)
    logger.close()
    assert "hi" in path.read_text()
    # closed logger drops late events instead of raising
    logger.report_event(event="message", level="info", message="late", ts=None)
    assert "late" not in path.read_text()
    logger.close()  # idempotent


def test_file_logger_does_not_close_injected_stream(tmp_path):
    import io

    from sayn_spark.logs import FileLogger

    buf = io.StringIO()
    logger = FileLogger(tmp_path / "ignored.log", stream=buf)
    logger.report_event(event="message", level="info", message="hi", ts=None)
    logger.close()
    assert not buf.closed  # caller's stream stays open
    assert "hi" in buf.getvalue()


def test_file_logger_context_manager(tmp_path):
    from sayn_spark.logs import FileLogger

    path = tmp_path / "cm.log"
    with FileLogger(path) as logger:
        logger.report_event(event="message", level="info", message="cm", ts=None)
    assert "cm" in path.read_text()


def test_event_tracker_close_fans_out(tmp_path):
    from sayn_spark.logs import EventTracker, FileLogger

    path = tmp_path / "t.log"
    fl = FileLogger(path)
    tracker = EventTracker(loggers=[fl])
    tracker.report_event(event="message", level="info", message="x")
    tracker.close()
    assert fl._stream is None
