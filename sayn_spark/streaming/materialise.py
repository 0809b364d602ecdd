"""Streaming incremental materialisation: the sql task's
``materialisation: incremental`` as a continuous pipeline.

Each micro-batch of source rows is merged into the destination catalog
table with the same delete-key semantics as the batch engine
(plans/materialise.py, ref merge_tables.sql:1-12) via foreachBatch —
Structured Streaming's hook for sinks that need arbitrary batch logic.
The checkpoint gives exactly-once *input* processing; the merge itself
is idempotent on the delete key, so replayed batches converge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sayn_spark.core.database import SparkDatabase


def stream_merge_into(
    source: DataFrame,
    dst_table: str,
    delete_key: str,
    checkpoint: str,
):
    """Start a stream that merges every micro-batch into ``dst_table``.

    At 100 TB this is the landing-zone -> silver-table pattern: new
    files arrive, each batch anti-joins its keys out of the destination
    and appends — one bounded merge per trigger instead of a nightly
    full rebuild.
    """

    # foreachBatch runs in a CLONED session whose relation cache is
    # separate from the caller's; refresh through the source session so
    # readers outside the stream see the post-merge files
    outer_session = source.sparkSession

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        db = SparkDatabase(spark)
        if batch_df.isEmpty():
            return
        if not db.table_exists(dst_table):
            db.create_table(dst_table, batch_df, mode="overwrite")
        else:
            from sayn_spark.core.database import _tmp_name

            staging = _tmp_name(dst_table, f"_stream_{batch_id}")
            db.drop_object(staging)
            db.create_table(staging, batch_df, mode="overwrite")
            db.merge_tables(staging, dst_table, delete_key)
        outer_session.catalog.refreshTable(dst_table)

    return (
        source.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_ingest(
    source: DataFrame,
    index_table: str,
    matches_table: str,
    checkpoint: str,
    sf_dir: str,
):
    """Continuous near-dup ingest: each micro-batch of (doc_id, text)
    is probed against the persistent MinHash SIGNATURE index
    (functions/dedup.py:incremental_minhash_matches), matches land in
    ``matches_table``, and only the novel documents' signatures append
    to ``index_table`` — the streaming twin of
    q_dedup_incremental_minhash.

    State discipline at 100 TB: the index stores 16 ints per corpus
    document (never shingles or text), each trigger shuffles only the
    batch's band rows against it, and growth is an append of the kept
    batch.  Within-batch duplicates ride through to the NEXT trigger
    (the second copy matches the first's appended signature) — the
    standard trade for keeping each batch's work one probe + one
    append.  Checkpointing makes input processing exactly-once; the
    probe/append pair is idempotent per batch because replayed batches
    re-derive identical signatures and the anti-join drops re-seen ids.
    """
    outer_session = source.sparkSession

    def _ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        from sayn_spark.functions.dedup import (
            _mh_sig_frame,
            incremental_minhash_matches,
        )

        spark = batch_df.sparkSession
        db = SparkDatabase(spark)
        if batch_df.isEmpty():
            return
        sigs = _mh_sig_frame(
            batch_df.select("doc_id", "text"), spark, sf_dir
        ).localCheckpoint()
        if db.table_exists(index_table):
            index = spark.table(index_table)
            matches = incremental_minhash_matches(sigs, index).localCheckpoint()
            db.create_table(matches_table, matches, mode="append")
            kept = sigs.join(
                matches.select(F.col("batch_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )
            db.create_table(index_table, kept, mode="append")
        else:
            db.create_table(index_table, sigs, mode="overwrite")
        outer_session.catalog.refreshTable(index_table)

    return (
        source.writeStream.foreachBatch(_ingest_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
