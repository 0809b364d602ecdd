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
