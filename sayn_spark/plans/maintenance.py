"""Table maintenance plans: file compaction and multi-dimensional
clustering — the operational layer a 100 TB lakehouse needs between
loads.  The reference has no equivalent (SAYN leaves physical layout
to the warehouse, SURVEY §4); on Spark-managed parquet it is the
engine's job.

``compact_table``: incremental loads (SURVEY §2.1 `copy mode=inc` /
`autosql incremental`) accrete small files — each merge writes one
file per shuffle partition.  Compaction rewrites the table with a
file count derived from its actual byte size, so scans stop paying
per-file open/footer costs and executors get even splits.

``zorder_by``: interleaved-bit (Morton) ordering over two numeric
columns before a range-partitioned write.  Parquet keeps per-file
min/max stats; clustering by the Morton code makes BOTH columns'
ranges narrow per file, so predicate pushdown skips files on either
dimension — the poor man's Z-ORDER that needs no table format beyond
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_bytes(spark: SparkSession, name: str) -> int:
    """Size of a managed table: catalog statistics when present, else
    the filesystem truth (one getFileStatus per data file, no data
    read).  The FS fallback matters because stats are routinely ABSENT
    (no ANALYZE TABLE, non-CBO writes) — a scan-free 0 here used to
    make compact_table coalesce(1) an arbitrarily large table through
    one task (second-pass review r12)."""
    try:
        row = spark.sql(f"DESCRIBE EXTENDED {name}").where(
            F.col("col_name") == "Statistics"
        ).collect()
        if row:
            return int(row[0]["data_type"].split(" ")[0])
    except Exception:
        pass
    try:
        hpath = spark._jvm.org.apache.hadoop.fs.Path
        hconf = spark._jsc.hadoopConfiguration()
        total = 0
        for f in spark.table(name).inputFiles():
            p = hpath(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        return total
    except Exception:
        return 0


def compact_table(
    spark: SparkSession,
    name: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite ``name`` with ceil(bytes / target) files (min 1) and
    return the file count written.

    Uses coalesce (no shuffle — merges existing splits) because
    compaction reduces file count; an overwrite via a staging table
    keeps the swap atomic-ish, same path as replace_table.  At 100 TB
    run per-partition (``WHERE`` on the partition column) instead of
    whole-table.
    """
    from sayn_spark.core.database import SparkDatabase

    n_bytes = table_bytes(spark, name)
    n_files = max(1, -(-n_bytes // target_file_bytes)) if n_bytes else 1
    # the rewrite must keep the table's OWN physical layout — a
    # session-default staging write strips partitioning (killing
    # pruning) and converts a Delta table to the default format,
    # silently losing its history (second-pass review r12)
    db = SparkDatabase(spark)
    layout = db.table_layout(name)
    df = spark.table(name).coalesce(n_files)
    staging = f"{name}__compacting"
    db.drop_object(staging)
    db.create_table(staging, df, mode="overwrite", **layout)
    # move_table, not a raw RENAME: partitioned tables need the
    # partition-location repair the raw statement skips
    db.move_table(staging, name)
    return n_files


def _morton16(a, b):
    """Interleave the low 16 bits of two non-negative int columns into
    a 32-bit Morton code, bit by bit — pure JVM bit ops, codegen'd."""
    code = F.lit(0).cast("long")
    for i in range(16):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i) % 2, 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1))
    return code


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int = 16) -> DataFrame:
    """Order ``df`` by the Morton interleave of two int columns and
    range-partition into ``n_files`` output splits.

    Columns are min-max scaled onto the 16-bit grid from a one-row
    global aggregate that Catalyst broadcasts (never a global-window
    rank, which would serialise the table through one partition); the
    only full shuffle is the final range partition.
    """
    bounds = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    )

    def scale16(col, lo, hi):
        # all scaling arithmetic in double: BIGINT (hi - lo) overflows
        # under ANSI when the column spans the long range — exactly what
        # this engine's own xxhash64-derived ids do (hazard review r14,
        # reproduced).  53-bit mantissa precision is far beyond what a
        # 16-bit grid assignment needs.
        lo_d = F.col(lo).cast("double")
        span = F.greatest(F.col(hi).cast("double") - lo_d, F.lit(1.0))
        return F.least(
            F.floor((F.col(col).cast("double") - lo_d) / span * 65536).cast("long"),
            F.lit(65535).cast("long"),
        )

    coded = df.join(F.broadcast(bounds)).withColumn(
        "_z", _morton16(scale16(col_a, "amin", "amax"), scale16(col_b, "bmin", "bmax"))
    ).drop("amin", "amax", "bmin", "bmax")
    return (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
