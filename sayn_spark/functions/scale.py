"""Scale-pattern operators: queries whose point is the *physical* plan
shape a 100 TB job needs, validated end-to-end at test scale.

``q_sorted_write_invariant`` exercises the globally-sorted-output
pattern (repartitionByRange + sortWithinPartitions — what
``df.sort().write`` does under the hood, and what you hand-roll when
writing sorted parquet/ORC for downstream merge readers): N range
partitions, each sorted locally, with non-overlapping key ranges
across partitions.  The query *verifies* the invariant distributively
and returns the violation counts (must be 0) plus the exact row count,
so the DuckDB oracle can hash-check it.

Reference parity: SAYN delegates ORDER BY to the warehouse (SURVEY
§2.4); this is the Spark-native mechanism that makes a total order
scale past one node.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sayn_spark.functions.registry import T, register

_N_PARTS = 16

_STATS_SCHEMA = (
    "pid int, n_rows long, min_price long, min_key long, "
    "max_price long, max_key long, n_unsorted long"
)


def _partition_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition: row count, (min, max) of the (price_cents,
    l_orderkey) sort key, and the number of adjacent out-of-order row
    pairs (0 iff the partition is locally sorted).  Arrow batches
    arrive in partition order, so cross-batch boundaries are checked by
    carrying the previous batch's last key."""
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    n = 0
    n_unsorted = 0
    mn = mx = None
    prev = None
    for pdf in it:
        if len(pdf) == 0:
            continue
        p = pdf["price_cents"].to_numpy()
        k = pdf["l_orderkey"].to_numpy()
        bad = (p[1:] < p[:-1]) | ((p[1:] == p[:-1]) & (k[1:] < k[:-1]))
        n_unsorted += int(bad.sum())
        first, last = (int(p[0]), int(k[0])), (int(p[-1]), int(k[-1]))
        if prev is not None and first < prev:
            n_unsorted += 1
        # exact lexicographic min/max of the tuple: the partition is
        # expected sorted, but compute robustly so a violation still
        # reports true extremes (no first/last shortcut)
        pm, pM = int(p.min()), int(p.max())
        bmin = (pm, int(k[p == pm].min()))
        bmax = (pM, int(k[p == pM].max()))
        mn = bmin if mn is None or bmin < mn else mn
        mx = bmax if mx is None or bmax > mx else mx
        prev = last
        n += len(pdf)
    if n:
        yield pd.DataFrame(
            {
                "pid": [pid],
                "n_rows": [n],
                "min_price": [mn[0]],
                "min_key": [mn[1]],
                "max_price": [mx[0]],
                "max_key": [mx[1]],
                "n_unsorted": [n_unsorted],
            }
        )


@register(
    "q_sorted_write_invariant",
    oracle="""
SELECT COUNT(*) AS total_rows,
       CAST(0 AS BIGINT) AS n_unsorted_pairs,
       CAST(0 AS BIGINT) AS n_boundary_overlaps
FROM lineitem
""",
)
def q_sorted_write_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-sorted output without a global sort: range-partition
    lineitem on (l_extendedprice, l_orderkey) into 16 partitions, sort
    within each, then distributively VERIFY total order: zero
    out-of-order adjacent pairs inside any partition and zero key-range
    overlaps across partition boundaries, plus an exact row count the
    oracle checks.

    This is the 100 TB sorted-write plan: RangePartitioner samples key
    quantiles (one lightweight pass), each partition sorts locally
    (spillable), and no single node ever holds the total order.  The
    verification is mapInPandas (Arrow-batched, numpy comparisons) and
    a 16-row driver-side aggregate.
    """
    li = T(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        "l_orderkey",
    )
    arranged = li.repartitionByRange(
        _N_PARTS, "price_cents", "l_orderkey"
    ).sortWithinPartitions("price_cents", "l_orderkey")
    stats = arranged.mapInPandas(_partition_stats, schema=_STATS_SCHEMA)
    s = stats.select(
        "n_rows",
        "n_unsorted",
        F.struct("min_price", "min_key").alias("mn"),
        F.struct("max_price", "max_key").alias("mx"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("mn")
    overlaps = s.withColumn("prev_mx", F.lag("mx").over(w)).select(
        F.sum("n_rows").alias("total_rows"),
        F.sum("n_unsorted").alias("n_unsorted_pairs"),
        F.sum(
            (F.col("prev_mx").isNotNull() & (F.col("prev_mx") > F.col("mn"))).cast(
                "long"
            )
        ).alias("n_boundary_overlaps"),
    )
    return overlaps
