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

from sayn_spark.functions.registry import T, persist_tracked, register

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


@register(
    "q_skew_salted_join",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment
""",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe fact-dim join via explicit salting: the events fact
    is scattered uniformly over 16 salt values and the customer dim is
    replicated 16x, so a bot user holding 10% of all events spreads
    over 16 reducers instead of melting one.  Result is provably equal
    to the plain inner join (tests/test_skew.py pins that; the oracle
    checks it here end-to-end).

    At 100 TB this is the fallback when AQE skew-join can't help (e.g.
    the dim side is too big to broadcast but small enough to replicate
    16x); value sums are integer cents — exact under any reduction
    order.  Reference delegates joins entirely (SURVEY §2.4).
    """
    from sayn_spark.plans.skew import salted_join

    e = T(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, "user_id", how="inner", salt=16)
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_cents").alias("value_cents"),
    )


_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "q_profile_columns",
    oracle="""
WITH src AS (
  SELECT o_custkey, o_orderstatus, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice
  FROM orders
)
SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_val, CAST(MAX(o_custkey) AS VARCHAR) AS max_val
FROM src
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
FROM src
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority)
FROM src
UNION ALL
SELECT 'o_totalprice', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM src
""",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-column data profiling: per column, row count,
    null count, exact distinct count, and canonical-string min/max —
    the profiling report a data-quality layer runs before accepting a
    load (the generated-tests side of SURVEY §2.1's standard tests,
    turned into a summary instead of a pass/fail).

    One aggregate computes all columns' stats together (Catalyst
    expands the multi-distinct into one Expand + two-phase aggregate —
    a fixed number of shuffles regardless of column count, vs one scan
    per column if profiled naively); the single stats row is then
    unpivoted driver-side via stack().  Doubles are canonicalised to
    integer cents before profiling so min/max strings are
    engine-independent.
    """
    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_totalprice"),
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    stats = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return stats.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "as (col_name, n_nulls, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


_BLOOM_BITS = 1 << 16  # 65536 bits -> 1024 longs; fpp ~1% at ~6k keys
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (1, 2, 3)


def bloom_bitmap(keys: DataFrame, key: str) -> DataFrame:
    """Single-row DataFrame holding a bloom filter (array<bigint> bitmap)
    over ``keys[key]``: k=3 murmur3 positions per key, bit_or-folded into
    64-bit words.  Build cost is one shuffle of (word, mask) pairs —
    at most _BLOOM_WORDS rows — regardless of key count."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.hash(F.col(key), F.lit(s)), F.lit(_BLOOM_BITS))
                    for s in _BLOOM_SEEDS
                ]
            )
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), pos % 64)").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("mp")
    ).select(
        F.expr(
            f"transform(sequence(0, {_BLOOM_WORDS - 1}), "
            "i -> coalesce(element_at(mp, i), cast(0 as bigint)))"
        ).alias("bloom")
    )


def bloom_might_contain(key_col: str) -> "F.Column":
    """Predicate: all k bloom bits set for ``key_col`` (column ``bloom``
    must be in scope from a broadcast of bloom_bitmap's row)."""
    seeds = ", ".join(str(s) for s in _BLOOM_SEEDS)
    return F.expr(
        f"forall(transform(array({seeds}), "
        f"s -> pmod(hash({key_col}, s), {_BLOOM_BITS})), "
        "p -> (element_at(bloom, cast(p div 64 as int) + 1) "
        "& shiftleft(cast(1 as bigint), cast(p % 64 as int))) != 0)"
    )


@register(
    "q_bloom_prefilter_join",
    oracle="""
SELECT l.l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey
    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
)
GROUP BY l.l_returnflag
""",
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join: revenue of lineitems belonging to
    urgent finished orders.  The order-key set is folded into a 64 KiB
    bloom bitmap (one row, broadcast); the fact scan drops non-matching
    rows BEFORE the join, and the exact semi join then removes bloom
    false positives — so the result is provably bloom-invariant and the
    oracle is the plain EXISTS semi join.

    This is Spark's runtime row-level filtering (enabled by default,
    spark.sql.optimizer.runtime.bloomFilter.enabled) made explicit as a
    reusable operator: at 100 TB you persist the bitmap once and prune
    MANY downstream fact scans (cross-job pruning the optimizer cannot
    see), shrinking each shuffle by the selectivity of the key set.
    Reference delegates joins entirely (SURVEY §2.4).
    """
    o = T(spark, sf_dir, "orders")
    keys = o.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
    )
    pref = li.join(F.broadcast(bloom_bitmap(keys, "o_orderkey"))).where(
        bloom_might_contain("l_orderkey")
    )
    exact = pref.join(
        F.broadcast(keys),
        pref["l_orderkey"] == keys["o_orderkey"],
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price_cents").alias("price_cents"),
    )


_CHECKSUM_MOD = 1_000_000_007


@register(
    "q_table_checksum",
    oracle="""
WITH h AS (
  SELECT l_returnflag,
         ('0x' || substr(md5(
             CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
             || '|' || l_returnflag || '|' || l_linestatus || '|'
             || CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
         ), 1, 15))::BIGINT AS rh
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(rh % 1000000007) AS BIGINT) AS sum_mod,
       bit_xor(rh) AS xor_h
FROM h GROUP BY l_returnflag
""",
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: per-row md5 over a canonical
    '|'-joined string form (ints, strings, integer cents — no raw
    doubles), folded per group with two independent combiners: bit_xor
    (overflow-free at any scale) and a modular sum (catches the
    paired-duplicate rows xor cancels).  Equal fingerprints <=> equal
    multisets of rows, regardless of partitioning, task order, or
    engine — the cross-cluster anti-entropy check you run after a
    100 TB copy/merge instead of comparing rows (SURVEY §5's
    order-insensitive validate_table, done distributively).
    """
    li = T(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
    )
    rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        li.select("l_returnflag", rh.alias("rh"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("rh") % _CHECKSUM_MOD).alias("sum_mod"),
            F.expr("bit_xor(rh)").alias("xor_h"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout — multi-dimensional data skipping
# ---------------------------------------------------------------------------

_Z_BITS = 16
_Z_EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z — the corpus' hour origin
_Z_BLOCK = 256  # rows per simulated file/row-group


def zorder_key_expr(a: str, b: str, bits: int = _Z_BITS) -> str:
    """Spark SQL expression: bit-interleaved Z-order (Morton) key over
    two non-negative integer columns, ``bits`` low bits each — the
    sort key behind multi-dimensional data skipping (Delta's OPTIMIZE
    ZORDER): sorting by it clusters rows that are close in BOTH
    dimensions, so per-file min/max stats prune on either predicate.
    Use with the engine's sorted-write path (repartitionByRange +
    sortWithinPartitions, q_sorted_write_invariant's mechanism)."""
    return (
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" + (shiftright(cast({a} as bigint), i) % 2) * shiftleft(1L, 2 * i)"
        f" + (shiftright(cast({b} as bigint), i) % 2) * shiftleft(1L, 2 * i + 1))"
    )


def _zorder_key_sql(a: str, b: str, bits: int = _Z_BITS) -> str:
    """DuckDB twin of :func:`zorder_key_expr`."""
    return (
        f"CAST(list_aggregate(list_transform(generate_series(0, {bits - 1}), i ->"
        f" (({a} >> i) & 1) * (1::BIGINT << (2 * i))"
        f" + (({b} >> i) & 1) * (1::BIGINT << (2 * i + 1))), 'sum') AS BIGINT)"
    )


@register(
    "q_zorder_layout",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id,
         (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - {_Z_EPOCH0}) // 3600 AS hidx
  FROM events
),
keyed AS (SELECT *, {_zorder_key_sql("user_id", "hidx")} AS zkey FROM e),
zb AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY zkey, event_id) - 1) // {_Z_BLOCK} AS block,
         user_id, hidx
  FROM keyed
),
tb AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY hidx, event_id) - 1) // {_Z_BLOCK} AS block,
         user_id, hidx
  FROM keyed
),
zagg AS (
  SELECT block, MAX(user_id) - MIN(user_id) AS us, MAX(hidx) - MIN(hidx) AS hs
  FROM zb GROUP BY block
),
tagg AS (
  SELECT block, MAX(user_id) - MIN(user_id) AS us, MAX(hidx) - MIN(hidx) AS hs
  FROM tb GROUP BY block
)
SELECT 'zorder' AS ordering, CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(us) AS BIGINT) AS sum_user_span, CAST(SUM(hs) AS BIGINT) AS sum_hour_span
FROM zagg
UNION ALL
SELECT 'time', CAST(COUNT(*) AS BIGINT), CAST(SUM(us) AS BIGINT), CAST(SUM(hs) AS BIGINT)
FROM tagg
""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout, measured — the data-skipping number
    behind Delta's OPTIMIZE ZORDER, computed on the engine's own
    events table: interleave (user_id, hour) bits into a Morton key,
    cut both orderings into {_Z_BLOCK}-row blocks (simulated files /
    row groups), and report each ordering's summed per-block min/max
    span per dimension.  A block's span IS its pruning power: a
    point-user predicate skips a block iff the user sits outside its
    span, so sum_user_span(zorder) << sum_user_span(time) quantifies
    how much I/O Z-ordering saves on user-keyed reads while keeping
    time spans bounded (the two-predicate trade every lakehouse
    layout decision weighs).

    Determinism: the Morton fold, block cuts (row_number over
    (key, event_id)), and spans are all exact integers.

    Scale shape: the measurement's global sorts are
    repartitionByRange-style total orders (q_sorted_write_invariant's
    mechanism — range-partitioned, locally sorted); the Z-key itself
    is a row-local fold you attach before any sorted write.  At
    100 TB you run the report per partition-sample to size file
    stats, then ZORDER the hot tables."""
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            f"(unix_timestamp(date_trunc('hour', ts)) - {_Z_EPOCH0}) div 3600"
        ).alias("hidx"),
    )
    keyed = persist_tracked(
        e.withColumn("zkey", F.expr(zorder_key_expr("user_id", "hidx")))
    )

    def _spans(order_cols, label: str) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.orderBy(*order_cols)
        blocks = keyed.select(
            ((F.row_number().over(w) - 1) / _Z_BLOCK).cast("bigint").alias("block"),
            "user_id",
            "hidx",
        )
        agg = blocks.groupBy("block").agg(
            (F.max("user_id") - F.min("user_id")).alias("us"),
            (F.max("hidx") - F.min("hidx")).alias("hs"),
        )
        return agg.agg(
            F.lit(label).alias("ordering"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum("us").cast("bigint").alias("sum_user_span"),
            F.sum("hs").cast("bigint").alias("sum_hour_span"),
        )

    return _spans(["zkey", "event_id"], "zorder").unionByName(
        _spans(["hidx", "event_id"], "time")
    )
