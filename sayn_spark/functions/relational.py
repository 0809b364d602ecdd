"""Relational surface queries — the SQL surface sayn delegates to the
warehouse (SURVEY §2.4): joins of every type, hash/sort aggregates,
windows, rollup, set ops, semi/anti joins, top-k.  Implemented with the
DataFrame API so Catalyst picks physical strategies (broadcast for the
tiny dims, sort-merge/shuffled-hash for the fact-fact joins; AQE
rewrites at runtime).

Determinism vs the DuckDB oracle: double SUMs are order-dependent, so
every money aggregate casts to an exact DECIMAL *before* summing, then
rounds and casts to DOUBLE at the end — both engines then produce
bit-identical values regardless of partitioning.  Averages divide the
exact decimal sum (as double) by the count, in doubles, which is a
single deterministic IEEE op.  Top-k queries always carry a unique
tie-break key in the ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sayn_spark.functions.registry import T, register


def dec(col, prec: int = 12, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(expr, alias: str, round_to: int = 2):
    """Exact decimal sum -> rounded double (cross-engine deterministic)."""
    return F.round(F.sum(expr), round_to).cast("double").alias(alias)


def davg(expr, alias: str, round_to: int = 6):
    """avg = double(exact decimal sum) / count, rounded: deterministic."""
    return F.round(F.sum(expr).cast("double") / F.count(F.lit(1)), round_to).alias(alias)


# discount/tax factors as exact decimals: (1 - l_discount) is a 2-dp value
def one_minus(col):
    return (F.lit(1) - F.col(col)).cast("decimal(4,2)")


def one_plus(col):
    return (F.lit(1) + F.col(col)).cast("decimal(4,2)")


@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-agg with map-side partial agg.

    Ref surface: GROUP BY / SUM / AVG / COUNT (SURVEY §2.4).  At 100 TB
    this is a single scan + partial agg + tiny shuffle (4 groups).
    """
    l = T(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * one_plus("l_tax"), "sum_charge"),
            davg(dec("l_quantity"), "avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(dec("l_discount", 4, 2), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle="""
SELECT o.o_orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k.

    customer is broadcast (small side); orders⋈lineitem shuffles on the
    order key.  Deterministic top-k via (revenue DESC, o_orderkey).
    """
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = T(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount"), "revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q05_region_revenue",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r.r_name, n.n_name
""",
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dims broadcast, one fact shuffle."""
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount"), "revenue"))
    )


@register(
    "q06_revenue_forecast",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg; all predicates push to parquet."""
    l = T(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(dec("l_extendedprice") * dec("l_discount", 4, 2), "revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q07_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       YEAR(l.l_shipdate) AS l_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name <> cn.n_name AND l.l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY sn.n_name, cn.n_name, YEAR(l.l_shipdate)
""",
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: same dim joined twice under different roles."""
    l = T(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
    o = T(spark, sf_dir, "orders")
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer")
    sn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount"), "volume"))
    )


@register(
    "q09_product_profit",
    oracle="""
SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS amount
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
""",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered dim drives fact join."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount"), "amount"))
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
       CAST(ROUND(MAX(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking, deterministic top-20."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            dsum(dec("l_extendedprice") * one_minus("l_discount"), "revenue"),
            F.round(F.max(dec("c_acctbal")), 2).cast("double").alias("acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT JOIN with join-time predicate + double agg.

    Exercises null-producing outer join semantics (COUNT over nulls).
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))
             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE),
       6) AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM)."""
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc_price).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q16_supplier_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 5, 9, 13) AND p.p_brand <> 'BrandA'
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) with IN-list + inequality filters."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 5, 9, 13) & (F.col("p_brand") != "BrandA")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS totalprice,
       CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 140
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered semi join back onto the fact."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .where(F.col("q") > 140)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec("l_quantity"), "sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round(dec("o_totalprice"), 2).cast("double").alias("totalprice"),
            "sum_qty",
        )
    )


@register(
    "q19_bracketed_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'BrandA' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'BrandB' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'BrandC' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets across join."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "BrandA") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "BrandB") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "BrandC") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        dsum(dec("l_extendedprice") * one_minus("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q22_idle_customers",
    oracle="""
SELECT SUBSTR(c.c_name, 1, 9) AS name_prefix, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY SUBSTR(c.c_name, 1, 9)
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join.

    The scalar average is computed as one tiny agg and crossed in
    (broadcast), the anti join is broadcast too — no wide shuffle.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "q_window_top_customers",
    oracle="""
SELECT nation, c_custkey, revenue, rk FROM (
  SELECT n.n_name AS nation, c.c_custkey,
         CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) DESC, c.c_custkey) AS rk
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY n.n_name, c.c_custkey
) WHERE rk <= 3
""",
)
def q_window_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function surface: ROW_NUMBER over partitioned agg, top-N per group."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders")
    per_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.round(F.sum(dec("o_totalprice")), 2).alias("revenue_dec"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("revenue_dec"), F.col("c_custkey"))
    return (
        per_cust.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("nation", "c_custkey", F.col("revenue_dec").cast("double").alias("revenue"), "rk")
    )


@register(
    "q_window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey < 100
""",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame surface: cumulative sum with explicit ROWS frame."""
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w), 2).cast("double").alias("running_spend"),
    )


@register(
    "q_rollup_orders",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
""",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: ROLLUP with subtotal rows."""
    o = T(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(dec("o_totalprice"), "total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


@register(
    "q_union_case_order_flow",
    oracle="""
SELECT o_orderkey, side, CASE WHEN o_totalprice > 200000 THEN 'big'
                              WHEN o_totalprice > 50000 THEN 'mid'
                              ELSE 'small' END AS bucket
FROM (
  SELECT o_orderkey, o_totalprice, 'open' AS side FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'done' AS side FROM orders WHERE o_orderstatus = 'F'
) t
""",
)
def q_union_case_order_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + CASE surface (the reference's f_fighter_results shape,
    scaffolding/data/init_project/sql/f_fighter_results.sql)."""
    o = T(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", F.lit("open").alias("side")
    )
    done = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("done").alias("side")
    )
    u = open_.unionByName(done)
    bucket = (
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
    )
    return u.select("o_orderkey", "side", bucket.alias("bucket"))


@register(
    "q_set_ops_customers",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: INTERSECT / EXCEPT with distinct semantics."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_cust = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    big_cust = o.where(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(open_cust).exceptAll(big_cust.distinct())


@register(
    "q_string_funcs",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS upper_name,
       LENGTH(c_name) AS name_len,
       c_name || '/' || c_mktsegment AS tagged,
       SUBSTR(c_name, 10, 5) AS name_mid,
       REPLACE(c_name, '#', '-') AS dashed,
       TRIM(c_mktsegment) AS seg
FROM customer WHERE c_custkey <= 50
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (||, UPPER, LENGTH, SUBSTR, REPLACE, TRIM)."""
    c = T(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("tagged"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.trim(F.col("c_mktsegment")).alias("seg"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate) AS y,
       MONTH(o_orderdate) AS m,
       DAYOFMONTH(o_orderdate) AS d,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
FROM orders WHERE o_orderkey <= 100
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date-function surface (extract, trunc, interval arith, diff)."""
    o = T(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "q_exists_correlated",
    oracle="""
SELECT o.o_orderkey, o.o_orderstatus
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
""",
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the reference's merge template
    shape (merge_tables.sql:2-5) as a user query; planned as left-semi
    + left-anti joins (no correlated re-execution)."""
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    big = l.where(F.col("l_quantity") >= 49).select(F.col("l_orderkey").alias("o_orderkey"))
    returned = l.where(F.col("l_returnflag") == "R").select(F.col("l_orderkey").alias("o_orderkey"))
    return (
        o.join(big, "o_orderkey", "left_semi")
        .join(returned, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "q_in_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
)
""",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries -> chained semi joins (broadcast both dims)."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name").like("A%"))
    nk = (
        n.join(F.broadcast(r.select("r_regionkey")), n.n_regionkey == F.col("r_regionkey"), "left_semi")
        .select(F.col("n_nationkey").alias("c_nationkey"))
    )
    return c.join(F.broadcast(nk), "c_nationkey", "left_semi").select("c_custkey", "c_name")


@register(
    "q_array_agg_orders",
    oracle="""
SELECT o_custkey,
       array_to_string(list(o_orderstatus ORDER BY o_orderkey), ',') AS status_seq,
       len(list(o_orderstatus ORDER BY o_orderkey)) AS n
FROM orders WHERE o_custkey < 100
GROUP BY o_custkey
""",
)
def q_array_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: ordered collect -> join to string.
    Ordering inside the agg is pinned by o_orderkey so both engines
    produce identical sequences."""
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("o_orderkey", "o_orderstatus"))),
        lambda x: x.o_orderstatus,
    )
    return o.groupBy("o_custkey").agg(
        F.array_join(seq, ",").alias("status_seq"), F.size(seq).alias("n")
    )


@register(
    "q_null_handling",
    oracle="""
SELECT o_orderkey,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
       CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END AS was_pending,
       IFNULL(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'NONE') AS prio
FROM orders WHERE o_orderkey <= 500
""",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-function surface: NULLIF / COALESCE / IFNULL / IS NULL CASE."""
    o = T(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    nz = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.coalesce(nz, F.lit("PENDING")).alias("status_resolved"),
        F.when(nz.isNull(), 1).otherwise(0).alias("was_pending"),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("NONE")
        ).alias("prio"),
    )


_CTE_SQL = """
WITH cust_rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY o_custkey
), seg_stats AS (
  SELECT c.c_mktsegment AS seg,
         CAST(ROUND(SUM(r.rev), 2) AS DOUBLE) AS seg_rev,
         COUNT(*) AS n_cust
  FROM cust_rev r JOIN customer c ON c.c_custkey = r.o_custkey
  GROUP BY c.c_mktsegment
)
SELECT seg, seg_rev, n_cust,
       ROUND(seg_rev / n_cust, 4) AS rev_per_cust
FROM seg_stats
"""


@register("q_cte_chain", oracle=_CTE_SQL)
def q_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level WITH chain via spark.sql — the raw SQL surface the
    engine's sql tasks execute (identical text runs on both engines)."""
    from sayn_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, tables=("orders", "customer"), register=True)
    return spark.sql(_CTE_SQL)


@register(
    "q_lateral_token_freq",
    oracle="""
SELECT tok, COUNT(*) AS freq FROM (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
) GROUP BY tok
ORDER BY freq DESC, tok
LIMIT 20
""",
)
def q_lateral_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode surface: token frequency top-20 (explode ->
    groupBy with map-side partial agg; deterministic tiebreak)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.expr("filter(split(lower(text), ' '), x -> x != '')")).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(20)
    )


@register(
    "q_regex_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(p_name, 'g[ei]') AS has_ge,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
FROM part WHERE p_partkey <= 200
""",
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / replace / match / extract_all."""
    p = T(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("g[ei]").alias("has_ge"),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0)).alias("n_words"),
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() ids (beyond rollup/cube)."""
    o = T(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_window_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey) OVER w AS prev_order,
       LEAD(o_orderkey) OVER w AS next_order,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       NTILE(4) OVER w AS quartile,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite: lag/lead/first_value/ntile/rank/dense_rank
    over one deterministic ordering."""
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "q_conditional_distinct",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END) AS open_customers,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS done_customers,
       COUNT(DISTINCT o_custkey) AS all_customers
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
""",
)
def q_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple conditional COUNT(DISTINCT)s in one agg (expand-based plan)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct(
                F.when(F.col("o_orderstatus") == "O", F.col("o_custkey"))
            ).alias("open_customers"),
            F.count_distinct(
                F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
            ).alias("done_customers"),
            F.count_distinct(F.col("o_custkey")).alias("all_customers"),
        )
    )


@register(
    "q_approx_distinct_sanity",
    oracle="""
SELECT COUNT(DISTINCT o_custkey) AS exact_cnt,
       CASE WHEN ABS(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
                 <= 0.10 * COUNT(DISTINCT o_custkey)
            THEN 1 ELSE 0 END AS approx_within_10pct
FROM orders
""",
)
def q_approx_distinct_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch sanity: each engine's own approx_count_distinct must
    land within 10% of the exact count — the sketches differ, the
    CONTRACT (bounded error) is what's compared.  Spark runs a tighter
    rsd (1%) than the default, which was measured outside 5% here."""
    o = T(spark, sf_dir, "orders")
    exact = F.count_distinct(F.col("o_custkey"))
    approx = F.approx_count_distinct("o_custkey", rsd=0.01)
    return o.agg(
        exact.alias("exact_cnt"),
        F.when(F.abs(approx - exact) <= 0.10 * exact, 1).otherwise(0).alias("approx_within_10pct"),
    )


@register(
    "q_approx_quantile_sanity",
    oracle="""
WITH s AS (
  SELECT COUNT(*) AS n,
         quantile_cont(l_extendedprice, [0.5, 0.95, 0.99]) AS ex,
         approx_quantile(l_extendedprice, [0.5, 0.95, 0.99]) AS ap
  FROM lineitem
)
SELECT n,
       CASE WHEN ABS(ap[1] - ex[1]) <= 0.01 * ex[1] THEN 1 ELSE 0 END AS p50_within_1pct,
       CASE WHEN ABS(ap[2] - ex[2]) <= 0.01 * ex[2] THEN 1 ELSE 0 END AS p95_within_1pct,
       CASE WHEN ABS(ap[3] - ex[3]) <= 0.01 * ex[3] THEN 1 ELSE 0 END AS p99_within_1pct
FROM s
""",
)
def q_approx_quantile_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch sanity (same contract pattern as the HLL query):
    each engine's own approximate quantile (Spark GK percentile_approx,
    DuckDB t-digest) must land within 1% of its own exact interpolated
    percentile.  The raw doubles never cross engines — interpolation
    order differs — only the bounded-error CONTRACT is compared.

    Scale design: percentile_approx is a mergeable sketch (partial
    per-partition summaries merged on the driver side of the agg), so
    the exact sort-based percentile it is checked against here is the
    thing you *drop* at 100 TB; accuracy=10000 bounds rank error at
    N/10000 regardless of data size.
    """
    l = T(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").alias("ex"),
        F.expr("percentile_approx(l_extendedprice, array(0.5D, 0.95D, 0.99D), 10000)").alias(
            "ap"
        ),
    )
    flag = lambda i, name: F.when(  # noqa: E731
        F.abs(F.expr(f"ap[{i}] - ex[{i}]")) <= 0.01 * F.expr(f"ex[{i}]"), 1
    ).otherwise(0).alias(name)
    return agg.select(
        "n", flag(0, "p50_within_1pct"), flag(1, "p95_within_1pct"), flag(2, "p99_within_1pct")
    )


@register(
    "q04_priority_count",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01' AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
)
def q04_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a cross-table comparison inside the
    subquery (late-shipping orders) -> semi join with join condition."""
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q08_market_share",
    oracle="""
WITH all_nations AS (
  SELECT YEAR(o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS volume,
         n.n_name AS nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'CHINA' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM all_nations GROUP BY o_year
""",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share = conditional/total ratio."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    from sayn_spark.functions.relational import dec, one_minus

    vol = dec("l_extendedprice") * one_minus("l_discount")
    china = F.when(F.col("n_name") == "CHINA", vol).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(china).cast("double") / F.sum(vol).cast("double"), 6).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q11_value_concentration",
    oracle="""
WITH supp_value AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(ROUND(v, 2) AS DOUBLE) AS value
FROM supp_value
WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) / 1000 FROM supp_value)
""",
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a scalar fraction of the total
    (same agg reused: one pass + tiny broadcast threshold)."""
    l = T(spark, sf_dir, "lineitem")
    supp = l.groupBy("l_suppkey").agg(F.sum(dec("l_extendedprice")).alias("v"))
    thresh = supp.agg((F.sum("v").cast("double") / 1000).alias("t"))
    return (
        supp.crossJoin(F.broadcast(thresh))
        .where(F.col("v").cast("double") > F.col("t"))
        .select("l_suppkey", F.round("v", 2).cast("double").alias("value"))
    )


@register(
    "q12_shipmode_classes",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01' AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l.l_linestatus
""",
)
def q12_shipmode_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class conditional counts per group."""
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_rev
FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax via scalar MAX subquery over a derived
    aggregate (exact decimal, so ties are honest ties in both engines)."""
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = T(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).cast("double").alias("total_rev"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'BrandA' AND l.l_quantity < 0.2 * a.avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold -> join
    against the pre-aggregated averages (no correlated re-execution)."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "BrandA")
    avg_q = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_q, l.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.round(F.sum(dec("l_extendedprice")), 2).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_percentiles",
    oracle="""
SELECT c_mktsegment,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS min_price,
       CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS max_price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark percentile ==
    DuckDB quantile_cont: linear interpolation on sorted values)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.min(dec("o_totalprice")), 2).cast("double").alias("min_price"),
            F.round(F.max(dec("o_totalprice")), 2).cast("double").alias("max_price"),
        )
    )


@register(
    "q02_min_cost_supplier",
    oracle="""
WITH part_costs AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(CAST(l.l_extendedprice AS DECIMAL(12,2)) / CAST(l.l_quantity AS DECIMAL(12,2))) AS unit_cost
  FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey) AS rk
  FROM part_costs
)
SELECT p.p_partkey, p.p_name, s.s_name,
       CAST(ROUND(r.unit_cost, 4) AS DOUBLE) AS unit_cost
FROM ranked r
JOIN part p ON p.p_partkey = r.l_partkey
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rk = 1 AND p.p_partkey <= 200
""",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table): cheapest supplier
    per part via argmin window over per-pair unit costs.

    Decimal division keeps unit_cost exact-comparable; ties break on
    s_suppkey so the argmin is deterministic cross-engine.
    """
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    s = T(spark, sf_dir, "supplier")
    costs = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice") / dec("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        costs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("unit_cost", 4).cast("double").alias("unit_cost"),
        )
    )


@register(
    "q20_excess_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
), part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 0
  AND EXISTS (
    SELECT 1 FROM shipped sh
    JOIN part_total pt ON pt.l_partkey = sh.l_partkey
    JOIN part p ON p.p_partkey = sh.l_partkey
    WHERE sh.l_suppkey = s.s_suppkey
      AND p.p_size >= 25
      AND CAST(sh.qty AS DOUBLE) > 0.5 * CAST(pt.total_qty AS DOUBLE)
  )
ORDER BY s_suppkey
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp, availqty := shipped qty):
    suppliers in one region holding >50% of a large part's shipped
    volume — nested agg-derived threshold feeding a semi join.

    Ref surface: nested IN/EXISTS subqueries over aggregates (SURVEY
    §2.4).  Scale shape: one lineitem scan with a pushed-down date
    filter -> partial agg on (part, supp); the per-part total reuses the
    same agg (groupBy of the first, no second scan); supplier/nation/
    part are broadcast.  The semi join keys on s_suppkey so the big
    side never re-shuffles for the dim probe.
    """
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    p = T(spark, sf_dir, "part").where(F.col("p_size") >= 25)
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    excess = (
        shipped.join(part_total, shipped.l_partkey == F.col("pk"))
        .join(F.broadcast(p), shipped.l_partkey == p.p_partkey, "left_semi")
        .where(F.col("qty").cast("double") > 0.5 * F.col("total_qty").cast("double"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  GROUP BY l.l_orderkey, l.l_suppkey
), all_supps AS (
  SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY l_orderkey, l_suppkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late t
JOIN supplier s ON s.s_suppkey = t.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM all_supps a
    WHERE a.l_orderkey = t.l_orderkey AND a.l_suppkey <> t.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l2
    WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: late := shipped >90 days after order
    date, no receipt/commit dates in the schema): the only late
    supplier on a multi-supplier finalized order.

    Ref surface: EXISTS + NOT EXISTS correlated self-joins (SURVEY
    §2.4).  Spark plan: both subqueries become semi/anti joins keyed on
    l_orderkey with the suppkey inequality in the join condition — no
    correlated re-execution; the `late` set is derived once and reused
    for both the driving side and the anti side.
    """
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = T(spark, sf_dir, "supplier")
    late = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("l_orderkey", "l_suppkey")
    )
    all_supps = l.groupBy(
        F.col("l_orderkey").alias("a_ok"), F.col("l_suppkey").alias("a_sk")
    ).agg(F.count(F.lit(1)).alias("_n")).select("a_ok", "a_sk")
    late2 = late.select(
        F.col("l_orderkey").alias("b_ok"), F.col("l_suppkey").alias("b_sk")
    )
    return (
        late.join(
            all_supps,
            (F.col("a_ok") == late.l_orderkey) & (F.col("a_sk") != late.l_suppkey),
            "left_semi",
        )
        .join(
            late2,
            (F.col("b_ok") == late.l_orderkey) & (F.col("b_sk") != late.l_suppkey),
            "left_anti",
        )
        .join(F.broadcast(s), s.s_suppkey == late.l_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q_cube_orders",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(CAST(YEAR(o_orderdate) AS VARCHAR), 'ALL') AS year,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, YEAR(o_orderdate))
""",
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE surface: all grouping combinations incl. both subtotals."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderstatus", F.year("o_orderdate").alias("yr"), "o_totalprice"
    )
    return (
        o.cube("o_orderstatus", "yr")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("o_totalprice"), "total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("year"),
            "n",
            "total",
        )
    )


@register(
    "q_join_matrix",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey) AS n_inner,
  (SELECT COUNT(*) FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey) AS n_left,
  (SELECT COUNT(*) FROM customer c FULL OUTER JOIN orders o ON o.o_custkey = c.c_custkey) AS n_full,
  (SELECT COUNT(*) FROM customer c WHERE EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_semi,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_anti
""",
)
def q_join_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-type semantics matrix: inner / left-outer / full-outer /
    left-semi / left-anti row counts over the same key, in one row.

    Pins the full join surface the reference delegates to the warehouse
    (SURVEY §2.4) — every type is a separate Catalyst join selection
    (broadcast for semi/anti on the small side, sort-merge for the
    full outer, which cannot broadcast).
    """
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_custkey")
    cond = F.col("o_custkey") == F.col("c_custkey")
    counts = [
        c.join(o, cond, how).count()
        for how in ("inner", "left", "full", "semi", "anti")
    ]
    return spark.createDataFrame(
        [tuple(counts)], "n_inner long, n_left long, n_full long, n_semi long, n_anti long"
    )


@register(
    "q_rolling_range_window",
    oracle="""
WITH days AS (
  SELECT o_custkey, o_orderkey,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders WHERE o_custkey < 100
)
SELECT o_custkey, o_orderkey, day_no,
       COUNT(*) OVER w AS n_orders_30d,
       CAST(ROUND(SUM(price) OVER w, 2) AS DOUBLE) AS revenue_30d
FROM days
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
""",
)
def q_rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day window per customer via RANGE framing (value-based,
    not row-based): each order sees the count and decimal-exact revenue
    of the trailing 30 calendar days.

    RANGE frames are the time-series rolling-metric workhorse; ordering
    by an integer day number keeps the frame arithmetic exact in both
    engines.  One shuffle on o_custkey; frames are partition-local.
    """
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    days = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_no"),
        dec("o_totalprice").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-29, Window.currentRow)
    )
    return days.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum("price").over(w), 2).cast("double").alias("revenue_30d"),
    )


@register(
    "q_scalar_subqueries",
    oracle="""
SELECT c.c_custkey,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
       CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) >
                 (SELECT AVG(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer)
            THEN 1 ELSE 0 END AS above_avg_bal
FROM customer c
WHERE c.c_custkey < 200
""",
)
def q_scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery surface: an UNCORRELATED scalar (global average
    balance, computed once and broadcast as a literal-like input) and a
    CORRELATED scalar in the projection (per-customer order count,
    which Catalyst de-correlates into a left outer aggregate join).

    SAYN users write exactly this SQL against the warehouse (SURVEY
    §2.4); balances compare in DECIMAL so the above-average flag has no
    float boundary.  Plan shape at 100 TB: one broadcast of a 1-row
    subquery result + one aggregate-then-join on o_custkey — Catalyst's
    rewrite, not a per-row re-execution.
    """
    T(spark, sf_dir, "customer").createOrReplaceTempView("customer_ss")
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders_ss")
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT COUNT(*) FROM orders_ss o WHERE o.o_custkey = c.c_custkey) AS n_orders,
               CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) >
                         (SELECT AVG(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer_ss)
                    THEN 1 ELSE 0 END AS above_avg_bal
        FROM customer_ss c
        WHERE c.c_custkey < 200
        """
    )


@register(
    "q_set_ops_all",
    oracle="""
WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
     op AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT o_custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM op
) GROUP BY o_custkey
UNION ALL
SELECT -1 - o_custkey AS o_custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM op
) GROUP BY o_custkey
""",
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops: INTERSECT ALL keeps min(multiplicity),
    EXCEPT ALL subtracts multiplicities — distinct from the
    distinct-set variants in q_set_ops_customers, and a different
    Catalyst plan (a multiplicity-counting aggregate + generate rather
    than a plain semi/anti join).  EXCEPT ALL keys are sign-flipped so
    both result sets union into one output without column games.
    """
    o = T(spark, sf_dir, "orders")
    hi = o.where(F.col("o_totalprice") > 150000).select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    inter = (
        hi.intersectAll(op)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exc = (
        hi.exceptAll(op)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select((F.lit(-1) - F.col("o_custkey")).alias("o_custkey"), "n")
    )
    return inter.unionByName(exc)


@register(
    "q_lateral_topk_per_key",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.price
FROM customer c,
LATERAL (
  SELECT o_orderkey, CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS price
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey < 100
""",
)
def q_lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery: each customer's top-2 orders
    by price — the per-key-top-k idiom written as SQL users write it
    (DuckDB/Postgres LATERAL, Spark 3.2+ LATERAL), distinct from the
    window row_number formulation already pinned elsewhere.

    Catalyst de-correlates the LATERAL into a join + per-key limit
    (DomainJoin rewrite) — no per-customer re-execution; unique
    tie-break (o_orderkey) keeps the top-2 deterministic across
    engines.
    """
    T(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.price
        FROM customer_lat c,
        LATERAL (
          SELECT o_orderkey, CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS price
          FROM orders_lat o WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 100
        """
    )
