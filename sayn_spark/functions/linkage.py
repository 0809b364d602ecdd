"""Record linkage: match a clean entity file against an incoming dirty
file with blocking + weighted field agreement (the Fellegi-Sunter shape
every warehouse dedup/MDM pipeline hand-writes — the reference's users
would run it as warehouse SQL, SURVEY §2.4).

The synthetic dirty side perturbs the customer file deterministically
(every 3rd name gets a char appended, every 4th segment is overwritten,
every 5th balance drifts a cent), so the expected link set is exact and
both engines must agree on every pair score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sayn_spark.functions.registry import T, register

_DIRTY_OFFSET = 1_000_000


@register(
    "q_record_linkage",
    oracle=f"""
WITH base AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
dirty AS (
  SELECT c_custkey + {_DIRTY_OFFSET} AS c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_name || 'x' ELSE c_name END AS c_name,
         c_nationkey,
         CASE WHEN c_custkey % 4 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT)
           + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS bal_cents
  FROM customer
),
scored AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 3 ELSE 0 END
         + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 2 ELSE 0 END
         + CASE WHEN a.bal_cents = b.bal_cents THEN 2 ELSE 0 END AS score,
         CASE WHEN a.c_name = b.c_name THEN 1 ELSE 0 END AS exact_name
  FROM base a
  JOIN dirty b
    ON a.c_nationkey = b.c_nationkey
   AND substr(a.c_name, 15, 3) = substr(b.c_name, 15, 3)
)
SELECT score, COUNT(*) AS n_pairs, CAST(SUM(exact_name) AS BIGINT) AS n_exact_name,
       MIN(id_a) AS min_id_a, MAX(id_a) AS max_id_a
FROM scored WHERE score >= 5
GROUP BY score
""",
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked weighted-field record linkage, clean file x dirty file.

    Blocking key = (nationkey, digits 6-8 of the entity name): candidate
    pairs shrink from |A|x|B| to the block-local product, and the key
    survives the planted perturbations (suffix append never touches the
    blocked digits).  Field agreement weights: name within edit
    distance 1 -> +3, segment exact -> +2, balance exact (integer
    cents) -> +2; a link needs the name plus at least one corroborating
    field (score >= 5).

    At 100 TB the blocks are the shuffle unit — key choice caps block
    size (add more digits for smaller blocks), oversized blocks get
    salted or truncated, and Levenshtein runs only inside blocks.
    """
    c = T(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    dirty = c.select(
        (F.col("c_custkey") + _DIRTY_OFFSET).alias("c_custkey"),
        F.when(F.col("c_custkey") % 3 == 0, F.concat(F.col("c_name"), F.lit("x")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        "c_nationkey",
        F.when(F.col("c_custkey") % 4 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 5 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("bal_cents"),
    )
    a = base.alias("a")
    b = dirty.alias("b")
    score = (
        F.when(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1, F.lit(3)).otherwise(F.lit(0))
        + F.when(F.col("a.c_mktsegment") == F.col("b.c_mktsegment"), F.lit(2)).otherwise(F.lit(0))
        + F.when(F.col("a.bal_cents") == F.col("b.bal_cents"), F.lit(2)).otherwise(F.lit(0))
    )
    scored = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.substring(F.col("a.c_name"), 15, 3) == F.substring(F.col("b.c_name"), 15, 3)),
    ).select(
        F.col("a.c_custkey").alias("id_a"),
        score.alias("score"),
        (F.col("a.c_name") == F.col("b.c_name")).cast("long").alias("exact_name"),
    )
    return (
        scored.where(F.col("score") >= 5)
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("exact_name").alias("n_exact_name"),
            F.min("id_a").alias("min_id_a"),
            F.max("id_a").alias("max_id_a"),
        )
    )
