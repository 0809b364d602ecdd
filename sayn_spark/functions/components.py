"""Connected components over the near-duplicate graph — the final
stage of dedup at scale: LSH candidates -> verified edges -> components
-> keep one canonical doc per component.

``connected_components`` is generic min-label propagation driven from
the driver (bounded iterations, converges in graph-diameter steps; for
billion-edge graphs swap in the alternating large-star/small-star
algorithm — same API).  The iterative loop is the one place this engine
runs a driver-side loop over DataFrames; each iteration is a
distributed join+agg and the convergence check is a tiny count.

The oracle computes the same fixpoint with a recursive CTE — this is
the 'iterative algorithm' case the correctness harness usually can't
express in SQL; the transitive closure makes it expressible here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sayn_spark.functions.dedup import (
    _SQL_SHINGLES,
    _staged_shingles,
)
from sayn_spark.functions.registry import T, register


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(src, dst) undirected edges -> (node, component) with component =
    min node id reachable.  Deterministic."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            .localCheckpoint()  # truncate lineage per iteration
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + two mutated copies -> components of size >= 3."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    c1 = d.select((F.col("doc_id") + 100000).alias("doc_id"), F.concat("text", F.lit(" zz")).alias("text"))
    c2 = d.select((F.col("doc_id") + 200000).alias("doc_id"), F.concat("text", F.lit(" zz qq")).alias("text"))
    return d.unionByName(c1).unionByName(c2)


_SQL_CORPUS3 = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text || ' zz' FROM documents
  UNION ALL SELECT doc_id + 200000, text || ' zz qq' FROM documents
)"""

_SQL_EDGES = f"""
shingled AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM corpus),
sizes AS (SELECT doc_id, len(sh) AS n FROM shingled),
exploded AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS common
  FROM exploded a JOIN exploded b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
edges AS (
  SELECT src, dst FROM pairs
  JOIN sizes sa ON sa.doc_id = src JOIN sizes sb ON sb.doc_id = dst
  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
)"""


@register(
    "q_dedup_components",
    oracle=f"""
WITH RECURSIVE {_SQL_CORPUS3}, {_SQL_EDGES},
sym AS (
  SELECT src, dst FROM edges
  UNION SELECT dst, src FROM edges
  UNION SELECT src, src FROM edges
  UNION SELECT dst, dst FROM edges
),
reach(a, b) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
),
comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
SELECT component, COUNT(*) AS cluster_size, MIN(node) AS keep_id
FROM comp GROUP BY component
""",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: n-gram Jaccard edges (>= 0.5) over documents
    plus two planted mutation generations, then connected components.
    Each cluster keeps its minimum doc_id as canonical — components must
    have size >= 3 (original + both mutations) plus any natural merges.
    """
    corpus = _near_dup_corpus(spark, sf_dir)
    shingled = _staged_shingles(corpus, persist=True)
    sizes = shingled.select("doc_id", F.size("sh").alias("n"))
    exploded = shingled.select("doc_id", F.explode("sh").alias("s"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jacc = F.col("common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("common"))
    edges = (
        pairs.join(sizes.alias("sa"), F.col("src") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("dst") == F.col("sb.doc_id"))
        .where(jacc >= 0.5)
        .select("src", "dst")
    )
    comp = connected_components(edges)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"), F.min("node").alias("keep_id")
    )
