"""Training-data corpus pipeline as engine tasks: the LLM-pipeline
operator library (functions/) driven by the task DAG — ingest ->
quality score -> near-dup dedup -> canonical corpus."""

from pyspark.sql import functions as F

from sayn_spark.functions.dedup import _staged_shingles
from sayn_spark.functions.components import connected_components
from sayn_spark.operators import task
from sayn_spark.sources import load_tables


@task(name="ingest_documents", outputs=["documents"])
def ingest_documents(context, spark, sf_dir):
    load_tables(spark, sf_dir, tables=("documents",), register=True)


@task(name="dedup_candidates", sources=["documents"], outputs=["dup_components"])
def dedup_candidates(context, spark):
    """n-gram Jaccard edges (>= 0.5) -> connected components -> one
    canonical doc per cluster."""
    docs = spark.table("documents").select("doc_id", "text")
    shingled = _staged_shingles(docs, persist=True)
    sizes = shingled.select("doc_id", F.size("sh").alias("n"))
    ex = shingled.select("doc_id", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
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
    # self-edges: docs without near-dups form singleton components
    self_edges = docs.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    comp = connected_components(edges.unionByName(self_edges))
    context.default_db.replace_table("dup_components", comp)


@task(name="compact_corpus", parents=["corpus_final", "test_corpus_no_dups"])
def compact_corpus(context, spark):
    """Post-load maintenance: rewrite the corpus table at its target
    file count (plans/maintenance.py) — the step a recurring ingest
    schedules after each merge so small files never accumulate."""
    from sayn_spark.plans.maintenance import compact_table

    n_files = compact_table(spark, "corpus_final")
    print(f"[compact_corpus] corpus_final -> {n_files} file(s)")
