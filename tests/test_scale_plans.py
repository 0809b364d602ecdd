"""Physical-plan assertions: the scale properties that make these
queries survive a 100x data increase are pinned here so regressions
fail loudly —

- predicate pushdown reaches the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema)
- dimension joins broadcast (no wide shuffle for small sides)
- aggregations are partial (map-side combine before the exchange)
- the incremental-merge anti join broadcasts the delta's keys
"""

from __future__ import annotations

import pytest

from sayn_spark.functions import REGISTRY

SF = "/root/testdata/sf0.01"


def plan_of(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(spark, df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q01_pushdown_and_pruning(spark):
    df = REGISTRY["q01_pricing_summary"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan
    # projection pruning: untouched columns never leave the scan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_q05_broadcasts_all_dims(spark):
    df = REGISTRY["q05_region_revenue"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q01_partial_aggregation(spark):
    df = REGISTRY["q01_pricing_summary"].fn(spark, SF)
    plan = plan_of(spark, df)
    # partial + final HashAggregate around one exchange
    assert plan.count("HashAggregate") >= 2


def test_incremental_filter_pushes_to_scan(spark):
    from pyspark.sql import functions as F

    from sayn_spark.plans.materialise import incremental_filter

    df = spark.read.parquet(f"{SF}/orders.parquet")
    filtered = incremental_filter(df, "o_orderkey", 1000, include_null=False)
    plan = plan_of(spark, filtered.select("o_orderkey"))
    assert "GreaterThanOrEqual(o_orderkey,1000)" in plan


def test_merge_broadcasts_delta_keys(spark):
    from sayn_spark.plans.materialise import merge_dataframes

    dst = spark.read.parquet(f"{SF}/orders.parquet")
    src = dst.limit(100)
    merged = merge_dataframes(dst, src, "o_orderkey")
    plan = plan_of(spark, merged)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_multimodal_prunes_payload_for_meta_queries(spark):
    """Opaque payload columns must not be read by metadata-only queries."""
    from pyspark.sql import functions as F

    from sayn_spark.functions.multimodal import with_payload

    d = with_payload(spark.read.parquet(f"{SF}/documents.parquet"))
    meta_only = d.select("doc_id", "n_chars").where(F.col("n_chars") > 100)
    read_schema = [
        ln for ln in plan_of(spark, meta_only).splitlines() if "ReadSchema" in ln
    ][0]
    assert "text" not in read_schema  # payload source column pruned away


def test_partitioned_table_prunes_partitions(spark):
    """Filters on the partition column must prune at the metadata level
    (PartitionFilters in the scan, not a data filter)."""
    from pyspark.sql import functions as F

    from sayn_spark.core.database import SparkDatabase

    db = SparkDatabase(spark)
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
    )
    db.create_table("pp_t", df, partition_by=["bucket"])
    plan = plan_of(spark, spark.table("pp_t").where(F.col("bucket") == "2"))
    assert "PartitionFilters" in plan and "bucket" in plan
    # count confirms pruned correctness
    assert spark.table("pp_t").where("bucket = '2'").count() == 250


def test_kmeans_broadcasts_centroids(spark):
    """The Lloyd-iteration assignment join must broadcast the k x 64
    centroid table — a shuffle there would move the full vector corpus
    per iteration at 100 TB."""
    df = REGISTRY["q_kmeans_refine"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cms_counter_table_is_broadcast(spark):
    """The count-min counter table (4x512 rows, fixed size regardless of
    corpus) must broadcast into the probe join, and the token count must
    partial-aggregate before its exchange."""
    df = REGISTRY["q_text_heavy_hitters"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_zipf_topk_avoids_global_sort(spark):
    """The top-500 vocabulary cut must be a per-partition top-k
    (TakeOrderedAndProject), never a full sort of the distinct-token
    table onto one partition."""
    df = REGISTRY["q_text_zipf_slope"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "TakeOrderedAndProject" in plan


def test_sorted_write_uses_range_partitioning(spark):
    """Globally-sorted output must come from range partitioning + local
    sorts — a single-partition global Sort would serialise 100 TB
    through one task."""
    df = REGISTRY["q_sorted_write_invariant"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "rangepartitioning(price_cents" in plan
    assert plan.count("Sort [price_cents") >= 1


def test_incremental_corpus_dedup_joins_fingerprints_only(spark):
    """The corpus side of the incremental dedup join must carry only the
    16-byte fingerprint (text is hashed before the exchange, and the
    within-batch window runs on the delta after the join)."""
    df = REGISTRY["q_dedup_incremental_corpus"].fn(spark, SF)
    opt = optimized_of(spark, df)
    # the distinct fingerprint projection sits below the join
    assert "Aggregate [fp" in opt
    plan = plan_of(spark, df)
    assert "HashAggregate" in plan


def test_profile_single_scan_expand(spark):
    """Multi-column profiling must be ONE scan: Catalyst's Expand
    rewrites the multi-distinct aggregate; a naive per-column plan
    would re-scan orders four times."""
    df = REGISTRY["q_profile_columns"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan


# Queries allowed to plan a BroadcastNestedLoopJoin: every entry joins
# against a BOUNDED broadcast frame — a scalar-subquery threshold (one
# row), a fixed 10-vector query set, a k-row centroid/sketch frame —
# never a data-sized side.  Anything NOT listed here that plans a BNLJ
# fails the hygiene test below (this is what caught the all-pairs
# SimHash/cosine verifiers removed in round 3).
_BNLJ_BOUNDED_FRAME_OK = {
    "q11_value_concentration",   # scalar subquery: group value threshold (1 row)
    "q22_idle_customers",        # scalar subquery: avg acctbal (1 row)
    "q_ann_bruteforce_topk",     # documented baseline: 10 fixed query vectors
    "q_bloom_prefilter_join",    # 1-row bloom-filter aggregate broadcast
    "q_bm25_search",             # fixed small query-term frame
    "q_hll_sketch_rollup",       # 1-row global sketch joined for ratios
    "q_ann_ivfpq_topk",          # k-row centroid frame (IVF cell assignment)
    "q_dedup_semantic",          # k-row centroid frame (SemDeDup clustering)
    "q_ivf_centroids",           # k-row centroid frame (k = label count)
    "q_ivf_search",              # k-row centroid frame
    "q_kmeans_refine",           # k-row centroid frame
    "q_text_unigram_surprisal",  # 1-row total-token-count frame
    "q_token_budget_mix",        # 1-row corpus-total frame
    "q_perplexity_buckets",      # 1-row total-token-count frame (shared nll stage)
    "q_dedup_cluster_profile",   # 1-row x 1-row singleton-count scalars
    "q_ann_ivfpq_residual_topk", # k-row centroid frame (IVF cell assignment)
    "q_mixture_temperature",     # 1-row corpus-total frame (rate solve)
    "q_mixture_upsample",        # 1-row corpus-total frame (rate solve)
    "q_dsir_selection",          # 1-row (nt, nr) totals frame x 256-row spine
    "q_ann_sq8_topk",            # 1-row SQ8 grid + 10 fixed query vectors
    "q_ann_binary_hamming",      # 1-row SQ8 grid + 10 fixed query word-pairs
    "q_ann_triplet_mining",      # 30-anchor broadcast frame (batch-hard mining)
    "q_ann_binary_recall",       # 10 fixed query vectors, both arms of the report
    "q_text_bigram_surprisal",   # 1-row total + 1-row OOV scalar frames
    "q_quality_nb_classifier",   # 1-row (n_pos, n_neg, v) + 1-row OOV scalars
    "q_dedup_minhash_recall",    # 1-row x 1-row x 1-row report scalars
    "q_dedup_containment_recall",  # six 1-row report scalars crossJoined
    "q_dedup_editdistance",  # 1-row id-offset aggregate broadcast (_ed_corpus)
    "q_dedup_editdistance_recall",  # two 1-row report scalars crossJoined
    "q_multimodal_phash_recall",   # exact all-pairs arm on a bounded sample (instrument)
    "q_dedup_semantic_recall",     # exact all-pairs arm on a bounded sample (instrument)
    "q_decontaminate_semantic",    # broadcast eval frame (benchmarks are MBs), map-side screen
    "q_ann_srp_recall",          # 10 fixed query vectors, both arms of the report
    "q_ann_nprobe_curve",        # k-row centroid frame + 3-row probe-width frame
    "q_prefix_cache_share",      # 3-row tier frame + 1-row totals frame
    "q_ann_cascade_topk",        # 10 fixed query vectors + 1-row SQ8 grid
}


def test_no_query_builds_a_cartesian_product_or_allpairs_bnlj(spark):
    """Global plan hygiene: no registered query may plan a
    CartesianProduct, and only queries joining bounded broadcast frames
    (whitelist above) may plan a BroadcastNestedLoopJoin — an
    unconstrained non-equi join over two data-sized sides is never
    survivable at 100 TB."""
    cartesian, bnlj = [], []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF)
        plan = plan_of(spark, df)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_BOUNDED_FRAME_OK:
            bnlj.append(name)
    assert not cartesian, f"CartesianProduct: {cartesian}"
    assert not bnlj, f"non-whitelisted BroadcastNestedLoopJoin: {bnlj}"


def test_banded_dedup_plans_are_equi_joins(spark):
    """The round-3 rewrite pins: banded SimHash and LSH-gated cosine
    must plan NO nested-loop join at all — candidates come from
    shuffle equi-joins on (band, bval) / bucket strings."""
    for name in ("q_dedup_simhash", "q_dedup_embedding_cosine"):
        plan = plan_of(spark, REGISTRY[name].fn(spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_results_invariant_to_shuffle_partitioning(spark):
    """The determinism contract's core claim: results are identical
    under a different (hostile, prime) shuffle-partition count.  Covers
    one decimal aggregate, one top-k, one double-producing query and
    one Python-boundary query."""
    from tests.oracle import compare_query

    names = [
        "q01_pricing_summary",
        "q_window_top_customers",
        "q_regression_tokens_vs_chars",
        "q_embedding_gram",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        for name in names:
            q = REGISTRY[name]
            ok, msg = compare_query(spark, name, q.fn, q.oracle, SF)
            assert ok, f"{name} under 7 shuffle partitions: {msg}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    """bloom_might_contain must pass every true key (no false negatives)
    and drop a meaningful share of non-matching fact rows."""
    from pyspark.sql import functions as F

    from sayn_spark.functions.registry import T
    from sayn_spark.functions.scale import bloom_bitmap, bloom_might_contain

    keys = (
        T(spark, SF, "orders")
        .where((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey")
    )
    li = T(spark, SF, "lineitem").select("l_orderkey")
    pref = li.join(F.broadcast(bloom_bitmap(keys, "o_orderkey"))).where(
        bloom_might_contain("l_orderkey")
    )
    total = li.count()
    prefiltered = pref.count()
    exact = li.join(
        F.broadcast(keys), li["l_orderkey"] == keys["o_orderkey"], "left_semi"
    ).count()
    assert exact <= prefiltered  # bloom never loses a true match
    assert prefiltered < total * 0.5  # and actually prunes the scan
    # false-positive rate within an order of magnitude of the design fpp
    assert (prefiltered - exact) <= max(100, int(0.1 * total))


def test_table_checksum_invariant_to_partitioning(spark):
    """The checksum is a commutative fold: any repartitioning of the
    input must produce identical (n, sum_mod, xor_h) per group."""
    rows = lambda df: {tuple(r) for r in df.collect()}
    from pyspark.sql import functions as F

    from sayn_spark.functions.registry import T
    base = rows(REGISTRY["q_table_checksum"].fn(spark, SF))

    li = T(spark, SF, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
    )
    rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    for nparts in (3, 17):
        redone = rows(
            li.repartition(nparts)
            .select("l_returnflag", rh.alias("rh"))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("rh") % 1_000_000_007).alias("sum_mod"),
                F.expr("bit_xor(rh)").alias("xor_h"),
            )
        )
        assert redone == base


def test_prefix_filter_prunes_postings_and_matches_full_join(spark):
    """The rare-token prefix index must carry far fewer postings than
    the full inverted index, and yield identical verified pairs."""
    from pyspark.sql import functions as F

    full = {
        tuple(r)
        for r in REGISTRY["q_dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    pref = {
        tuple(r)
        for r in REGISTRY["q_dedup_prefix_filter"].fn(spark, SF).collect()
    }
    assert pref == full
    assert len(pref) > 0

    from sayn_spark.functions.dedup import _doc_corpus, _staged_shingles

    shingled = _staged_shingles(
        _doc_corpus(spark, SF, mutate=" zz qq")
    ).where(F.size("sh") > 0)
    n_postings = shingled.select(F.explode("sh")).count()
    n_prefix = (
        shingled.select(F.size("sh").alias("n"))
        .select(F.expr("sum(n - ((4 * n + 4) div 5) + 1)").alias("p"))
        .collect()[0]["p"]
    )
    # at t=0.8 the prefix keeps ~1/5 of each posting list (+1)
    assert n_prefix < 0.3 * n_postings


def test_referential_integrity_uses_broadcast_anti_joins(spark):
    """All three RI checks must run as broadcast anti joins on pruned
    key columns — no sort-merge shuffle, no wide scans."""
    df = REGISTRY["q_referential_integrity"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_pq_adc_broadcasts_codebook_and_luts(spark):
    """q_ann_pq_adc_topk's scale contract: the 128-row codebook and the
    per-query lookup tables join by BROADCAST (the code scan never
    shuffles on the join key), so the only wide exchanges left are the
    per-vector aggregations."""
    df = REGISTRY["q_ann_pq_adc_topk"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert plan.count("BroadcastHashJoin") >= 3  # cb x2 (encode, lut) + adc lut
    from sayn_spark.functions.registry import release_persisted

    release_persisted()
    spark.catalog.clearCache()


def test_star_components_rounds_shrink_edges(spark):
    """Star contraction must not inflate the edge set: after each
    round the (deduplicated) edge list is at most the symmetrised
    input size, and the fixpoint is a star forest — every surviving
    edge points directly at its component minimum."""
    from pyspark.sql import functions as F

    from sayn_spark.functions.components import star_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)] + [(100, 101), (101, 102)],
        schema="src long, dst long",
    )
    comp = star_components(edges)
    # star forest: component id == min node of each cluster
    rows = comp.collect()
    assert {r.component for r in rows} == {0, 100}
    assert all(r.component <= r.node for r in rows)


def test_gopher_rules_is_pure_map_side(spark):
    """The Gopher rule query must plan ZERO exchanges: every signal and
    every gate is a per-row expression over the text scan, so the pass
    is linear in corpus bytes and composes with predicate pushdown —
    the property that makes it the front-door filter at 100 TB."""
    df = REGISTRY["q_quality_gopher_rules"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "Exchange" not in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_top_ngram_signals_are_pure_map_side(spark):
    """The MassiveText coverage signals must plan no KEYED exchange:
    every signal folds over the doc's own token array (sorted-gram run
    lengths in higher-order functions), so no explode, no groupBy, no
    window.  The one exchange allowed is the width-guard's round-robin
    fan-out (r14): on a test-sized single-row-group file the fold ran
    serial on one task, so the scan repartitions to cluster width —
    the guard is a no-op at production scale where splits >> cores,
    and a round-robin exchange keys on nothing."""
    df = REGISTRY["q_repetition_top_ngram"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, plan


def test_media_router_is_pure_map_side(spark):
    """The eight-format routing instrument must plan ZERO exchanges:
    synthesize and route are two chained Arrow mapInPandas stages over
    the documents scan, so payloads never shuffle and never leave the
    executors — the property that makes pre-decode routing linear in
    crawl bytes at 100 TB.  The scan must also prune to (doc_id, text):
    routing reads no other column."""
    df = REGISTRY["q_multimodal_route_media"].fn(spark, SF)
    plan = plan_of(spark, df)
    assert "Exchange" not in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema
