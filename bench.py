"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "trials": N}.

Each query is executed with a noop-sink write that forces full
evaluation without driver-side collect of big results.  Every query
runs $SPARK_GRAFT_TRIALS + 1 times (default 5 + 1) and two medians are
reported — single-trial timings on a shared box swing +/-30%, which
made round-over-round regressions unattributable:

- ``queries`` / ``value``: WARM medians (runs 2..N+1, after the first
  run has populated Spark's codegen class cache and the Python-worker
  pool for that query).  This is operator cost — the number that
  should trend with plan changes across rounds.
- ``queries_cold`` / ``value_cold``: medians over runs 1..N, the exact
  metric earlier rounds reported (their run 1 carried first-compile
  overhead too), kept so BENCH_r{N} files stay comparable.

Caching is NOT the difference between the two: every run (including
warm ones) starts with the persisted intermediates released and the
cache cleared, so each measures the full scan-to-sink pipeline.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q09_product_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q_window_top_customers",
    "q_events_sessionize",
    "q_events_retention",
    "q_incremental_merge",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_passages",
    "q_dedup_simhash",
    "q_dedup_embedding_cosine",
    "q_dedup_editdistance",
    "q_dedup_components",
    "q_dedup_containment_gated",
    "q_dedup_semantic",
    "q_record_linkage",
    "q_ann_lsh_topk",
    "q_ann_ivfpq_topk",
    "q_text_quality",
    "q_text_unigram_surprisal",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "5")))
    from sayn_spark.functions import REGISTRY, release_persisted
    from sayn_spark.session import get_spark

    spark = get_spark("sayn-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = [n for n in sys.argv[1:] if n in REGISTRY]
    names = extra or names

    # warm the JVM + parquet footers once so timings measure the queries
    REGISTRY[names[0]].fn(spark, sf_dir).count()

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(trials + 1):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            # queries persist intermediates; drop them between runs so
            # every run (and every later query) starts uncached
            release_persisted()
            spark.catalog.clearCache()
        cold[name] = round(statistics.median(samples[:trials]), 3)
        w = samples[1:]
        warm[name] = round(statistics.median(w), 3)
        # warm min..max range: how trustworthy is this query's median on
        # this box?  sub-1.5s queries historically swing +/-20-40%
        spread[name] = round(max(w) - min(w), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(warm.values()), 3),
                "unit": "sec",
                "queries": warm,
                "queries_spread": spread,
                "queries_cold": cold,
                "value_cold": round(sum(cold.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "trials": trials,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
