"""Full-registry correctness sweep → PARITY_LOCAL.json.

The driver's CORRECTNESS_r{N}.json only covers a fixed 50-query subset
of the registry; this script runs the IDENTICAL gate (Spark result vs
DuckDB oracle on the same parquet: row count + column names +
order-insensitive value compare, via tests/oracle.py) over EVERY
registered query and writes a per-query JSON artifact so each round's
full coverage is diffable:

    python parity_sweep.py              # sf0.01, writes PARITY_LOCAL.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python parity_sweep.py out.json

Queries whose semantics are not SQL-expressible (oracle=None) are
recorded as check="rows_only" with their row count, mirroring the
driver's weaker check.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PARITY_LOCAL.json"

    from sayn_spark.functions import REGISTRY, release_persisted
    from sayn_spark.session import get_spark
    from tests.oracle import compare_query

    spark = get_spark("sayn-spark-parity")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    n_ok = 0
    t_start = time.perf_counter()
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            ok, msg = compare_query(spark, name, q.fn, q.oracle, sf_dir)
        except Exception as e:  # a crash is a failure, not a skip
            ok, msg = False, f"exception: {e!r:.300}"
        results[name] = {
            "ok": bool(ok),
            "check": "oracle_hash" if q.oracle else "rows_only",
            "detail": msg,
            "sec": round(time.perf_counter() - t0, 3),
        }
        n_ok += ok
        release_persisted()
        spark.catalog.clearCache()
    total_sec = round(time.perf_counter() - t_start, 1)

    artifact = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_ok": n_ok,
        "n_fail": len(results) - n_ok,
        "total_sec": total_sec,
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {k: artifact[k] for k in ("sf_dir", "n_queries", "n_ok", "n_fail", "total_sec")}
        )
    )
    spark.stop()
    if artifact["n_fail"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
