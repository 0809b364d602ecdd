"""Run the local correctness gate for a subset of queries.

    python -m tests.gate_one q_quality_nb_classifier [more...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python -m tests.gate_one q_...

Same compare as parity_sweep.py, restricted to the named queries —
the fast feedback loop while building a new operator.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    if not names:
        print("usage: python -m tests.gate_one <query> [query...]")
        sys.exit(2)

    from sayn_spark.functions import REGISTRY, release_persisted
    from sayn_spark.session import get_spark
    from tests.oracle import compare_query

    spark = get_spark("sayn-spark-gate-one")
    spark.sparkContext.setLogLevel("ERROR")
    n_bad = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            ok, msg = compare_query(spark, name, q.fn, q.oracle, sf_dir)
        except Exception as e:
            ok, msg = False, f"exception: {e!r:.500}"
        n_bad += not ok
        print(f"{name}: {'OK' if ok else 'FAIL'} ({time.perf_counter() - t0:.2f}s) {msg}")
        release_persisted()
        spark.catalog.clearCache()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
