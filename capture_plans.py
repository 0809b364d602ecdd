"""Capture .explain("formatted") for bench queries into plans/r14/.

Usage: python capture_plans.py before|after [query...]
Defaults to every bench HEADLINE query that lives in the REGISTRY.
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    if suffix not in ("before", "after"):
        raise SystemExit("usage: capture_plans.py before|after [query...]")
    names = sys.argv[2:]

    from bench import HEADLINE

    from sayn_spark.functions import REGISTRY, release_persisted
    from sayn_spark.session import get_spark

    if not names:
        names = [n for n in HEADLINE if n in REGISTRY]

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("sayn-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_persisted()
        spark.catalog.clearCache()
        print(f"captured {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
