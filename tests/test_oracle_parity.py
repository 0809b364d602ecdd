"""Every registered query must match its DuckDB oracle at sf0.01 —
the same check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from sayn_spark.functions import REGISTRY
from tests.conftest import SF_CORRECT
from tests.oracle import compare_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    ok, msg = compare_query(spark, name, q.fn, q.oracle, SF_CORRECT)
    assert ok, f"{name}: {msg}"
    if q.oracle is None:
        # rows-only queries must at least produce a stable schema and run
        df = q.fn(spark, SF_CORRECT)
        assert df.columns
