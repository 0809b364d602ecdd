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


def test_multimodal_resize_stub(spark):
    """resize plumbing: 1:1 mapInPandas with payload passthrough
    (deterministic path, no container format required)."""
    from sayn_spark.functions.multimodal import resize_images, with_payload
    from sayn_spark.functions.registry import T

    d = with_payload(T(spark, SF_CORRECT, "documents").limit(20))
    out = resize_images(d, 224, 224)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 224 and r.height == 224 and r.payload for r in rows)
