"""Every registered query must also RUN at sf0.001 (~6k lineitem rows)
— the driver's t1 smoke scale.  Tiny inputs hit the edge cases sf0.01
can't: empty filter results, single-element windows, groups below
top-k cutoffs, empty partitions after a 16-way range split.  Schema
must be non-empty and collect() must succeed; values are the sf0.01
oracle sweep's job."""

from __future__ import annotations

import pytest

from sayn_spark.functions import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_at_tiny_scale(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    assert df.columns, f"{name}: empty schema"
    rows = df.limit(1000).collect()
    assert rows is not None
