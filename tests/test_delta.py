"""Delta-layer capability probe and the upgrade paths behind it.

delta-spark is not in this container, so the probe must cleanly say NO
and every materialisation must take the parquet/rename plans (the rest
of the suite covers those).  When delta-spark IS present (a real
deployment), the gated tests below run instead of skipping and pin the
MERGE INTO / ACID-overwrite behavior.
"""

from __future__ import annotations

import pytest

from sayn_spark.core.database import SparkDatabase, delta_enabled
from sayn_spark.session import delta_installed

needs_delta = pytest.mark.skipif(
    not delta_installed(), reason="delta-spark not installed"
)


def test_probe_is_consistent(spark):
    """Probe agrees between package check and session check, and the
    database object picks it up as its default."""
    db = SparkDatabase(spark)
    assert db.use_delta == delta_enabled(spark)
    if not delta_installed():
        assert delta_enabled(spark) is False
        assert db.use_delta is False


def test_explicit_override_beats_probe(spark):
    assert SparkDatabase(spark, use_delta=False).use_delta is False


def test_parquet_fallback_merge_unaffected(spark):
    """With the probe off, merge_tables keeps the staging+rename plan
    and exact reference semantics (NULL src keys match nothing)."""
    db = SparkDatabase(spark, use_delta=False)
    db.load_data(
        "dl_dst",
        [{"id": 1, "v": "old"}, {"id": None, "v": "keep"}],
        schema="id long, v string",
        replace=True,
    )
    db.load_data(
        "dl_src",
        [{"id": 1, "v": "new"}, {"id": 2, "v": "ins"}],
        schema="id long, v string",
        replace=True,
    )
    db.merge_tables("dl_src", "dl_dst", "id")
    got = sorted(
        ((r.id, r.v) for r in spark.table("dl_dst").collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert got == [(1, "new"), (2, "ins"), (None, "keep")]
    assert not spark.catalog.tableExists("dl_src")


@needs_delta
def test_delta_merge_into(spark):
    """MERGE INTO path: same visible semantics as the fallback, no
    table rename, and the dst stays a Delta table."""
    db = SparkDatabase(spark)
    assert db.use_delta, "probe must be on when delta-spark is installed"
    db.load_data(
        "ddl_dst",
        [{"id": 1, "v": "old"}, {"id": None, "v": "keep"}],
        schema="id long, v string",
        replace=True,
    )
    db.load_data(
        "ddl_src",
        [{"id": 1, "v": "new"}, {"id": 2, "v": "ins"}],
        schema="id long, v string",
        replace=True,
    )
    assert db._table_provider("ddl_dst") == "delta"
    db.merge_tables("ddl_src", "ddl_dst", "id")
    got = sorted(
        ((r.id, r.v) for r in spark.table("ddl_dst").collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert got == [(1, "new"), (2, "ins"), (None, "keep")]
    assert db._table_provider("ddl_dst") == "delta"


@needs_delta
def test_delta_acid_replace(spark):
    db = SparkDatabase(spark)
    db.load_data("ddl_rep", [{"id": 1}], schema="id long", replace=True)
    import pyspark.sql.functions as F

    db.replace_table("ddl_rep", spark.range(5).select(F.col("id")))
    assert spark.table("ddl_rep").count() == 5
    assert db._table_provider("ddl_rep") == "delta"
