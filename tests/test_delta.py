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


class _RecordingSpark:
    """Stub session facade: records SQL statements instead of executing
    them; catalog reads pass through to the real session so the code
    under test can resolve schemas and object types."""

    def __init__(self, real):
        self._real = real
        self.stmts: list[str] = []

    def sql(self, statement):
        self.stmts.append(" ".join(statement.split()))
        return None

    def __getattr__(self, name):  # table/catalog/conf/... -> real session
        return getattr(self._real, name)


class _RecordingWriter:
    def __init__(self, calls):
        self.calls = calls

    def mode(self, m):
        self.calls.append(("mode", m))
        return self

    def format(self, f):
        self.calls.append(("format", f))
        return self

    def partitionBy(self, *cols):
        self.calls.append(("partitionBy", cols))
        return self

    def bucketBy(self, n, *cols):
        self.calls.append(("bucketBy", (n, cols)))
        return self

    def sortBy(self, *cols):
        self.calls.append(("sortBy", cols))
        return self

    def saveAsTable(self, name):
        self.calls.append(("saveAsTable", name))


class _RecordingDF:
    def __init__(self, calls):
        self._calls = calls

    @property
    def write(self):
        return _RecordingWriter(self._calls)


def test_delta_merge_statements_string_verified(spark, monkeypatch):
    """The Delta MERGE branch, statement-verified against a stub
    provider (delta-spark is not installable in this sandbox; the live
    MERGE execution remains the one cluster-only skip).  Pins the exact
    two statements the reference template mandates
    (merge_tables.sql:1-12): DELETE matched keys via MERGE INTO over
    the DISTINCT src keys with plain ``=`` (NULL src keys match
    nothing), then INSERT everything."""
    SparkDatabase(spark, use_delta=False).load_data(
        "ds_dst", [{"id": 1, "k": "a", "v": "x"}], schema="id long, k string, v string",
        replace=True,
    )
    # the schema-drift gate (r14 second pass) reads BOTH tables' columns
    # before branching, so the source must exist even in stub mode
    SparkDatabase(spark, use_delta=False).load_data(
        "ds_src", [{"id": 2, "k": "b", "v": "y"}], schema="id long, k string, v string",
        replace=True,
    )
    db = SparkDatabase(spark, use_delta=True)
    rec = _RecordingSpark(spark)
    db.spark = rec
    monkeypatch.setattr(db, "_table_provider", lambda name: "delta")
    db.merge_tables("ds_src", "ds_dst", ["id", "k"])
    assert rec.stmts[0] == (
        "MERGE INTO ds_dst AS d USING (SELECT DISTINCT id, k FROM ds_src) AS s "
        "ON d.id = s.id AND d.k = s.k WHEN MATCHED THEN DELETE"
    )
    assert rec.stmts[1] == (
        "INSERT INTO ds_dst (id, k, v) SELECT id, k, v FROM ds_src"
    )
    # drop_object on the staging table is the only other statement
    assert all("ds_dst" not in s for s in rec.stmts[2:])


def test_delta_writer_format_string_verified(spark):
    """create_table under the Delta probe must route the writer through
    format('delta') — except bucketed tables, which Delta cannot bucket
    and must stay on the session default."""
    db = SparkDatabase(spark, use_delta=True)
    calls: list = []
    db.create_table("ds_fmt", _RecordingDF(calls), mode="overwrite")
    assert ("format", "delta") in calls
    assert calls[-1] == ("saveAsTable", "ds_fmt")

    calls2: list = []
    db.create_table(
        "ds_fmt_b", _RecordingDF(calls2), mode="overwrite", bucket_by=(8, ["id"])
    )
    assert ("format", "delta") not in calls2
    assert ("bucketBy", (8, ("id",))) in calls2
