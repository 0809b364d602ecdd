"""Type mapping (SURVEY §1.3) + partitioned/bucketed writer options +
fail-fast behavior."""

from __future__ import annotations

import datetime as dt
import decimal
import textwrap

from pyspark.sql import types as T

from sayn_spark.core.types import (
    py_type_to_spark,
    schema_from_ddl_columns,
    schema_from_first_record,
)


def test_py2spark_mapping():
    assert py_type_to_spark(int) == T.LongType()
    assert py_type_to_spark(str) == T.StringType()
    assert py_type_to_spark(float) == T.DoubleType()
    assert py_type_to_spark(decimal.Decimal) == T.DecimalType(38, 18)
    assert py_type_to_spark(dt.datetime) == T.TimestampType()
    assert py_type_to_spark(bytes) == T.BinaryType()
    assert py_type_to_spark(bool) == T.BooleanType()
    assert py_type_to_spark(dt.date) == T.DateType()
    assert py_type_to_spark(dt.time) == T.StringType()  # documented fallback
    assert py_type_to_spark(dt.timedelta) == T.DayTimeIntervalType()


def test_first_record_inference():
    s = schema_from_first_record({"a": 1, "b": "x", "c": None})
    assert [f.dataType for f in s.fields] == [T.LongType(), T.StringType(), T.StringType()]


def test_ddl_schema_with_aliases_and_renames():
    s = schema_from_ddl_columns(
        [{"name": "a", "type": "int"}, {"name": "b", "type": "text", "dst_name": "bb"}]
    )
    assert s.fieldNames() == ["a", "bb"]
    assert s.fields[0].dataType == T.LongType()


def test_partitioned_table_write(spark, tmp_path):
    """partition_by writer opts map the reference's BigQuery partition /
    Redshift dist DDL extensions (SURVEY §1.4) onto Spark."""
    from sayn_spark.core.database import SparkDatabase

    db = SparkDatabase(spark)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], schema="id long, part string"
    )
    db.create_table("part_t", df, partition_by=["part"])
    got = spark.table("part_t")
    assert got.count() == 3
    # partition column must prune: only one partition read when filtered
    plan = got.where("part = 'a'")._jdf.queryExecution().executedPlan().toString()
    assert "part_t" in plan


def test_fail_fast_interrupts_remaining(spark, tmp_path):
    from sayn_spark.core.app import App
    from sayn_spark.operators import RunArguments, TaskStatus

    proj = tmp_path / "ff"
    (proj / "tasks").mkdir(parents=True)
    (proj / "sql").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "sql" / "boom.sql").write_text("SELECT * FROM nope_xyz")
    (proj / "sql" / "ok.sql").write_text("SELECT 1 AS x")
    (proj / "tasks" / "g.yaml").write_text(
        textwrap.dedent(
            """
            tasks:
              boom: {type: sql, materialisation: table, file_name: boom.sql, destination: ff_boom}
              later: {type: sql, materialisation: table, file_name: ok.sql, destination: ff_later, parents: [boom]}
              other: {type: sql, materialisation: table, file_name: ok.sql, destination: ff_other, parents: [boom]}
            """
        )
    )
    app = App(
        proj, spark=spark, run_arguments=RunArguments(command="run", fail_fast=True)
    )
    statuses = app.run(parallel=False)
    assert statuses["boom"] == TaskStatus.FAILED
    assert statuses["later"] == TaskStatus.SKIPPED
    assert statuses["other"] == TaskStatus.SKIPPED
