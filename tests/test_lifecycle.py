"""Lifecycle tests: drive real tasks (config -> setup -> run -> test)
against a local SparkSession — the reference's simulate_task /
tables_with_data approach (tests/__init__.py:83-245) rebuilt on Spark.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from sayn_spark.core.app import App
from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext, TaskStatus
from sayn_spark.operators.sql import SqlTask

EXAMPLE = Path(__file__).parent.parent / "examples" / "star_project"


def rows(spark, table, order_by):
    return [
        tuple(r) for r in spark.table(table).orderBy(order_by).collect()
    ]


@pytest.fixture
def ctx(spark, tmp_path):
    return TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(parameters={"x": 1}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={"x": 1},
        connections={},
        project_dir=tmp_path,
    )


def test_incremental_merge_fixture(ctx, spark, tmp_path):
    """FIXTURES.md §1 — the reference's canonical incremental case
    (tests/test_task_autosql.py:70-108): rows with matching delete_key
    replaced, new rows inserted, NULL incremental keys always selected.
    """
    db = ctx.db
    db.load_data(
        "source_table",
        [
            {"id": 1, "updated_at": 1, "name": "x"},
            {"id": 2, "updated_at": 2, "name": "y1"},
            {"id": 3, "updated_at": None, "name": "z"},
        ],
        schema="id long, updated_at long, name string",
        replace=True,
    )
    db.load_data(
        "test_autosql_task",
        [
            {"id": 1, "updated_at": 1, "name": "x"},
            {"id": 2, "updated_at": None, "name": "y"},
        ],
        schema="id long, updated_at long, name string",
        replace=True,
    )
    (tmp_path / "model.sql").write_text(
        "SELECT * FROM source_table WHERE updated_at >= 2 OR updated_at IS NULL"
    )
    task = SqlTask(
        "test_autosql_task",
        {
            "file_name": "model.sql",
            "materialisation": "incremental",
            "delete_key": "id",
            "destination": "test_autosql_task",
        },
        ctx,
    )
    task.config()
    task.run()
    assert rows(spark, "test_autosql_task", "id") == [
        (1, 1, "x"),
        (2, 2, "y1"),
        (3, None, "z"),
    ]


def test_table_view_script_materialisations(ctx, spark, tmp_path):
    db = ctx.db
    db.load_data("src_t", [{"a": 1}, {"a": 2}], schema="a long", replace=True)
    (tmp_path / "m.sql").write_text("SELECT a * 2 AS b FROM src_t")

    t = SqlTask("m_table", {"file_name": "m.sql", "materialisation": "table", "destination": "m_table"}, ctx)
    t.config()
    t.run()
    assert rows(spark, "m_table", "b") == [(2,), (4,)]
    assert db.object_type("m_table") == "table"

    v = SqlTask("m_view", {"file_name": "m.sql", "materialisation": "view", "destination": "m_view"}, ctx)
    v.config()
    v.run()
    assert db.object_type("m_view") == "view"
    assert rows(spark, "m_view", "b") == [(2,), (4,)]

    (tmp_path / "s.sql").write_text(
        "DROP TABLE IF EXISTS scripted; CREATE TABLE scripted AS SELECT 42 AS x"
    )
    s = SqlTask("m_script", {"file_name": "s.sql", "materialisation": "script"}, ctx)
    s.config()
    s.run()
    assert rows(spark, "scripted", "x") == [(42,)]


def test_config_macro_overrides_materialisation(ctx, tmp_path):
    (tmp_path / "c.sql").write_text(
        "{{ config(materialisation='view') }}SELECT 1 AS one"
    )
    t = SqlTask("cfg_task", {"file_name": "c.sql", "materialisation": "table", "destination": "cfg_task"}, ctx)
    t.config()
    assert t.materialisation == "view"


def test_standard_tests_pass_and_fail(ctx, spark, tmp_path):
    db = ctx.db
    db.load_data(
        "dirty",
        [{"id": 1, "alias": "first"}, {"id": 1, "alias": "bogus"}, {"id": None, "alias": "second"}],
        schema="id long, alias string",
        replace=True,
    )
    (tmp_path / "d.sql").write_text("SELECT * FROM dirty")
    t = SqlTask(
        "dirty_out",
        {
            "file_name": "d.sql",
            "materialisation": "table",
            "destination": "dirty_out",
            "columns": [
                {"name": "id", "tests": ["unique", "not_null"]},
                {"name": "alias", "tests": [{"allowed_values": ["first", "second", "third"]}]},
            ],
        },
        ctx,
    )
    t.config()
    t.run()
    with pytest.raises(AssertionError, match="standard tests failed"):
        t.test()
    # clean table passes
    db.load_data("clean", [{"id": 1, "alias": "first"}], schema="id long, alias string", replace=True)
    (tmp_path / "cl.sql").write_text("SELECT * FROM clean")
    t2 = SqlTask(
        "clean_out",
        {
            "file_name": "cl.sql",
            "materialisation": "table",
            "destination": "clean_out",
            "columns": [{"name": "id", "tests": ["unique", "not_null"]}],
        },
        ctx,
    )
    t2.config()
    t2.run()
    t2.test()  # no raise


def test_example_project_end_to_end(spark, tmp_path):
    """Full App lifecycle over the example star project: python loader,
    sql models (table/view/incremental), implicit src edges, custom test."""
    proj = tmp_path / "star_project"
    shutil.copytree(EXAMPLE, proj)
    app = App(proj, spark=spark, run_arguments=RunArguments(command="run"))
    # implicit edges: f_rankings depends on f_orders + dim_customer via src()
    assert "f_orders" in app.dag["f_rankings"] and "dim_customer" in app.dag["f_rankings"]
    assert "load_sources" in app.dag["dim_customer"]
    statuses = app.run()
    assert all(s == TaskStatus.SUCCESS for s in statuses.values()), statuses
    assert spark.table("f_rankings").count() > 0
    assert app.db.object_type("f_rankings") == "view"
    # incremental table exists and re-running merges idempotently
    n1 = spark.table("orders_inc").count()
    app2 = App(proj, spark=spark, run_arguments=RunArguments(command="run", include=["orders_inc"]))
    statuses = app2.run()
    assert statuses["orders_inc"] == TaskStatus.SUCCESS
    assert spark.table("orders_inc").count() == n1

    # compile command writes compiled SQL
    app3 = App(proj, spark=spark, run_arguments=RunArguments(command="compile", include=["dim_customer"]))
    app3.compile()
    compiled = (proj / "compile" / "models" / "dim_customer.sql").read_text()
    assert "{{" not in compiled and "customer" in compiled


def test_sql_task_column_spec_rename_cast_and_validation(ctx, spark, tmp_path):
    """Declared columns on sql/autosql: dst_name renames and type casts
    are applied in place (reference stores them as DDL metadata,
    database/__init__.py:20-37; applying them is the engine's job here),
    undeclared columns pass through, and malformed specs / missing
    columns are rejected loudly — the reference's pydantic
    Extra.forbid behavior (tests/test_task_autosql.py ddl cases)."""
    db = ctx.db
    db.load_data(
        "colsrc",
        [{"id": 1, "amount": "2.50", "note": "a"}, {"id": 2, "amount": "3.25", "note": "b"}],
        schema="id long, amount string, note string",
        replace=True,
    )
    (tmp_path / "c.sql").write_text("SELECT * FROM colsrc")

    def mk(name, columns, materialisation="table"):
        return SqlTask(
            name,
            {
                "file_name": "c.sql",
                "materialisation": materialisation,
                "destination": name,
                "columns": columns,
            },
            ctx,
        )

    t = mk(
        "col_out",
        [
            {"name": "id", "dst_name": "pk", "tests": ["unique", "not_null"]},
            {"name": "amount", "type": "decimal(10,2)"},
        ],
    )
    t.config()
    t.run()
    got = spark.table("col_out")
    # rename + cast applied, undeclared column preserved in position
    assert got.columns == ["pk", "amount", "note"]
    assert dict(got.dtypes)["amount"] == "decimal(10,2)"
    t.test()  # standard tests address the RENAMED column

    # view materialisation applies the same transformation textually
    tv = mk(
        "col_view",
        [{"name": "id", "dst_name": "pk", "type": "string"}],
        materialisation="view",
    )
    tv.config()
    tv.run()
    gv = spark.table("col_view")
    assert gv.columns == ["pk", "amount", "note"]
    assert dict(gv.dtypes)["pk"] == "string"

    # malformed specs are rejected at config time
    for bad in (
        [{"name": "id", "typo_key": 1}],
        [{"name": "id"}, {"name": "id"}],
        [{"name": "id", "tests": ["uniq"]}],
        [{"name": "id", "tests": [{"allowed_values": []}]}],
        [{"no_name": "x"}],
    ):
        tb = mk("bad_out", bad)
        with pytest.raises(ValueError):
            tb.config()

    # declared column missing from the SELECT fails loudly at run time
    tm = mk("miss_out", [{"name": "nope", "dst_name": "x"}])
    tm.config()
    with pytest.raises(ValueError, match="declared columns \\['nope'\\]"):
        tm.run()


def test_decorated_task_name_collision_raises(spark, tmp_path):
    """A @task whose name collides with a YAML task must raise like the
    YAML/autogroup duplicate paths do — setdefault used to drop the
    decorated task silently."""
    import pytest

    proj = tmp_path / "dup"
    (proj / "tasks").mkdir(parents=True)
    (proj / "python").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "tasks" / "g.yaml").write_text("tasks:\n  clash: {type: dummy}\n")
    (proj / "python" / "t.py").write_text(
        "from sayn_spark.operators import task\n"
        "@task(name='clash')\n"
        "def clash(context):\n"
        "    pass\n"
    )
    with pytest.raises(ValueError, match="duplicate task name 'clash'"):
        App(proj, spark=spark, run_arguments=RunArguments(command="run"))


def test_skip_propagation_and_fail_fast(spark, tmp_path):
    proj = tmp_path / "p"
    (proj / "tasks").mkdir(parents=True)
    (proj / "sql").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "sql" / "boom.sql").write_text("SELECT * FROM table_that_does_not_exist_xyz")
    (proj / "sql" / "ok.sql").write_text("SELECT 1 AS x")
    (proj / "tasks" / "g.yaml").write_text(
        """
tasks:
  boom: {type: sql, materialisation: table, file_name: boom.sql, destination: boom}
  child: {type: sql, materialisation: table, file_name: ok.sql, destination: child_t, parents: [boom]}
  independent: {type: sql, materialisation: table, file_name: ok.sql, destination: indep_t}
"""
    )
    app = App(proj, spark=spark, run_arguments=RunArguments(command="run"))
    statuses = app.run(parallel=False)
    assert statuses["boom"] == TaskStatus.FAILED
    assert statuses["child"] == TaskStatus.SKIPPED  # ref: task_wrapper.py:269-300
    assert statuses["independent"] == TaskStatus.SUCCESS


def test_task_selection_queries(spark, tmp_path):
    proj = tmp_path / "sel"
    (proj / "tasks").mkdir(parents=True)
    (proj / "sql").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "sql" / "ok.sql").write_text("SELECT 1 AS x")
    (proj / "tasks" / "g.yaml").write_text(
        """
tasks:
  a: {type: dummy, tags: [mine]}
  b: {type: dummy, parents: [a]}
  c: {type: dummy, parents: [b]}
"""
    )
    app = App(
        proj, spark=spark, run_arguments=RunArguments(command="run", include=["+c"], exclude=["a"])
    )
    assert app.select_tasks() == ["b", "c"]
    app2 = App(proj, spark=spark, run_arguments=RunArguments(command="run", include=["tag:mine"]))
    assert app2.select_tasks() == ["a"]
