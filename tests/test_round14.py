"""Round-14 regression pins — the four ADVICE r13 findings, each
reproduced against the pre-fix behavior before the fix landed:

- WAV fmt declaring sample_rate=0 ZeroDivisionError'd the router's
  duration math (``nfr * 1000 // rate``) and killed the mapInPandas
  stage instead of routing unknown.
- A corrupt BMP header (negative width) sailed through the metadata
  path and the router emitted a typed image/bmp row with negative
  dimensions.
- The copy task's NULL-incremental-key drain shared
  MAX_MERGE_ITERATIONS with the watermark loop, so a large NULL
  backlog starved the watermark rows entirely — and the while-else
  warning then misreported the drain's row count.
- _PROJECT_MODULE_CACHE keyed by (path, st_mtime): same-tick edits on
  coarse-mtime filesystems served the stale module, and superseded
  entries were never evicted.
"""

from __future__ import annotations

import struct

import pytest

from sayn_spark.core.compiler import Compiler
from sayn_spark.core.database import SparkDatabase
from sayn_spark.core.objects import DbObjectCompiler
from sayn_spark.operators import RunArguments, TaskContext


# ---------------------------------------------------------------- WAV


def _wav_zero_rate() -> bytes:
    """A structurally-valid WAV whose fmt chunk declares sample_rate=0
    (advice r13): wav_encode writes the fmt payload at offset 20, with
    sample_rate as the <I at bytes 24:28 and byte_rate at 28:32."""
    from sayn_spark.functions.multimodal import wav_encode

    good = bytearray(wav_encode([0] * 100, 16000))
    assert struct.unpack_from("<I", good, 24)[0] == 16000
    struct.pack_into("<II", good, 24, 0, 0)  # sample_rate, byte_rate
    return bytes(good)


def test_wav_zero_sample_rate_raises_value_error():
    from sayn_spark.functions.multimodal import wav_parse

    bad = _wav_zero_rate()
    with pytest.raises(ValueError, match="zero sample rate"):
        wav_parse(bad, want_samples=False)
    with pytest.raises(ValueError, match="zero sample rate"):
        wav_parse(bad)


# ---------------------------------------------------------------- BMP


def _bmp_negative_width() -> bytes:
    """bmp_encode output with the signed width field (offset 18, <i)
    patched to -16 — the empirical repro from advice r13."""
    from sayn_spark.functions.multimodal import bmp_encode

    good = bytearray(bmp_encode(bytes(range(64)), 8, 8))
    assert struct.unpack_from("<i", good, 18)[0] == 8
    struct.pack_into("<i", good, 18, -16)
    return bytes(good)


def test_bmp_negative_width_raises_value_error():
    from sayn_spark.functions.multimodal import bmp_parse

    with pytest.raises(ValueError, match="invalid dimensions"):
        bmp_parse(_bmp_negative_width())


def test_bmp_zero_height_raises_value_error():
    from sayn_spark.functions.multimodal import bmp_encode, bmp_parse

    good = bytearray(bmp_encode(bytes(range(64)), 8, 8))
    struct.pack_into("<i", good, 22, 0)  # height field
    with pytest.raises(ValueError, match="invalid dimensions"):
        bmp_parse(bytes(good))


def test_bmp_topdown_negative_height_still_parses_metadata():
    """Negative height is LEGAL BMP (top-down rows) — the new guard
    must not reject it in metadata mode."""
    from sayn_spark.functions.multimodal import bmp_encode, bmp_parse

    good = bytearray(bmp_encode(bytes(range(64)), 8, 8))
    struct.pack_into("<i", good, 22, -8)
    assert bmp_parse(bytes(good)) == (8, 8, 24)


# ------------------------------------------------------------- router


def test_router_routes_corrupt_wav_and_bmp_as_unknown(spark):
    """The two-exception contract end-to-end: the zero-rate WAV and the
    negative-width BMP route as ``unknown`` instead of killing the
    mapInPandas stage (pre-fix: ZeroDivisionError / typed garbage)."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from sayn_spark.functions.multimodal import route_media_frame

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, _wav_zero_rate()), (2, _bmp_negative_width())], schema
    )
    got = {
        r["doc_id"]: r["media_type"] for r in route_media_frame(df).collect()
    }
    assert got == {1: "unknown", 2: "unknown"}


# ---------------------------------------------------- copy drain budget


@pytest.fixture
def ctx(spark, tmp_path):
    return TaskContext(
        spark=spark,
        db=SparkDatabase(spark),
        compiler=Compiler(),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=tmp_path,
    )


def test_null_drain_budget_does_not_starve_watermark_rows(
    ctx, spark, monkeypatch, caplog
):
    """Pre-fix repro: with MAX_MERGE_ITERATIONS=2 shared across both
    loops, a 6-key NULL backlog at max_merge_rows=2 consumed the whole
    cap in the drain and the watermark rows were never merged.  With
    per-phase budgets the watermark rows load, and the capped drain
    emits its own drain-specific warning (not the watermark loop's
    misattributed "last merged chunk was full")."""
    import logging

    import sayn_spark.operators.copy as copy_mod
    from sayn_spark.operators.copy import CopyTask

    monkeypatch.setattr(copy_mod, "MAX_MERGE_ITERATIONS", 2)
    db = ctx.db
    rows = [
        {"id": i, "updated_at": None, "name": f"null{i}"} for i in range(1, 7)
    ] + [{"id": 10 + i, "updated_at": 10 + i, "name": f"wm{i}"} for i in range(3)]
    db.load_data(
        "cpd_src", rows, schema="id long, updated_at long, name string", replace=True
    )
    db.load_data(
        "cpd_dst",
        [{"id": 10, "updated_at": 10, "name": "wm0"}],
        schema="id long, updated_at long, name string",
        replace=True,
    )
    t = CopyTask(
        "cpd",
        {
            "source": {"table": "cpd_src"},
            "destination": "cpd_dst",
            "incremental_key": "updated_at",
            "delete_key": "id",
            "max_merge_rows": 2,
        },
        ctx,
    )
    t.config()
    with caplog.at_level(logging.WARNING, logger="sayn_spark"):
        t.run()
    got = {r.id for r in spark.table("cpd_dst").collect()}
    # watermark rows MUST all land despite the drain hitting its cap
    assert {10, 11, 12} <= got
    # drain merged exactly 2 chunks x 2 keys of the 6-key NULL backlog
    assert len(got & {1, 2, 3, 4, 5, 6}) == 4
    drain_warnings = [
        r for r in caplog.records if "NULL-incremental-key drain" in r.getMessage()
    ]
    assert len(drain_warnings) == 1
    assert "2 of 6 delete keys still pending" in drain_warnings[0].getMessage()


def test_null_drain_completes_within_budget_no_warning(ctx, spark, caplog):
    """Sanity twin: when the drain fits the budget, every NULL-key row
    and watermark row merges and no drain warning fires."""
    import logging

    from sayn_spark.operators.copy import CopyTask

    db = ctx.db
    rows = [
        {"id": 1, "updated_at": None, "name": "n1"},
        {"id": 2, "updated_at": None, "name": "n2"},
        {"id": 11, "updated_at": 11, "name": "w1"},
        {"id": 12, "updated_at": 12, "name": "w2"},
    ]
    db.load_data(
        "cpd2_src", rows, schema="id long, updated_at long, name string", replace=True
    )
    db.load_data(
        "cpd2_dst",
        [{"id": 11, "updated_at": 11, "name": "w1"}],
        schema="id long, updated_at long, name string",
        replace=True,
    )
    t = CopyTask(
        "cpd2",
        {
            "source": {"table": "cpd2_src"},
            "destination": "cpd2_dst",
            "incremental_key": "updated_at",
            "delete_key": "id",
            "max_merge_rows": 2,
        },
        ctx,
    )
    t.config()
    with caplog.at_level(logging.WARNING, logger="sayn_spark"):
        t.run()
    assert {r.id for r in spark.table("cpd2_dst").collect()} == {1, 2, 11, 12}
    assert not [
        r for r in caplog.records if "NULL-incremental-key drain" in r.getMessage()
    ]


# ------------------------------------------------- module cache keying


def test_module_cache_same_mtime_edit_serves_fresh_module(tmp_path):
    """Coarse-mtime repro: rewrite the file with different content but
    the SAME st_mtime (os.utime) — the size-aware key must miss and
    re-exec, and the superseded entry must be evicted."""
    import os

    from sayn_spark.operators.python import (
        _PROJECT_MODULE_CACHE,
        load_project_python_file,
    )

    proj = tmp_path / "proj"
    (proj / "python").mkdir(parents=True)
    f = proj / "python" / "mod_r14.py"
    f.write_text("VALUE = 1\n")
    st = f.stat()
    mod1, _ = load_project_python_file(proj, f)
    assert mod1.VALUE == 1

    f.write_text("VALUE = 22\n")  # different size
    os.utime(f, (st.st_atime, st.st_mtime))  # force identical mtime
    mod2, _ = load_project_python_file(proj, f)
    assert mod2.VALUE == 22

    path = str(f.resolve())
    entries = [k for k in _PROJECT_MODULE_CACHE if k[0] == path]
    assert len(entries) == 1  # superseded entry evicted


def test_module_cache_hit_on_unchanged_file(tmp_path):
    from sayn_spark.operators.python import load_project_python_file

    proj = tmp_path / "proj2"
    (proj / "python").mkdir(parents=True)
    f = proj / "python" / "mod_r14b.py"
    f.write_text("VALUE = 7\n")
    mod1, _ = load_project_python_file(proj, f)
    mod2, _ = load_project_python_file(proj, f)
    assert mod1 is mod2


# -------------------------------------------- ANN zero-norm guard hoist


def test_index_writer_enforces_positive_norm_invariant(spark, tmp_path):
    """Verdict r13 item 2: the zero-norm guard moved from the per-
    candidate search path to the index edges.  The writer must drop
    zero-norm vectors at build, and the incremental insert path must
    drop them at ingest — ``{index}_vectors`` never holds nrm <= 0, so
    the five search paths divide plainly."""
    from pyspark.sql import functions as F

    from sayn_spark.core.compiler import Compiler
    from sayn_spark.core.database import SparkDatabase
    from sayn_spark.core.objects import DbObjectCompiler
    from sayn_spark.operators import RunArguments, TaskContext
    from sayn_spark.operators.ann import AnnIndexTask, ann_insert_batch

    db = SparkDatabase(spark)
    for t in ("znv_src", "znv_ix_centroids", "znv_ix_vectors"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rows = [
        (i, [float((i * 5 + j) % 7 + 1) for j in range(4)], i % 2)
        for i in range(12)
    ]
    rows.append((77, [0.0] * 4, 0))  # empty-document embedding at build
    db.replace_table(
        "znv_src",
        spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int"),
    )
    ctx = TaskContext(
        spark=spark,
        db=db,
        compiler=Compiler(parameters={}),
        obj_compiler=DbObjectCompiler(default_db="spark"),
        run_arguments=RunArguments(),
        parameters={},
        connections={},
        project_dir=tmp_path,
    )
    ix = AnnIndexTask(
        "znv",
        {"source": "znv_src", "index": "znv_ix", "label_column": "label", "method": "ivf"},
        ctx,
    )
    ix.config()
    ix.run()
    vec = spark.table("znv_ix_vectors")
    assert vec.where(F.col("vec_id") == 77).count() == 0
    assert vec.where(F.col("nrm") <= 0).count() == 0

    # ingest path: one good + one zero-norm new vector
    batch = spark.createDataFrame(
        [(200, [1.0, 2.0, 1.0, 2.0]), (201, [0.0] * 4)],
        "vec_id long, e array<double>",
    )
    ann_insert_batch(spark, db, "znv_ix", batch)
    vec = spark.table("znv_ix_vectors")
    assert vec.where(F.col("vec_id") == 200).count() == 1
    assert vec.where(F.col("vec_id") == 201).count() == 0
    assert vec.where(F.col("nrm") <= 0).count() == 0


# --------------------------------------- hazard sweep r14: logs layer


def test_event_fanout_survives_broken_logger(caplog):
    """Hazard review r14 (exception-contract leak): one faulty logger in
    the fan-out killed the task whose lifecycle emitted the event AND
    starved every logger after it.  Now: the event reaches the healthy
    loggers, and the faulty one gets ONE warning, not one per event."""
    import logging

    from sayn_spark.logs.events import EventTracker
    from sayn_spark.logs.loggers import CollectingLogger

    class Broken:
        def report_event(self, **event):
            raise RuntimeError("logger bug")

    healthy = CollectingLogger()
    t = EventTracker(loggers=[Broken(), healthy])
    with caplog.at_level(logging.WARNING, logger="sayn_spark"):
        t.start_stage("run")
        t.finish_current_stage()
        t.report_event(context="task", event="start_task", task="x")
    assert [e["event"] for e in healthy.events] == [
        "start_stage",
        "finish_stage",
        "start_task",
    ]
    warns = [r for r in caplog.records if "logger Broken raised" in r.getMessage()]
    assert len(warns) == 1  # warn once per faulty logger, not per event


def test_file_logger_drops_events_after_close():
    """Close-then-report (a straggler task thread finishing after the
    app closed the tracker) must drop the late event, not raise."""
    import io

    from sayn_spark.logs.loggers import FileLogger

    stream = io.StringIO()
    fl = FileLogger("unused", stream=stream)
    fl.report_event(event="start_task", ts=None)
    fl.close()
    fl.report_event(event="finish_task", ts=None)  # late — must not raise
    assert stream.getvalue().count("\n") == 1

    # the mid-write race shape: stream closed but reference still held
    class Closing(io.StringIO):
        def write(self, s):
            raise ValueError("I/O operation on closed file")

    fl2 = FileLogger("unused", stream=Closing())
    fl2.report_event(event="start_task", ts=None)  # must not raise


# ----------------------------------- hazard sweep r14: source registry


def test_partition_by_string_means_one_column(spark, tmp_path):
    """``partition_by: date`` (a bare YAML string) used to splat into
    partitionBy('d','a','t','e') — reproduced as AnalysisException on
    column ``d``.  A string now means one column, for file, table and
    catalog sinks alike."""
    import os

    from sayn_spark.sources.registry import write_sink

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")],
        "id long, name string, date string",
    )
    out = str(tmp_path / "p1")
    write_sink(df, {"type": "parquet", "path": out, "partition_by": "date"})
    assert sorted(x for x in os.listdir(out) if x.startswith("date=")) == [
        "date=2024-01-01",
        "date=2024-01-02",
    ]


def test_none_option_values_mean_unset(spark, tmp_path):
    """An empty YAML entry (``compression:``) arrives as None; passing
    it into the JVM killed the write with a Spark INTERNAL_ERROR
    (reproduced).  None now means unset everywhere options pass through."""
    import os

    from sayn_spark.sources.registry import read_source, write_sink

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = str(tmp_path / "p2")
    write_sink(df, {"type": "parquet", "path": out, "compression": None})
    got = read_source(spark, {"type": "parquet", "path": out, "mergeSchema": None})
    assert got.count() == 1


def test_missing_required_source_keys_raise_clean_valueerror(spark):
    """A jdbc config without ``url`` died with a raw KeyError deep in
    the reader; every source/sink kind now validates its required keys
    up-front with the offending config's keys in the message."""
    import pytest as _pytest

    from sayn_spark.sources.registry import read_source, write_sink

    df = spark.range(1)
    with _pytest.raises(ValueError, match=r"missing required key\(s\) \['url'\]"):
        read_source(spark, {"type": "jdbc", "table": "t"})
    with _pytest.raises(ValueError, match=r"missing required key\(s\) \['table'\]"):
        read_source(spark, {"type": "jdbc", "url": "jdbc:derby:x"})
    with _pytest.raises(ValueError, match=r"missing required key\(s\) \['url'"):
        write_sink(df, {"type": "jdbc", "table": "t"})
    with _pytest.raises(ValueError, match=r"missing required key\(s\) \['path'\]"):
        write_sink(df, {"type": "parquet"})
    with _pytest.raises(ValueError, match=r"missing required key\(s\) \['name'\]"):
        write_sink(df, {"type": "table"})


# ------------------------------------------ hazard sweep r14: CLI layer


def test_cli_rejects_inverted_run_window(tmp_path):
    """--start-dt after --end-dt compiles BETWEEN clauses that match
    nothing: every incremental task loads zero rows and the run reports
    SUCCESS.  The CLI now refuses the empty window loudly (deliberate
    divergence: the reference accepts it silently)."""
    from click.testing import CliRunner

    from sayn_spark.cli import cli

    r = CliRunner().invoke(
        cli,
        ["compile", "-p", str(tmp_path), "--start-dt", "2024-02-01",
         "--end-dt", "2024-01-01"],
    )
    assert r.exit_code != 0
    assert "is after --end-dt" in r.output
    # equal bounds stay legal (a one-day window) — must get PAST the
    # window check (it then fails later on the empty project dir)
    r2 = CliRunner().invoke(
        cli,
        ["compile", "-p", str(tmp_path), "--start-dt", "2024-01-01",
         "--end-dt", "2024-01-01"],
    )
    assert "is after --end-dt" not in r2.output


# ------------------------------------- hazard sweep r14: settings layer


def test_malformed_yaml_raises_config_grade_valueerror(tmp_path):
    """A stray tab in project.yaml surfaced as a raw yaml.ScannerError
    traceback; a top-level list in a tasks file as an AttributeError.
    Both are config errors and must raise ValueError (rendered cleanly
    by the CLI) naming the file."""
    import pytest as _pytest

    from sayn_spark.core.settings import (
        load_project,
        load_settings,
        load_task_groups,
    )

    (tmp_path / "project.yaml").write_text("parameters:\n  x: 1\n\t bad")
    with _pytest.raises(ValueError, match="invalid YAML"):
        load_project(tmp_path)

    (tmp_path / "settings.yaml").write_text("- a\n- list\n")
    with _pytest.raises(ValueError, match="top level must be a mapping"):
        load_settings(tmp_path)

    tasks = tmp_path / "tasks"
    tasks.mkdir()
    (tasks / "core.yaml").write_text("- not\n- a map\n")
    with _pytest.raises(ValueError, match="top level must be a mapping"):
        load_task_groups(tmp_path)

    (tasks / "core.yaml").write_text("tasks: [a, b]\n")
    with _pytest.raises(ValueError, match="'tasks' must be a mapping"):
        load_task_groups(tmp_path)

    # empty and missing files still load as defaults
    (tasks / "core.yaml").write_text("")
    assert load_task_groups(tmp_path) == {"core": {}}
    (tmp_path / "project.yaml").write_text("")
    assert load_project(tmp_path).default_db == "spark"


# -------------------------------------- hazard sweep r14: object rules


def test_stringify_rules_validated_at_config_time():
    """Three stringify/from_prod hazards now fail at CONFIG time with
    ValueError instead of deep inside a task run: a table template
    without {table} (every table would collapse to ONE physical name —
    a dev run silently overwriting the same object per task), a typo'd
    placeholder (raw KeyError at format time), and an invalid from_prod
    regex (raw re.error traceback).  Constant overrides stay legal for
    database/schema — routing all dev objects into one database is the
    normal use."""
    import pytest as _pytest

    from sayn_spark.core.objects import DbObjectCompiler

    # legal shapes
    DbObjectCompiler(default_db="spark")
    DbObjectCompiler(default_db="spark", stringify={"schema_override": "dev_schema"})
    DbObjectCompiler(default_db="spark", stringify={"database_override": "devdb"})
    c = DbObjectCompiler(default_db="spark", stringify={"table_override": "dev_{table}"})
    assert c.out_value(c.from_string("t1")) == "dev_t1"

    with _pytest.raises(ValueError, match=r"does not contain \{table\}"):
        DbObjectCompiler(default_db="spark", stringify={"table_override": "analytics"})
    with _pytest.raises(ValueError, match=r"only \{table\} may appear"):
        DbObjectCompiler(default_db="spark", stringify={"table_override": "dev_{tble}"})
    with _pytest.raises(ValueError, match="invalid from_prod pattern"):
        DbObjectCompiler(default_db="spark", from_prod=["[unclosed"])
    with _pytest.raises(ValueError, match="rule for table"):
        DbObjectCompiler(default_db="spark", prod_stringify={"table_override": "x"})


def test_spark_catalog_name_grammar_enforced_at_parse_time():
    """The Hive metastore rejects names outside [A-Za-z0-9_] even when
    back-quoted (INVALID_SCHEMA_OR_RELATION_NAME, verified empirically)
    — so a hyphenated destination used to fail MID-RUN with a
    ParseException after upstream tasks had already executed.  The
    object compiler now rejects it at parse (config) time.  Objects on
    OTHER connections name remote tables and stay unrestricted."""
    import pytest as _pytest

    from sayn_spark.core.objects import DbObjectCompiler

    c = DbObjectCompiler(default_db="spark", connections=("spark", "jdbc_src"))
    assert c.from_string("db1.sch.t1").table == "t1"
    # remote JDBC object: hyphen legal there
    assert c.from_string("jdbc_src:my-remote-table").table == "my-remote-table"
    for bad in ("my-table", "sch.my table", "db.s.t;drop"):
        with _pytest.raises(ValueError, match="Spark catalog only accepts"):
            c.from_string(bad)
    # a stringify prefix that would break every rendered name is a
    # config error too
    with _pytest.raises(ValueError, match="outside the Spark catalog grammar"):
        DbObjectCompiler(default_db="spark", stringify={"table_prefix": "dev-"})


# ------------------------------------ hazard sweep r14: NaN watermark


def test_nan_never_poisons_the_incremental_watermark(ctx, spark):
    """Spark's MAX ranks NaN above every number, so one NaN row in the
    destination made the watermark NaN — and ``key >= NaN`` matches
    only NaN, silently skipping ALL real new data on every later
    incremental load (reproduced: 0 of 2 fresh rows loaded).  The
    watermark now skips NaN on float keys; all-NaN yields None (full
    reload)."""
    import math

    from sayn_spark.plans.materialise import incremental_filter, nan_safe_max

    db = ctx.db
    db.load_data(
        "nanw_dst",
        [{"id": 1, "ts": 1.0}, {"id": 2, "ts": float("nan")}],
        schema="id long, ts double",
        replace=True,
    )
    m = db.get_max_value("nanw_dst", "ts")
    assert m == 1.0 and not math.isnan(m)
    src = spark.createDataFrame([(3, 5.0), (4, 9.9)], "id long, ts double")
    assert incremental_filter(src, "ts", m).count() == 2

    # all-NaN destination: no usable watermark -> None -> full reload
    db.load_data(
        "nanw_dst2",
        [{"id": 1, "ts": float("nan")}],
        schema="id long, ts double",
        replace=True,
    )
    assert db.get_max_value("nanw_dst2", "ts") is None

    # non-float keys take the plain MAX path
    db.load_data(
        "nanw_dst3",
        [{"id": 1, "ts": 7}],
        schema="id long, ts long",
        replace=True,
    )
    assert db.get_max_value("nanw_dst3", "ts") == 7

    # the file-sink incremental path shares the same contract
    assert nan_safe_max(spark.table("nanw_dst"), "ts") == 1.0


# --------------------------------------- hazard sweep r14: z-order scale


def test_zorder_survives_hash_scale_columns(spark):
    """zorder_by's min-max scaling did raw BIGINT subtraction: columns
    spanning the long range — exactly this engine's own xxhash64-derived
    ids — killed the job with ARITHMETIC_OVERFLOW under ANSI
    (reproduced).  Scaling now runs in double; grid assignment keeps
    working for normal ranges."""
    from sayn_spark.plans.maintenance import zorder_by

    df = spark.createDataFrame(
        [(-(2**63), 1), (2**63 - 1, 2), (0, 3)], "a long, b long"
    )
    out = zorder_by(df, "a", "b", n_files=2).collect()
    assert len(out) == 3

    # sanity on a small range: z-order keeps locality (same rows survive)
    small = spark.createDataFrame([(i, i % 4) for i in range(32)], "a long, b long")
    assert zorder_by(small, "a", "b", n_files=4).count() == 32


def test_cli_rejects_window_inverted_against_the_default_end(tmp_path):
    """Second-pass review r14: --start-dt later than YESTERDAY (the
    default end) with no --end-dt is just as empty a window as an
    explicit inverted pair — the original guard only fired when both
    dates were given."""
    import datetime as dt

    from click.testing import CliRunner

    from sayn_spark.cli import cli

    tomorrow = (dt.date.today() + dt.timedelta(days=1)).isoformat()
    r = CliRunner().invoke(cli, ["compile", "-p", str(tmp_path), "--start-dt", tomorrow])
    assert r.exit_code != 0
    assert "is after --end-dt" in r.output and "default, yesterday" in r.output
    # start == the default end (yesterday) stays legal
    yesterday = (dt.date.today() - dt.timedelta(days=1)).isoformat()
    r2 = CliRunner().invoke(cli, ["compile", "-p", str(tmp_path), "--start-dt", yesterday])
    assert "is after --end-dt" not in r2.output


def test_merge_refuses_schema_drift(spark):
    """Second-pass hazard review r14: an extra source column was
    SILENTLY dropped by the merge (``src.select(*dst.columns)``) — a
    user who adds a column to their incremental SQL sees every run
    succeed while the column never materialises.  The reference's
    positional ``INSERT INTO dst SELECT * FROM src``
    (merge_tables.sql:1-12) errors on any column-count mismatch, so
    refusing loudly is parity; the error names the remedy (full load).
    A missing source column previously raised a raw UNRESOLVED_COLUMN
    AnalysisException."""
    from sayn_spark.plans.materialise import merge_dataframes

    dst = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    extra = spark.createDataFrame([(2, "B", 9.0)], "k long, v string, new_col double")
    with pytest.raises(ValueError, match=r"new_col.*not in the destination"):
        merge_dataframes(dst, extra, "k")
    missing = spark.createDataFrame([(2,)], "k long")
    with pytest.raises(ValueError, match=r"missing destination column\(s\) \['v'\]"):
        merge_dataframes(dst, missing, "k")
    # reordered-but-identical column sets stay legal (unionByName)
    reordered = spark.createDataFrame([("B", 2)], "v string, k long")
    got = {(r.k, r.v) for r in merge_dataframes(dst, reordered, "k").collect()}
    assert got == {(1, "a"), (2, "B")}


def test_database_merge_tables_refuses_schema_drift(spark, tmp_path):
    """The Database layer's Delta branch builds its INSERT from dst's
    column list, which had the same silent-drop hazard — the gate runs
    before either branch."""
    db = SparkDatabase(spark, use_delta=False)
    db.create_table(
        "msd_dst", spark.createDataFrame([(1, "a")], "k long, v string"), mode="overwrite"
    )
    db.create_table(
        "msd_src",
        spark.createDataFrame([(1, "A", 1.5)], "k long, v string, extra double"),
        mode="overwrite",
    )
    try:
        with pytest.raises(ValueError, match="extra.*not in the destination"):
            db.merge_tables("msd_src", "msd_dst", "k")
    finally:
        db.drop_object("msd_src")
        db.drop_object("msd_dst")


def test_load_data_degenerate_inputs(spark):
    """Second-pass hazard review r14: zero rows without a schema is a
    routine empty incremental extract, not an error — the reference's
    batched INSERT loop never executes (database/__init__.py:513-587);
    createDataFrame raised a raw CANNOT_INFER_EMPTY_SCHEMA.  An
    all-None column raised a raw CANNOT_DETERMINE_TYPE naming nothing;
    the clean error now names the columns and the remedy."""
    db = SparkDatabase(spark, use_delta=False)
    assert db.load_data("ld_degen_never_created", []) == 0
    assert not db.table_exists("ld_degen_never_created")
    with pytest.raises(ValueError, match=r"\['b'\] are None in every record"):
        db.load_data("ld_degen_allnone", [{"a": 1, "b": None}, {"a": 2, "b": None}])
    # zero rows WITH a schema still materialises the empty table
    try:
        assert db.load_data("ld_degen_empty", [], schema="a long", replace=True) == 0
        assert db.table_exists("ld_degen_empty")
        assert spark.table("ld_degen_empty").count() == 0
    finally:
        db.drop_object("ld_degen_empty")


def test_sys_exit_in_python_task_is_a_task_failure(spark, tmp_path):
    """Second-pass hazard review r14: a user python task calling
    sys.exit() raises SystemExit — a BaseException the wrapper's
    ``except Exception`` let escape, killing the whole run mid-stage
    with a clean-looking exit code and zero failure accounting
    (reproduced in both serial and thread-pooled paths).  Ported
    scripts call sys.exit() routinely; it is a task failure."""
    from sayn_spark.core.app import App
    from sayn_spark.operators import RunArguments, TaskStatus

    proj = tmp_path / "exitproj"
    (proj / "tasks").mkdir(parents=True)
    (proj / "python").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "python" / "t.py").write_text(
        "import sys\n"
        "from sayn_spark.operators import task\n"
        "@task(name='quitter')\n"
        "def quitter(context):\n"
        "    sys.exit(3)\n"
    )
    (proj / "tasks" / "g.yaml").write_text("tasks:\n  independent: {type: dummy}\n")
    for parallel in (False, True):
        app = App(proj, spark=spark, run_arguments=RunArguments(command="run"))
        statuses = app.run(parallel=parallel)
        assert statuses["quitter"] == TaskStatus.FAILED
        assert statuses["independent"] == TaskStatus.SUCCESS
        assert app.tasks["quitter"].error == "task called sys.exit(3)"


def test_duplicate_task_outputs_rejected_at_config_time(spark, tmp_path):
    """Second-pass hazard review r14: two tasks declaring the same
    output silently last-writer-won in the producers dict — the thread
    pool ran both "full rebuild" writers CONCURRENTLY, their staging
    swaps interleaved into a table holding rows from BOTH (reproduced:
    x=1 AND x=2 in a one-row materialisation), and every implicit src
    edge bound to whichever producer came later in dict order."""
    from sayn_spark.core.app import App
    from sayn_spark.operators import RunArguments

    proj = tmp_path / "dupout"
    (proj / "tasks").mkdir(parents=True)
    (proj / "sql").mkdir()
    (proj / "project.yaml").write_text("default_db: spark\n")
    (proj / "sql" / "one.sql").write_text("SELECT 1 AS x")
    (proj / "sql" / "two.sql").write_text("SELECT 2 AS x")
    (proj / "tasks" / "g.yaml").write_text(
        """
tasks:
  writer_a: {type: sql, materialisation: table, file_name: one.sql, destination: dup_t}
  writer_b: {type: sql, materialisation: table, file_name: two.sql, destination: dup_t}
"""
    )
    with pytest.raises(ValueError, match="both declare output 'spark:dup_t'"):
        App(proj, spark=spark, run_arguments=RunArguments(command="run"))


def test_file_source_schema_key_and_empty_landing_dir(spark, tmp_path):
    """Second-pass hazard review r14: `schema` is a reader METHOD, not
    an option — the generic option passthrough silently discarded it,
    so a user-declared schema never applied.  And an EMPTY landing
    directory (routine: a copy task scheduled before the first files
    arrive) surfaced as a cryptic UNABLE_TO_INFER_SCHEMA naming
    neither the path nor the remedy.  With a declared schema, an empty
    directory reads as an empty frame — the scale-correct behavior."""
    from sayn_spark.sources.registry import read_source

    landing = tmp_path / "landing"
    landing.mkdir()
    with pytest.raises(ValueError, match="contains no data files.*schema"):
        read_source(spark, {"type": "parquet", "path": str(landing)})
    df = read_source(
        spark, {"type": "parquet", "path": str(landing), "schema": "a long, b string"}
    )
    assert df.count() == 0 and [f.name for f in df.schema.fields] == ["a", "b"]
    csv = tmp_path / "d.csv"
    csv.write_text("1,x\n2,y\n")
    got = read_source(
        spark,
        {"type": "csv", "path": str(csv), "schema": "k long, v string",
         "header": "false", "inferSchema": "false"},
    )
    assert got.schema.simpleString() == "struct<k:bigint,v:string>"
    assert got.count() == 2


def test_repetition_scorer_survives_zero_token_documents(spark, ctx):
    """Second-pass hazard review r14: repetition_ratio_col divided by
    size(t) with a plain `/` — under ANSI (Spark 4 default) ONE
    zero-token document (an empty string suffices) threw DIVIDE_BY_ZERO
    and killed the whole filter stage before the caller's
    coalesce-to-0.0 saw a row (reproduced through the filter task; the
    registered query never hit it because it filters size(t) >= 2).
    try_divide yields NULL -> coalesce -> 0.0, so short docs pass."""
    from sayn_spark.operators.filter import FilterTask

    rows = [
        (1, "aa bb aa bb aa bb aa bb"),
        (2, ""),
        (3, "   "),
        (4, "one two three four five six"),
    ]
    ctx.db.replace_table(
        "rep_zero_src", spark.createDataFrame(rows, "doc_id long, text string")
    )
    t = FilterTask(
        "repz",
        {"source": "rep_zero_src", "destination": "rep_zero_out",
         "scorer": "repetition", "max_repetition_ratio": 0.6},
        ctx,
    )
    t.config()
    t.run()
    kept = sorted(r.doc_id for r in spark.table("rep_zero_out").collect())
    # doc 1 ratio 1-2/8=0.75 > 0.6 dropped; empty/whitespace docs pass at 0.0
    assert kept == [2, 3, 4]


def test_editdistance_caps_candidate_length(spark, ctx):
    """Second-pass hazard review r14 (measured): Spark's threshold
    levenshtein(a, b, k) abandons fast only when the distance EXCEEDS
    k — when the pair IS near-identical it runs the full O(len^2) DP
    (37s at 100 KB, ~15 min at 500 KB, per pair), so one long-doc
    near-dup cluster froze the dedup stage with a pegged executor and
    no progress signal (reproduced: method=editdistance hung >10 min
    on EIGHT rows because one held a 500 KB doc).  Docs longer than
    max_compare_chars are now never candidates — the same policy as
    NULL/empty docs — and survive dedup as themselves."""
    import time

    from sayn_spark.operators.dedup import DedupTask

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs home"),
        (2, "the quick brown fox jumps over the lazy dog and runs hom"),
        (6, "x" * 500000),
        (7, "x" * 499999 + "y"),  # near-identical long pair: the freeze case
    ]
    ctx.db.replace_table(
        "edcap_src", spark.createDataFrame(rows, "doc_id long, text string")
    )
    t0 = time.time()
    t = DedupTask(
        "edcap",
        {"source": "edcap_src", "destination": "edcap_out", "method": "editdistance"},
        ctx,
    )
    t.config()
    t.run()
    took = time.time() - t0
    kept = sorted(r.doc_id for r in spark.table("edcap_out").select("doc_id").collect())
    # 2 deduped against 1; both long docs pass through untouched
    assert kept == [1, 6, 7]
    assert took < 120, f"editdistance with long docs took {took:.0f}s — cap not applied"
    # the knob is editdistance-only
    with pytest.raises(ValueError, match="method=editdistance only"):
        DedupTask(
            "edcap2",
            {"source": "edcap_src", "destination": "o", "method": "exact",
             "max_compare_chars": 100},
            ctx,
        ).config()


def test_pii_regex_is_linear_on_long_alnum_runs(spark, ctx):
    """Second-pass hazard review r14 (measured, jstack-confirmed): the
    unbounded email pattern `[a-z0-9._]+@` made Java's backtracking
    engine consume the REST of the document at every start position of
    a long alphanumeric run and then fail at the '@' — O(len^2), 60s+
    of pegged CPU on one 500 KB digit document per regexp call.  RFC
    5321 bounds the local part at 64 chars and the domain at 255, so
    the bounded pattern matches every real email identically while
    keeping the scan linear."""
    import time

    from sayn_spark.operators.filter import FilterTask

    rows = [
        (1, "contact alice@example.com or +1-555-0100 today"),
        (9, "1" * 500000),
        (6, "x" * 500000),
    ]
    ctx.db.replace_table(
        "piilin_src", spark.createDataFrame(rows, "doc_id long, text string")
    )
    t0 = time.time()
    t = FilterTask(
        "piilin",
        {"source": "piilin_src", "destination": "piilin_out",
         "scorer": "pii", "pii_action": "redact"},
        ctx,
    )
    t.config()
    t.run()
    took = time.time() - t0
    out = {r.doc_id: r.text for r in spark.table("piilin_out").collect()}
    assert "[EMAIL]" in out[1] and "[PHONE]" in out[1]
    assert out[9] == "1" * 500000  # untouched, and in linear time
    assert took < 60, f"pii redaction took {took:.0f}s on long docs — regex not linear"
