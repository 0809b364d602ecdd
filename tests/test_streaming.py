"""Streaming tests: availableNow micro-batch runs over the testdata
events directory; results must equal the equivalent batch queries
(the streaming twins contract in sayn_spark/streaming/streams.py)."""

from __future__ import annotations

import shutil

import pytest

from sayn_spark.functions.registry import T
from sayn_spark.streaming import (
    hourly_aggregate_stream,
    read_events_stream,
    sessionize_stream,
    stream_copy,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(tmp_path):
    # file streams need a directory source
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def run_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_stream_matches_batch(spark, events_dir):
    stream = hourly_aggregate_stream(read_events_stream(spark, events_dir))
    got = {
        (r.hour_epoch, r.event_type): (r.n, r.total_value)
        for r in run_to_memory(spark, stream, "hourly_out").collect()
    }
    from sayn_spark.functions.events import q_events_hourly

    want = {
        (r.hour_epoch, r.event_type): (r.n, r.total_value)
        for r in q_events_hourly(spark, SF).collect()
    }
    assert got == want


def test_sessionize_stream_counts(spark, events_dir):
    stream = sessionize_stream(read_events_stream(spark, events_dir))
    out = run_to_memory(spark, stream, "sessions_out")
    # session_window closes at last_event + gap, so window_us >= gap;
    # total events across sessions must equal the input row count
    total = sum(r.n_events for r in out.collect())
    assert total == T(spark, SF, "events").count()
    assert out.where("window_us < 30 * 60 * 1000000").count() == 0


def test_stream_copy_appends_with_audit_column(spark, events_dir, tmp_path):
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    q = stream_copy(read_events_stream(spark, events_dir), dst, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(dst)
    assert out.count() == T(spark, SF, "events").count()
    assert "_sayn_load_ts" in out.columns
    # re-running with the same checkpoint loads nothing new (exactly-once)
    q2 = stream_copy(read_events_stream(spark, events_dir), dst, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(dst).count() == T(spark, SF, "events").count()
