"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics Spark's built-in streaming aggs can't
express (reference parity note: sayn has no streaming at all, SURVEY
§2.4; this is the Spark-native extension surface).

``running_user_totals``: per-user cumulative event count + value sum,
emitted once per micro-batch per active user.  State is one row per
user (bounded), updated incrementally — the streaming analog of a
grand-total dashboard table that a sayn user would rebuild per run.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # cents-exact accumulation: value has 2dp, so sum in integer cents
        total += float(pdf["value"].mul(100).round().sum()) / 100.0
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user counters with explicit keyed state.

    At 100 TB of events this scales by user-key partitioning: state
    lives with its shuffle partition, each micro-batch touches only
    the users present in that batch.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(events: DataFrame, key: str = "event_id", ttl_minutes: int = 60) -> DataFrame:
    """Streaming exact dedup: drop events whose key was already seen
    within the watermark window — the streaming twin of q_dedup_exact.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is
    what makes the TTL real: with a key-only subset, plain
    dropDuplicates never consults the watermark — state grows with
    every key EVER seen (unbounded at crawl scale) and a key
    legitimately reappearing after ``ttl_minutes`` stays suppressed
    forever.  The WithinWatermark variant evicts a key's state once
    the watermark passes its event time + delay, so state is bounded
    by the TTL horizon and a post-TTL reappearance is re-admitted —
    the contract this function documents
    (tests/test_round12.py pins eviction + re-admission end-to-end)."""
    return events.withWatermark(
        "ts", f"{ttl_minutes} minutes"
    ).dropDuplicatesWithinWatermark([key])


TTL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("closed", BooleanType()),
    ]
)

TTL_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)


def ttl_user_totals(
    events: DataFrame, ttl_minutes: int = 30, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Per-user running totals with EVENT-TIME TTL EVICTION: a user
    idle past ``ttl_minutes`` (by watermark) emits one final
    ``closed=true`` row and its state is REMOVED — if the user returns
    later, counting restarts from zero.

    This is the unbounded-key-space discipline ``running_user_totals``
    lacks: at 100 TB of events the active-user state stays bounded by
    the TTL horizon instead of growing with the all-time user count.
    Timeouts fire via ``GroupStateTimeout.EventTimeTimeout`` against
    the stream's watermark, so eviction is deterministic in event time
    (replaying the same files yields the same closed rows), not wall
    clock.  Eviction is asserted end-to-end (state actually removed,
    counters restart) in tests/test_streaming.py.

    ``watermark_delay`` (default "0 seconds") is the cross-trigger
    disorder tolerance: under EventTimeTimeout, a row arriving in a
    LATER trigger with an event time below the current watermark is
    filtered out before the update function ever sees it and silently
    vanishes from the totals.  The zero default keeps eviction exactly
    at the TTL horizon (and the published test semantics); feeds with
    lagging upstream writers should set the delay to their observed
    disorder (e.g. "2 hours", the package's usual default) — eviction
    then fires that much later, the bounded-state property unchanged.
    """
    ttl_ms = ttl_minutes * 60 * 1000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "closed": [True],
                }
            )
            return
        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].mul(100).round().sum()) / 100.0
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
        state.update((n, total, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "closed": [False],
            }
        )

    return (
        events.select("user_id", "value", "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TTL_OUTPUT_SCHEMA,
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
