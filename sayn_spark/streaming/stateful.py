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
    within the watermark window — the streaming twin of q_dedup_exact
    (built-in dropDuplicates carries the state; TTL bounds it)."""
    return events.withWatermark("ts", f"{ttl_minutes} minutes").dropDuplicates([key])
