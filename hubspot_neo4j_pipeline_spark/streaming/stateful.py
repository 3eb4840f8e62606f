"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming layer; these give its per-entity
analytics an incremental form: arbitrary per-key state maintained
across micro-batches (Spark's applyInPandasWithState — Arrow-batched,
one state object per key).

`running_user_stats` is the canonical instance: per-user lifetime
event count / value sum / last-seen timestamp, updated every
micro-batch. The batch equivalent (`running_user_stats_batch`) is the
correctness oracle — after the stream drains, per-key state must equal
the batch aggregate (tested in tests/test_streaming.py).

Scale: state is one small tuple per user key, hash-partitioned; with a
watermark upstream, state for idle keys can be timed out
(GroupStateTimeout) — kept NoTimeout here since the reference's
semantics are lifetime aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_seen timestamp"
STATE_SCHEMA = "n_events long, total_value double, last_seen timestamp"


def _update_user_stats(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_seen = state.get
    else:
        n, total, last_seen = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
    state.update((n, total, last_seen))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [last_seen],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime stats as a stateful stream (update mode).

    Works on a streaming frame; each micro-batch emits the refreshed
    state row for every key seen in the batch.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch oracle for `running_user_stats` final state."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_seen"),
    )
