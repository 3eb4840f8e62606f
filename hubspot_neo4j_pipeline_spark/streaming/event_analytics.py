"""Structured-Streaming event analytics.

The reference is batch-only (SURVEY.md §2.8: no watermarks/windows
exist there); its closest analogs are the 90-day extraction window and
P30D recency predicates. These operators make the event analytics
incremental: the SAME transformation function serves batch recompute
(reference semantics) and `readStream` execution — the transformation
is plan-identical, only the source/sink differ, so batch output is the
correctness oracle for the streaming path (tested in
tests/test_streaming.py).

Scale: streaming aggregations key on (window, event_type) — bounded
state; the watermark evicts state older than the lateness bound.
sessionize uses session_window (gap-based), state bounded per user by
the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events directory (each dropped file
    is a micro-batch — the incremental form of the reference's
    per-run re-extract)."""
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts per event type; the watermark
    bounds state and admits late data up to `watermark`.

    Works identically on batch frames (watermark is a no-op there) —
    the batch result is the oracle for streaming output.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization per user (session_window): a session
    closes after `gap` of inactivity. Batch + streaming compatible."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    timeout_sec: int = 60,
    output_mode: str = "complete",
) -> None:
    """Drive a streaming frame into an in-memory sink until the source
    is exhausted (test/dev harness; production would writeStream to a
    table with a real trigger). Aggregations use ``complete``;
    joins/projections must use ``append``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each click attributed to same-user
    views at most ``max_delay`` older (ad-attribution shape).

    On streams, BOTH sides carry watermarks and the join condition has
    an event-time range, so Spark can bound the join state: a buffered
    view is dropped once the click-side watermark passes
    view.ts + max_delay. On batch frames the watermark is a no-op and
    the same function is the correctness oracle (tested stream ≡ batch
    in tests/test_streaming.py).

    Scale: state per key is O(events within the delay window), not
    O(history); the join shuffles both sides on user_id once.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        "click_ts",
        "view_ts",
    )


def enrich_events(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: attach the (static) user/owner
    dimension to a live event stream.

    The static side is re-read per micro-batch by Spark, so slowly-
    changing dims stay fresh without restarting the query; no state is
    kept (unlike stream-stream joins) and the dim side broadcasts.
    Works identically on batch frames (the batch result is the oracle
    in tests/test_streaming.py).

    Scale: broadcast join per micro-batch — the dim must stay
    driver-memory-bounded; beyond that, switch to a stream-stream join
    keyed on the dim's change feed.
    """
    dim = F.broadcast(
        user_dim.select(
            F.col("n_nationkey").cast("long").alias("user_id"),
            F.col("n_name").alias("owner_name"),
        )
    )
    return events.join(dim, "user_id", "left").select(
        "event_id", "ts", "user_id", "event_type", "value", "owner_name"
    )
