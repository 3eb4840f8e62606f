"""Order-aware operators over timestamped streams: as-of join,
sessionization, inter-arrival gaps.

The reference's temporal layer stops at SCD2 versioning; these are the
sequence operators a large-scale event/training-data pipeline needs on
top (point-in-time feature joins, session segmentation).

Scale notes (100 TB):

- ``asof_join`` is the union-sort-window formulation: tag both sides,
  union, ONE shuffle on the key, sort within partition, carry the last
  non-null right-side payload forward. This is the scale-safe as-of —
  a naive theta-join (``l.ts >= r.ts``) explodes to |L|·|R| per key
  before aggregation; this stays |L|+|R| with a single exchange, and
  Spark's range-partitioned window sort spills gracefully.
- ``sessionize`` is lag + running-sum over a per-key window: one
  shuffle on the key, no self-join. Equivalent to Spark's streaming
  ``session_window`` semantics in batch (streaming/event_analytics.py
  holds the streaming twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "last_",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right.right_ts <= left.left_ts`` and the same key (backward
    as-of, inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

    ``right`` must be unique per (key, right_ts); pre-dedup if not
    (the matched row would otherwise be partition-order-dependent).
    """
    l_cols = left.columns
    # project each side against its OWN columns first — never emit a
    # null literal under a name the other side then "resolves" via
    # lateral column aliasing (silently yielding all-null keys)
    l = left.select(
        *l_cols,
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
    )
    for c in payload_cols:
        l = l.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    for c in l_cols:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*r.columns).unionByName(r)
    # at equal timestamps the right row sorts first so it is visible to
    # the left row (inclusive semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        u = u.withColumn(
            f"{prefix}{c}", F.last(f"__p_{c}", ignorenulls=True).over(w)
        )
    return u.where(F.col("__is_right") == 0).select(
        *l_cols, *[f"{prefix}{c}" for c in payload_cols]
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-key session id (1-based) via gaps-and-islands:
    a new session starts when the gap to the previous event exceeds
    ``gap_minutes``. Adds ``session_id``; one shuffle on ``key``."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    us = F.unix_micros(F.col(ts))
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(new_sess).over(run))


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-key session summary: session count, event count, longest
    session (events), total in-session dwell (exact microseconds)."""
    s = sessionize(events, key, ts, order_tiebreak, gap_minutes)
    per_session = s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))).alias("dwell_us"),
    )
    return per_session.groupBy(key).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("longest_session_events"),
        F.sum("dwell_us").alias("total_dwell_us"),
    )
