"""Sequence / point-in-time queries over the event stream: as-of
feature joins, sessionization, inter-arrival gaps, bounded range joins.

These extend the reference's temporal layer (SCD2 snapshots,
query_temporal.py) with the order-aware operators a training-data /
feature pipeline needs. All implementations are single-shuffle window
formulations (operators/sequence.py) — no theta-join explosions.

Cross-engine determinism: durations are exact integer microseconds
(unix_micros / epoch_us), day gaps are integer datediff, and every
ratio is an exact-integer-sum divided once — bit-identical doubles in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register


@register(
    "event_sessionization",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        ), flagged AS (
            SELECT user_id, us,
                   CASE WHEN lag(us) OVER (PARTITION BY user_id
                                           ORDER BY us, event_id) IS NULL
                             OR us - lag(us) OVER (PARTITION BY user_id
                                                   ORDER BY us, event_id)
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_sess,
                   event_id
            FROM e
        ), sess AS (
            SELECT user_id, us,
                   sum(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ), per_session AS (
            SELECT user_id, session_id, count(*) AS n_events,
                   max(us) - min(us) AS dwell_us
            FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events,
               max(n_events) AS longest_session_events,
               sum(dwell_us) AS total_dwell_us
        FROM per_session GROUP BY user_id
    """,
    covers=("W1", "A9", "F10"),
    doc="Gaps-and-islands sessionization (30-min gap) per user: lag + running sum window, one shuffle; batch twin of streaming session_window.",
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import session_stats

    events = load_table(spark, sf_dir, "events")
    return session_stats(events, key="user_id", ts="ts", gap_minutes=30)


@register(
    "order_interarrival",
    oracle="""
        WITH gaps AS (
            SELECT o_custkey,
                   date_diff('day',
                             lag(CAST(o_orderdate AS DATE))
                                 OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                             CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders
        )
        SELECT o_custkey AS customer_key,
               count(*) AS n_orders,
               count(gap_days) AS n_gaps,
               sum(gap_days) AS total_gap_days,
               CAST(sum(gap_days) AS DOUBLE) / count(gap_days) AS avg_gap_days
        FROM gaps GROUP BY o_custkey
        HAVING count(gap_days) > 0
    """,
    covers=("W1", "A8", "F10"),
    doc="Inter-arrival analysis: lead/lag window over per-customer order sequence, integer day gaps, exact-sum average.",
)
def order_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap_days"),
    )
    return (
        gaps.groupBy(F.col("o_custkey").alias("customer_key"))
        .agg(
            F.count("*").alias("n_orders"),
            F.count("gap_days").alias("n_gaps"),
            F.sum("gap_days").alias("total_gap_days"),
            (
                F.sum("gap_days").cast("double") / F.count("gap_days")
            ).alias("avg_gap_days"),
        )
        .where(F.col("n_gaps") > 0)
    )


@register(
    "asof_order_before_event",
    oracle="""
        WITH o AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS last_orderkey,
               o.o_orderdate AS last_orderdate
        FROM events e ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    covers=("J11", "W1", "F10"),
    doc="Backward as-of join: each event gets the latest order of the same customer at-or-before its timestamp (point-in-time feature join). Union-sort-window formulation — one shuffle, no range explosion; right side pre-deduped per (key, ts) for determinism.",
)
def asof_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import asof_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_o_orderkey").alias("last_orderkey"),
        F.col("last_o_orderdate").alias("last_orderdate"),
    )


@register(
    "order_event_burst",
    oracle="""
        WITH hits AS (
            SELECT o.o_orderkey, count(*) AS cnt
            FROM orders o JOIN events e
              ON e.user_id = o.o_custkey
             AND e.ts >= o.o_orderdate
             AND e.ts < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY o.o_orderkey
        )
        SELECT o.o_orderpriority AS priority,
               count(*) AS n_orders,
               sum(coalesce(h.cnt, 0)) AS n_events_7d,
               max(coalesce(h.cnt, 0)) AS max_events_7d
        FROM orders o LEFT JOIN hits h ON o.o_orderkey = h.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    covers=("J11", "A9", "F10"),
    doc="Bounded range join: events within 7 days after each order, via day-bucket equi-join (7x bounded expansion, shuffle on (key, day)) + exact range filter — never an unbounded theta join.",
)
def order_event_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    # explode each order into its 7 candidate days -> equi-join key
    ob = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.explode(
            F.sequence(
                F.to_date("o_orderdate"), F.date_add(F.to_date("o_orderdate"), 6)
            )
        ).alias("day"),
    )
    eb = events.select("user_id", "ts", F.to_date("ts").alias("day"))
    hits = (
        ob.join(
            eb,
            (ob.day == eb.day)
            & (ob.o_custkey == eb.user_id)
            & (eb.ts >= ob.o_orderdate)
            & (eb.ts < ob.o_orderdate + F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        orders.join(hits, "o_orderkey", "left")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.coalesce("cnt", F.lit(0))).alias("n_events_7d"),
            F.max(F.coalesce("cnt", F.lit(0))).alias("max_events_7d"),
        )
    )
