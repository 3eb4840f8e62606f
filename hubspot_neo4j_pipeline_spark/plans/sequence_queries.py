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
        SELECT user_id, count(*) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(max(n_events) AS BIGINT) AS longest_session_events,
               CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us
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
               CAST(sum(gap_days) AS BIGINT) AS total_gap_days,
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
               CAST(sum(coalesce(h.cnt, 0)) AS BIGINT) AS n_events_7d,
               CAST(max(coalesce(h.cnt, 0)) AS BIGINT) AS max_events_7d
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


@register(
    "daily_event_spine",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('day', min(ts)) AS d0,
                   date_trunc('day', max(ts)) AS d1
            FROM events
        ), spine AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM bounds
        ), daily AS (
            SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY day
        )
        SELECT spine.day, coalesce(daily.n_events, 0) AS n_events,
               coalesce(daily.n_users, 0) AS n_users
        FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    covers=("F10", "U2", "A9"),
    doc=(
        "Date-spine gap filling: generate the full day series between the "
        "data-derived bounds, left-join daily aggregates, zero-fill missing "
        "days — the reporting idiom that makes time series dense (a plain "
        "GROUP BY silently drops empty days). Scale: the spine is "
        "|days| rows from a 1-row bounds aggregate (broadcast); the fact "
        "side aggregates BEFORE the join."
    ),
)
def daily_event_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
        )
    )


@register(
    "ordered_funnel",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   min(ts) FILTER (WHERE event_type = 'view') AS t_view,
                   min(ts) FILTER (WHERE event_type = 'click') AS t_click,
                   min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               count(*) FILTER (WHERE t_view IS NOT NULL) AS n_viewed,
               count(*) FILTER (
                   WHERE t_view IS NOT NULL AND t_click > t_view
               ) AS n_clicked_after_view,
               count(*) FILTER (
                   WHERE t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click
               ) AS n_purchased_in_order
        FROM firsts
    """,
    covers=("J14", "A2", "W1"),
    doc=(
        "ORDERED funnel: step N counts only users whose first step-N event "
        "follows their first step-N-1 event (view → click → purchase) — "
        "stricter than the reference's unordered exists-funnel "
        "(README.md:314-336), which counts any co-occurrence. One "
        "conditional-min aggregate per user, then a single summary row; "
        "no joins, one shuffle on user_id."
    ),
)
def ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    firsts = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(viewed, 1)).alias("n_viewed"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("n_purchased_in_order"),
    )


@register(
    "user_value_trend",
    oracle="""
        WITH base AS (
            SELECT user_id,
                   (epoch_us(ts)
                    - min(epoch_us(ts)) OVER (PARTITION BY user_id))
                   // 60000000 AS x,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ), sums AS (
            SELECT user_id, count(*) AS n, sum(x) AS sx, sum(cents) AS sy,
                   sum(x * x) AS sxx, sum(x * cents) AS sxy
            FROM base GROUP BY user_id
        )
        SELECT user_id, n,
               CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
               END AS slope_cents_per_min
        FROM sums
    """,
    covers=("A8", "W1", "A3"),
    doc=(
        "Per-user value trend: least-squares slope of event value (cents) "
        "over minutes-since-first-event, as pure built-in aggregation. The "
        "n/Σx/Σy/Σxx/Σxy sums are EXACT BIGINT map-side-combinable partial "
        "aggregates over integer minutes × integer cents, with ONE final "
        "double division — bit-identical to the oracle and to the "
        "applyInPandas formulation it replaced (operators/pandas_ops.py "
        "remains the Arrow per-group demo, pytest-covered). Scale: the "
        "min-ts window and the groupBy hash-partition on the same key, so "
        "Catalyst reuses one shuffle; no Python in the hot path. BIGINT "
        "headroom: x ≤ minutes-per-retention-window (~5e5), cents ≤ 1e7, "
        "so Σxy per user stays < 2^62 up to ~1e8 events/user."
    ),
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    base = events.select(
        "user_id",
        F.expr("(unix_micros(ts) - min(unix_micros(ts)) OVER (PARTITION BY user_id)) div 60000000").alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    sums = base.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("cents")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "user_id",
        "n",
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope_cents_per_min"),
    )


@register(
    "retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(CAST(ts AS DATE))) AS DATE)
                       AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
               datediff('day', cohort_week, CAST(ts AS DATE)) // 7
                   AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY cohort_week, week_offset
    """,
    covers=("J11", "A2", "F10"),
    doc=(
        "Retention cohorts: users bucketed by first-activity week, distinct "
        "active users per (cohort, weeks-since-cohort) cell — the standard "
        "product-retention triangle. Scale: the firsts aggregate is "
        "per-user (one shuffle) and broadcastable vs the fact side; "
        "count(DISTINCT) is a two-phase partial aggregate; week arithmetic "
        "is integer day math (no tz/float ambiguity)."
    ),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.col("ts").cast("date")))
        .cast("date")
        .alias("cohort_week")
    )
    return (
        events.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            # surfaced as TIMESTAMP: the harness dtype convention for
            # truncated dates (DATE arrives as distinct dtypes per engine)
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            "week_offset",
            "active_users",
        )
    )
