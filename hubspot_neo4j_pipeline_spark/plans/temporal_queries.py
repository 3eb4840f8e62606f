"""Temporal / SCD2 / CDC query analogs (SURVEY.md §2.8).

The reference's temporal layer (change detection, SCD2 history, CDC
relationship log — utils/change_detector.py, loaders/temporal_loader.py,
query_temporal.py) is re-expressed here as declarative queries over the
synthetic tables: two date-sliced "snapshots" of `orders` stand in for
consecutive pipeline runs, `events` per-user streams stand in for entity
version chains.

The stateful merge itself (scd2_merge) lives in ``operators/scd2.py``
with its golden pytest scenarios; these registry entries cover the
query shapes with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register

# Snapshot cut points over orders.o_orderdate (range 1995-01..2001-08).
_OLD_END = "1999-01-01"  # "previous run" saw orders before this date
_NEW_START = "1996-01-01"  # "current run" sees orders from this date on


def _old_snapshot(orders: DataFrame) -> DataFrame:
    return orders.where(F.col("o_orderdate") < _OLD_END).select(
        F.col("o_orderkey").alias("entity_key"),
        F.col("o_totalprice").alias("old_amount"),
        F.col("o_orderstatus").alias("old_status"),
    )


def _new_snapshot(orders: DataFrame) -> DataFrame:
    # Simulated re-extract: pending deals got a 10% price bump → 'updated'.
    return orders.where(F.col("o_orderdate") >= _NEW_START).select(
        F.col("o_orderkey").alias("entity_key"),
        F.when(
            F.col("o_orderstatus") == "P", F.col("o_totalprice") * F.lit(1.1)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("new_amount"),
        F.col("o_orderstatus").alias("new_status"),
    )


@register(
    "change_classification",
    oracle=f"""
        WITH old_snap AS (
            SELECT o_orderkey AS entity_key, o_totalprice AS old_amount,
                   o_orderstatus AS old_status
            FROM orders WHERE o_orderdate < TIMESTAMP '{_OLD_END}'
        ), new_snap AS (
            SELECT o_orderkey AS entity_key,
                   CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1
                        ELSE o_totalprice END AS new_amount,
                   o_orderstatus AS new_status
            FROM orders WHERE o_orderdate >= TIMESTAMP '{_NEW_START}'
        )
        SELECT coalesce(n.entity_key, o.entity_key) AS entity_key,
               CASE WHEN o.entity_key IS NULL THEN 'new'
                    WHEN n.entity_key IS NULL THEN 'deleted'
                    WHEN n.new_amount <> o.old_amount
                         OR n.new_status <> o.old_status THEN 'updated'
                    ELSE 'unchanged' END AS change_type
        FROM new_snap n FULL OUTER JOIN old_snap o ON n.entity_key = o.entity_key
    """,
    covers=("J4", "T2", "T1"),
    doc="Full-outer snapshot compare → new/updated/unchanged/deleted. Ref change_detector.py:65-128.",
)
def change_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = _old_snapshot(orders)
    new = _new_snapshot(orders)
    j = new.join(old, "entity_key", "full_outer")
    return j.select(
        "entity_key",
        F.when(F.col("old_status").isNull() & F.col("old_amount").isNull(), "new")
        .when(F.col("new_status").isNull() & F.col("new_amount").isNull(), "deleted")
        .when(
            (F.col("new_amount") != F.col("old_amount"))
            | (F.col("new_status") != F.col("old_status")),
            "updated",
        )
        .otherwise("unchanged")
        .alias("change_type"),
    )


@register(
    "change_summary",
    oracle=f"""
        WITH old_snap AS (
            SELECT o_orderkey AS entity_key, o_totalprice AS old_amount,
                   o_orderstatus AS old_status
            FROM orders WHERE o_orderdate < TIMESTAMP '{_OLD_END}'
        ), new_snap AS (
            SELECT o_orderkey AS entity_key,
                   CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1
                        ELSE o_totalprice END AS new_amount,
                   o_orderstatus AS new_status
            FROM orders WHERE o_orderdate >= TIMESTAMP '{_NEW_START}'
        ), classified AS (
            SELECT CASE WHEN o.entity_key IS NULL THEN 'new'
                        WHEN n.entity_key IS NULL THEN 'deleted'
                        WHEN n.new_amount <> o.old_amount
                             OR n.new_status <> o.old_status THEN 'updated'
                        ELSE 'unchanged' END AS change_type
            FROM new_snap n FULL OUTER JOIN old_snap o ON n.entity_key = o.entity_key
        )
        SELECT change_type, count(*) AS n FROM classified GROUP BY change_type
    """,
    covers=("T2", "A10"),
    doc="Change-type distribution (load statistics). Ref temporal_loader.py:464-515.",
)
def change_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        change_classification(spark, sf_dir)
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "relationship_diff",
    oracle="""
        WITH old_edges AS (
            SELECT DISTINCT l_orderkey AS from_key, l_partkey AS to_key
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        ), new_edges AS (
            SELECT DISTINCT l_orderkey AS from_key, l_partkey AS to_key
            FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        )
        SELECT from_key, to_key, 'added' AS change_type
        FROM (SELECT * FROM new_edges EXCEPT SELECT * FROM old_edges)
        UNION ALL
        SELECT from_key, to_key, 'removed' AS change_type
        FROM (SELECT * FROM old_edges EXCEPT SELECT * FROM new_edges)
    """,
    covers=("J5", "U3", "T6", "D3"),
    doc="Two-way anti-join edge diff → CDC change log. Ref change_detector.py:153-244, temporal_loader.py:313-462.",
)
def relationship_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    old_e = (
        li.where(F.col("l_shipdate") < "1998-01-01")
        .select(F.col("l_orderkey").alias("from_key"), F.col("l_partkey").alias("to_key"))
        .distinct()
    )
    new_e = (
        li.where(F.col("l_shipdate") >= "1996-01-01")
        .select(F.col("l_orderkey").alias("from_key"), F.col("l_partkey").alias("to_key"))
        .distinct()
    )
    added = new_e.join(old_e, ["from_key", "to_key"], "left_anti").withColumn(
        "change_type", F.lit("added")
    )
    removed = old_e.join(new_e, ["from_key", "to_key"], "left_anti").withColumn(
        "change_type", F.lit("removed")
    )
    return added.unionByName(removed)


@register(
    "scd2_version_chain",
    oracle="""
        SELECT user_id, event_id AS version_id, event_type AS state,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   AS is_current
        FROM events
    """,
    covers=("T3", "T9", "W1"),
    doc="Per-entity version chain: valid_from/valid_to via lead window. Ref temporal_loader.py:157-225.",
)
def scd2_version_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "current_state",
    oracle="""
        SELECT user_id, event_id AS version_id, event_type AS state, ts AS valid_from
        FROM (SELECT user_id, event_id, event_type, ts,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    covers=("T9", "W1", "W4"),
    doc="Current-state view (is_current head of each version chain). Ref query_temporal.py:31-48.",
)
def current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
        )
    )


@register(
    "point_in_time_state",
    oracle="""
        SELECT user_id, event_id AS version_id, event_type AS state, ts AS valid_from
        FROM (SELECT user_id, event_id, event_type, ts,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1
    """,
    covers=("T9",),
    doc="Point-in-time audit: entity state as of a timestamp. Ref query_temporal.py:208-280.",
)
def point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts") <= "2024-01-15 00:00:00")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
        )
    )


@register(
    "ownership_change_history",
    oracle="""
        SELECT user_id, ts AS changed_at,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_change,
               (epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id)))
                   / 1000.0 AS gap_seconds
        FROM events WHERE event_type = 'signup'
    """,
    covers=("T10", "F10"),
    doc="Per-entity ordered change timeline with inter-change gaps. Ref query_temporal.py:159-189.",
)
def ownership_change_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("changed_at"),
            prev.alias("prev_change"),
            ((F.unix_millis("ts") - F.unix_millis(prev)) / 1000.0).alias("gap_seconds"),
        )
    )


@register(
    "recent_changes",
    oracle="""
        SELECT event_id AS change_id, user_id, event_type AS change_type, ts AS changed_at
        FROM events
        WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 3 DAY
        ORDER BY changed_at DESC, change_id DESC
        LIMIT 50
    """,
    covers=("T9", "W4", "F10"),
    doc="Recent-changes audit feed (window filter + ordered LIMIT). Ref query_temporal.py:71-110.",
)
def recent_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("now_ts"))
    return (
        events.join(F.broadcast(anchor))
        .where(F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 3 DAYS"))
        .select(
            F.col("event_id").alias("change_id"),
            "user_id",
            F.col("event_type").alias("change_type"),
            F.col("ts").alias("changed_at"),
        )
        .orderBy(F.desc("changed_at"), F.desc("change_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Golden SCD2 scenario (T2-T5): the reference's 8-scenario end-to-end
# temporal test (tests/test_temporal_scenarios.py:164-233) expressed as a
# driver-checked oracle query. The Spark side runs the REAL scd2_merge
# operator on the literal fixture; the oracle independently re-derives the
# merge in SQL (column-compare classification instead of snapshot hashes —
# equivalent semantics). Same fixture as tests/test_scd2.py.
# ---------------------------------------------------------------------------

_G_T0, _G_T1 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"

_G_BASELINE = [
    ("u1", "Olivia Owner", "", "", True),
    ("u2", "Oscar Old", "", "", True),
    ("c1", "John Doe", "u1", "lead", True),
    ("c2", "Jane Roe", "u1", "customer", True),
    ("c3", "Jim Poe", "u2", "lead", True),
    ("d1", "Big Deal", "u1", "negotiation", True),
]

_G_MODIFIED = [
    ("u1", "Olivia Owner", "", "", True),
    ("u2", "Oscar Old", "", "", False),  # scenario 1: user deactivated
    ("c1", "John Doe", "u2", "lead", True),  # 2: ownership transfer
    ("c2", "Jane Smith", "u1", "customer", True),  # 4: name change
    # c3 missing -> 7: soft delete
    ("c4", "Nina New", "u1", "subscriber", True),  # 6: new contact
    ("d1", "Big Deal", "u2", "closedwon", True),  # 3: transfer + 5: stage change
]

_G_COLS = ["hubspot_id", "name", "owner_id", "stage", "active"]


def _values_sql(rows) -> str:
    def lit(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        return "'" + str(v).replace("'", "''") + "'"

    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


_G_ORACLE_PREFIX = f"""
        WITH baseline(hubspot_id, name, owner_id, stage, active) AS (
            VALUES {_values_sql(_G_BASELINE)}
        ), incoming(hubspot_id, name, owner_id, stage, active) AS (
            VALUES {_values_sql(_G_MODIFIED)}
        ), changes AS (
            SELECT coalesce(i.hubspot_id, b.hubspot_id) AS hubspot_id,
                   CASE WHEN b.hubspot_id IS NULL THEN 'new'
                        WHEN i.hubspot_id IS NULL THEN 'deleted'
                        WHEN i.name <> b.name OR i.owner_id <> b.owner_id
                             OR i.stage <> b.stage OR i.active <> b.active
                            THEN 'updated'
                        ELSE 'unchanged' END AS change_type
            FROM incoming i FULL OUTER JOIN baseline b
              ON i.hubspot_id = b.hubspot_id
        )
"""


def _golden_merge(spark: SparkSession):
    from ..operators.scd2 import scd2_merge, with_temporal_fields
    from ..sources.tpch import ensure_session_confs

    # no load_table in this query, so pin the UTC session explicitly —
    # the timestamp literals must mean the same instant as the oracle's
    ensure_session_confs(spark)
    # r14: pandas/Arrow + coalesce(1) for the 6-row golden frames — a
    # createDataFrame over a plain Python list parallelizes into
    # defaultParallelism PYTHON-RDD slices, and scd2_merge's multi-
    # branch output re-ran the Python-worker round-trip per slice per
    # branch (the flagship's r14 defect class; same fix). Schema is
    # pinned so dtypes match the old list inference exactly.
    import pandas as pd

    schema = (
        "hubspot_id string, name string, owner_id string, "
        "stage string, active boolean"
    )
    current = with_temporal_fields(
        spark.createDataFrame(
            pd.DataFrame(_G_BASELINE, columns=_G_COLS), schema
        ).coalesce(1),
        _G_T0,
    )
    incoming = spark.createDataFrame(
        pd.DataFrame(_G_MODIFIED, columns=_G_COLS), schema
    ).coalesce(1)
    return scd2_merge(current, incoming, key="hubspot_id", now=_G_T1)


@register(
    "scd2_golden_merge",
    oracle=_G_ORACLE_PREFIX
    + f"""
        SELECT i.hubspot_id, i.name, i.owner_id, i.stage, i.active,
               TIMESTAMP '{_G_T1}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               true AS is_current, false AS is_deleted
        FROM incoming i JOIN changes c ON i.hubspot_id = c.hubspot_id
        WHERE c.change_type IN ('new', 'updated')
        UNION ALL
        SELECT b.hubspot_id, b.name, b.owner_id, b.stage, b.active,
               TIMESTAMP '{_G_T0}', CAST(NULL AS TIMESTAMP), true, false
        FROM baseline b JOIN changes c ON b.hubspot_id = c.hubspot_id
        WHERE c.change_type = 'unchanged'
        UNION ALL
        SELECT b.hubspot_id, b.name, b.owner_id, b.stage, b.active,
               TIMESTAMP '{_G_T0}', TIMESTAMP '{_G_T1}', false, true
        FROM baseline b JOIN changes c ON b.hubspot_id = c.hubspot_id
        WHERE c.change_type = 'deleted'
    """,
    covers=("T2", "T3", "T4", "T5", "J4"),
    doc=(
        "Golden 8-scenario SCD2 merge: the real scd2_merge operator over the "
        "reference's end-to-end temporal fixture; the oracle re-derives the "
        "post-merge current table in pure SQL. Ref "
        "tests/test_temporal_scenarios.py:164-233, temporal_loader.py:157-266."
    ),
)
def scd2_golden_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _golden_merge(spark).current.select(
        "hubspot_id", "name", "owner_id", "stage", "active",
        "valid_from", "valid_to", "is_current", "is_deleted",
    )


@register(
    "scd2_golden_changelog",
    oracle=_G_ORACLE_PREFIX
    + f"""
        SELECT hubspot_id, change_type,
               TIMESTAMP '{_G_T1}' AS changed_at
        FROM changes WHERE change_type <> 'unchanged'
    """,
    covers=("T2", "T6"),
    doc=(
        "Golden 8-scenario changelog: new/updated/deleted rows emitted by "
        "scd2_merge on the reference fixture (u2 deactivated, c1/d1 "
        "transfers, c2 rename, d1 stage->closedwon, c3 soft-delete, c4 new)."
    ),
)
def scd2_golden_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _golden_merge(spark).changelog.select(
        "hubspot_id", "change_type", "changed_at"
    )


@register(
    "soft_delete_candidates",
    oracle=f"""
        SELECT o.o_orderkey AS entity_key, o.o_totalprice AS amount
        FROM orders o
        WHERE o.o_orderdate < TIMESTAMP '{_OLD_END}'
          AND o.o_orderdate < TIMESTAMP '{_NEW_START}'
    """,
    covers=("T4", "T5"),
    doc="Entities present in previous run but missing from current feed → soft-delete set. Ref temporal_loader.py:227-266.",
)
def soft_delete_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = _old_snapshot(orders)
    new = _new_snapshot(orders)
    return (
        old.join(new, "entity_key", "left_anti")
        .select("entity_key", F.col("old_amount").alias("amount"))
    )


@register(
    "edge_diff_immutable_bypass",
    oracle="""
        WITH base AS (
            SELECT CASE WHEN user_id % 3 = 0 THEN 'PERFORMED'
                        WHEN user_id % 3 = 1 THEN 'OWNED_BY'
                        ELSE 'WORKS_AT' END AS rel_type,
                   CAST(user_id AS VARCHAR) AS from_id,
                   CAST(event_id % 50 AS VARCHAR) AS to_id,
                   event_id
            FROM events
        ), old_t AS (
            SELECT DISTINCT rel_type, from_id, to_id FROM base
            WHERE event_id % 2 = 0 AND rel_type <> 'PERFORMED'
        ), new_t AS (
            SELECT DISTINCT rel_type, from_id, to_id FROM base
            WHERE event_id % 3 <> 0 AND rel_type <> 'PERFORMED'
        ), chg AS (
            SELECT rel_type, 'added' AS change_type
            FROM (SELECT * FROM new_t EXCEPT SELECT * FROM old_t)
            UNION ALL
            SELECT rel_type, 'removed'
            FROM (SELECT * FROM old_t EXCEPT SELECT * FROM new_t)
        )
        SELECT rel_type, change_type, count(*) AS n
        FROM chg GROUP BY rel_type, change_type
        UNION ALL
        SELECT 'PERFORMED', 'immutable_append', count(*)
        FROM base WHERE event_id % 3 <> 0 AND rel_type = 'PERFORMED'
    """,
    covers=("T7", "T6", "J5", "A10"),
    doc=(
        "T7 driver carrier (r14, r13 VERDICT task 8 — the immutable "
        "bypass was pytest-only): event rows are shaped into three "
        "edge families, one of them PERFORMED (an IMMUTABLE event "
        "edge type, config/settings.py:79-86), and two snapshots are "
        "diffed through the REAL diff_edges operator "
        "(operators/scd2.py:207). The result counts the changelog per "
        "(rel_type, change_type) plus one 'immutable_append' row for "
        "the bypass lane. The oracle's changelog covers ONLY the "
        "trackable types — a PERFORMED edge leaking into change "
        "tracking adds rows and hash-mismatches — while the append "
        "row pins that immutable edges pass through untracked and "
        "UNDEDUPLICATED (raw row count), the reference's "
        "temporal_loader.py:83-100 contract."
    ),
)
def edge_diff_immutable_bypass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import diff_edges

    base = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 3 == 0, "PERFORMED")
        .when(F.col("user_id") % 3 == 1, "OWNED_BY")
        .otherwise("WORKS_AT")
        .alias("rel_type"),
        F.col("user_id").cast("string").alias("from_id"),
        (F.col("event_id") % 50).cast("string").alias("to_id"),
        "event_id",
    )
    old_e = base.where("event_id % 2 = 0").drop("event_id")
    new_e = base.where("event_id % 3 != 0").drop("event_id")
    res = diff_edges(old_e, new_e, now="2024-06-01T00:00:00")
    chg = res.changelog.groupBy("rel_type", "change_type").agg(
        F.count("*").alias("n")
    )
    imm = res.immutable.agg(
        F.lit("PERFORMED").alias("rel_type"),
        F.lit("immutable_append").alias("change_type"),
        F.count("*").alias("n"),
    )
    return chg.unionByName(imm)
