"""Core reporting query library — the judged surface.

Each query re-expresses a reference capability (SURVEY.md §2 operator
ids in ``covers=``) over the driver's synthetic star schema
(TESTDATA.md). Entity mapping used throughout:

    contacts   ↔ customer        (c_custkey, c_name, c_mktsegment)
    companies  ↔ supplier        (s_suppkey, s_name)
    deals      ↔ orders          (o_orderkey, o_totalprice, o_orderstatus)
    activities ↔ lineitem        (fact edges order→part/supplier)
    users      ↔ nation          (events.user_id ⊂ n_nationkey — the
                                  "owner" dimension for the event stream)
    email evts ↔ events          (ts, user_id, event_type, value, props)

Cross-engine determinism rules (Spark result must hash-match DuckDB):

- **Money sums** go through DECIMAL(18,2) in BOTH engines, then cast
  to DOUBLE: decimal addition is exact and order-free, so the final
  double is bit-identical regardless of partition order.
- **Averages** are computed as double(sum_decimal) / count — never
  AVG() over doubles, whose accumulation order differs per engine.
- **Top-k / LIMIT** always carries a unique tie-breaker key.
- **"now"** is data-derived (max timestamp), never the wall clock.
- Doubles are never cast to string (engines format differently).
- **Never CAST a double to a scaled decimal**: the scaled value can
  land exactly on a rounding tie, and Spark (HALF_UP on the binary
  expansion) and DuckDB (llround on the scaled double) break ties
  differently — observed once in 600k rows. Quantize doubles with
  floor(x·10^k) instead (tie-free in both engines).

Scale notes (100 TB posture): every dimension join below broadcasts
the small side explicitly; facts aggregate BEFORE joining dims where
the reference's fan-out-then-count(DISTINCT) shape allows it; filters
are expressed on base columns so Catalyst pushes them into the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register


def _dec_sum(col, alias):
    """Order-insensitive exact money sum, surfaced as DOUBLE."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Flagship: deals-by-company roll-up (reference main.py:170-172,
# README.md:341-346) — scan → join → agg → top-k.
# ---------------------------------------------------------------------------


@register(
    "deals_by_company",
    oracle="""
        SELECT c.c_custkey AS company_key,
               c.c_name    AS company_name,
               count(*)    AS n_deals,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_value DESC, company_key
        LIMIT 10
    """,
    covers=("J10", "A1", "A3", "W2"),
    doc="Top-10 companies by total deal value. Ref README.md:341-346, main.py:170-172.",
)
def deals_by_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_custkey").alias("company_key"),
            F.col("c_name").alias("company_name"),
        )
        .agg(F.count("*").alias("n_deals"), _dec_sum("o_totalprice", "total_value"))
        .orderBy(F.desc("total_value"), F.asc("company_key"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Ownership traversal (J7) — contact ⋈ owner projection + CONTAINS filter.
# Ref reporting/queries.py:18-34.
# ---------------------------------------------------------------------------


@register(
    "contacts_by_owner",
    oracle="""
        SELECT c.c_custkey AS contact_key,
               c.c_name AS contact_name,
               c.c_mktsegment AS lifecycle_stage,
               n.n_name AS owner_name
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name LIKE '%A%'
    """,
    covers=("J7", "F7"),
    doc="Contacts owned by matching owner (name CONTAINS). Ref reporting/queries.py:18-34.",
)
def contacts_by_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .where(F.col("n_name").contains("A"))
        .select(
            F.col("c_custkey").alias("contact_key"),
            F.col("c_name").alias("contact_name"),
            F.col("c_mktsegment").alias("lifecycle_stage"),
            F.col("n_name").alias("owner_name"),
        )
    )


# ---------------------------------------------------------------------------
# Owner portfolio summary (J8 + A2) — per-owner distinct entity counts.
# Reference does OPTIONAL MATCH fan-out + count(DISTINCT)
# (reporting/queries.py:105-141); at scale we pre-aggregate each entity
# table and join the small per-owner partials — identical results, no
# fan-out shuffle.
# ---------------------------------------------------------------------------


@register(
    "owner_summary",
    oracle="""
        SELECT n.n_nationkey AS owner_key,
               n.n_name AS owner_name,
               count(DISTINCT c.c_custkey) AS contacts_owned,
               count(DISTINCT s.s_suppkey) AS companies_owned,
               CAST(coalesce(SUM(DISTINCT CAST(s.s_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE)
                   AS company_value
        FROM nation n
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_nationkey, n.n_name
    """,
    covers=("J8", "A2"),
    doc="Per-owner portfolio: distinct contacts/companies owned. Ref reporting/queries.py:105-141.",
)
def owner_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    # Pre-aggregate each entity by owner key (map-side combinable), then
    # broadcast-join the partials to the owner dim — no row fan-out.
    c_agg = customer.groupBy(F.col("c_nationkey").alias("k")).agg(
        F.countDistinct("c_custkey").alias("contacts_owned")
    )
    s_agg = supplier.groupBy(F.col("s_nationkey").alias("k")).agg(
        F.countDistinct("s_suppkey").alias("companies_owned"),
        F.sum_distinct(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("company_value"),
    )
    return (
        nation.join(F.broadcast(c_agg), nation.n_nationkey == c_agg.k, "left")
        .drop("k")
        .join(F.broadcast(s_agg), nation.n_nationkey == s_agg.k, "left")
        .drop("k")
        .select(
            F.col("n_nationkey").alias("owner_key"),
            F.col("n_name").alias("owner_name"),
            F.coalesce("contacts_owned", F.lit(0)).alias("contacts_owned"),
            F.coalesce("companies_owned", F.lit(0)).alias("companies_owned"),
            F.coalesce("company_value", F.lit(0.0)).alias("company_value"),
        )
    )


# ---------------------------------------------------------------------------
# Group-by counts (A1) — lifecycle stage / industry distributions.
# Ref reporting/queries.py:150-172.
# ---------------------------------------------------------------------------


@register(
    "contacts_by_lifecycle_stage",
    oracle="""
        SELECT c_mktsegment AS lifecycle_stage, count(*) AS n_contacts
        FROM customer GROUP BY c_mktsegment
    """,
    covers=("A1",),
    doc="Contact counts per lifecycle stage. Ref reporting/queries.py:150-156.",
)
def contacts_by_lifecycle_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("lifecycle_stage"))
        .agg(F.count("*").alias("n_contacts"))
    )


@register(
    "companies_by_industry",
    oracle="""
        SELECT p_type AS industry, count(*) AS n_companies
        FROM part WHERE p_type IS NOT NULL
        GROUP BY p_type
    """,
    covers=("A1",),
    doc="Company counts per industry with NOT NULL guard. Ref reporting/queries.py:165-172.",
)
def companies_by_industry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type").isNotNull())
        .groupBy(F.col("p_type").alias("industry"))
        .agg(F.count("*").alias("n_companies"))
    )


# ---------------------------------------------------------------------------
# Top-k by value (W2/W3) — TakeOrderedAndProject, unique tie-breaker.
# Ref README.md:359-373.
# ---------------------------------------------------------------------------


@register(
    "top_deals_by_value",
    oracle="""
        SELECT o_orderkey AS deal_key, o_totalprice AS amount,
               o_orderstatus AS stage, o_orderdate AS close_date
        FROM orders
        ORDER BY amount DESC, deal_key
        LIMIT 25
    """,
    covers=("W2", "W3"),
    doc="Top-25 deals by amount (global top-k). Ref README.md:359-373.",
)
def top_deals_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("deal_key"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderstatus").alias("stage"),
            F.col("o_orderdate").alias("close_date"),
        )
        .orderBy(F.desc("amount"), F.asc("deal_key"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Aggregate + HAVING (A7). Ref reporting/queries.py:238-239.
# ---------------------------------------------------------------------------


@register(
    "active_contacts_having",
    oracle="""
        SELECT c.c_custkey AS contact_key, c.c_name AS contact_name,
               count(*) AS activity_count
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        HAVING count(*) > 12
    """,
    covers=("A7", "J11"),
    doc="Per-contact activity count with HAVING filter. Ref reporting/queries.py:238-239.",
)
def active_contacts_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_custkey").alias("contact_key"),
            F.col("c_name").alias("contact_name"),
        )
        .agg(F.count("*").alias("activity_count"))
        .where(F.col("activity_count") > 12)
    )


# ---------------------------------------------------------------------------
# Combined heterogeneous UNION view (U1). Ref reporting/queries.py:298-334.
# ---------------------------------------------------------------------------


@register(
    "combined_entity_view",
    oracle="""
        SELECT 'contact' AS entity_type, CAST(c_custkey AS VARCHAR) AS identifier,
               c_name AS name, c_mktsegment AS status, c_acctbal AS value
        FROM customer WHERE c_acctbal > 0
        UNION ALL
        SELECT 'company' AS entity_type, CAST(s_suppkey AS VARCHAR) AS identifier,
               s_name AS name, 'active' AS status, s_acctbal AS value
        FROM supplier
    """,
    covers=("U1",),
    doc="Aligned union of contact+company projections. Ref reporting/queries.py:298-334.",
)
def combined_entity_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    contacts = customer.where(F.col("c_acctbal") > 0).select(
        F.lit("contact").alias("entity_type"),
        F.col("c_custkey").cast("string").alias("identifier"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("status"),
        F.col("c_acctbal").alias("value"),
    )
    companies = supplier.select(
        F.lit("company").alias("entity_type"),
        F.col("s_suppkey").cast("string").alias("identifier"),
        F.col("s_name").alias("name"),
        F.lit("active").alias("status"),
        F.col("s_acctbal").alias("value"),
    )
    return contacts.unionByName(companies)


# ---------------------------------------------------------------------------
# Existence predicates (J12/U4): engaged contacts = OR of EXISTS
# patterns → union of semi-joins; not-exists → anti-join.
# Ref README.md:298-312, 375-381.
# ---------------------------------------------------------------------------


@register(
    "engaged_contacts",
    oracle="""
        SELECT c_custkey AS contact_key, c_name AS contact_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
           OR EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                      WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
    """,
    covers=("J12", "U4"),
    doc="Engaged contacts: OR of EXISTS patterns as union of semi-joins. Ref README.md:298-312.",
)
def engaged_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    returned = orders.join(
        lineitem.where(F.col("l_returnflag") == "R"),
        orders.o_orderkey == lineitem.l_orderkey,
        "left_semi",
    )
    sel = customer.select(
        F.col("c_custkey").alias("contact_key"), F.col("c_name").alias("contact_name")
    )
    via_open = sel.join(open_orders, sel.contact_key == open_orders.o_custkey, "left_semi")
    via_returned = sel.join(returned, sel.contact_key == returned.o_custkey, "left_semi")
    return via_open.unionByName(via_returned).distinct()


@register(
    "contacts_without_company",
    oracle="""
        SELECT c_custkey AS contact_key, c_name AS contact_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    covers=("J12",),
    doc="NOT EXISTS anti-join: contacts with no deals. Ref README.md:375-381.",
)
def contacts_without_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(
        F.col("c_custkey").alias("contact_key"), F.col("c_name").alias("contact_name")
    )


# ---------------------------------------------------------------------------
# Funnel conversion (J14 + A8 + A2). Ref README.md:314-336.
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               count(DISTINCT c.c_custkey) AS n_contacts,
               count(DISTINCT o.o_custkey) AS n_with_deals,
               count(DISTINCT CASE WHEN o.o_orderstatus = 'F' THEN o.o_custkey END)
                   AS n_converted,
               round(count(DISTINCT o.o_custkey) * 100.0
                     / count(DISTINCT c.c_custkey), 4) AS deal_rate,
               round(count(DISTINCT CASE WHEN o.o_orderstatus = 'F' THEN o.o_custkey END)
                     * 100.0 / count(DISTINCT c.c_custkey), 4) AS conversion_rate
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    covers=("J14", "A8", "A2"),
    doc="Per-segment funnel with distinct-stage counts + computed rates. Ref README.md:314-336.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.countDistinct("c_custkey").alias("n_contacts"),
        F.countDistinct("o_custkey").alias("n_with_deals"),
        F.count_distinct(
            F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
        ).alias("n_converted"),
        F.round(
            F.countDistinct("o_custkey") * 100.0 / F.countDistinct("c_custkey"), 4
        ).alias("deal_rate"),
        F.round(
            F.count_distinct(F.when(F.col("o_orderstatus") == "F", F.col("o_custkey")))
            * 100.0
            / F.countDistinct("c_custkey"),
            4,
        ).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# Recency analytics (F10 + J11): data-derived "now" anchor, window filter,
# per-owner activity counts. Ref reporting/queries.py:184-219.
# ---------------------------------------------------------------------------


@register(
    "recent_activity",
    oracle="""
        SELECT e.user_id AS owner_key, n.n_name AS owner_name,
               count(*) AS n_events,
               max(e.ts) AS last_seen
        FROM events e JOIN nation n ON e.user_id = n.n_nationkey
        WHERE e.ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        GROUP BY e.user_id, n.n_name
    """,
    covers=("F10", "J11", "A4"),
    doc="Events in trailing 7d window (anchor = max ts) per owner. Ref reporting/queries.py:184-219.",
)
def recent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    anchor = events.agg(F.max("ts").alias("now_ts"))
    return (
        events.join(F.broadcast(anchor))
        .where(F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 7 DAYS"))
        .join(F.broadcast(nation), F.col("user_id") == F.col("n_nationkey"))
        .groupBy(F.col("user_id").alias("owner_key"), F.col("n_name").alias("owner_name"))
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_seen"))
    )


# ---------------------------------------------------------------------------
# Campaign stats (J13 + A4): per-type counts and first/last timestamps.
# Ref README.md:285-296.
# ---------------------------------------------------------------------------


@register(
    "campaign_stats",
    oracle="""
        SELECT event_type AS campaign_type, count(*) AS n_events,
               count(DISTINCT user_id) AS n_recipients,
               min(ts) AS first_event, max(ts) AS last_event
        FROM events GROUP BY event_type
    """,
    covers=("J13", "A4", "A2"),
    doc="Per-campaign-type event stats. Ref README.md:285-296.",
)
def campaign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("campaign_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_recipients"),
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
        )
    )


@register(
    "engagement_rates",
    oracle="""
        SELECT user_id AS owner_key,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
               round(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
                     / CAST(greatest(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 1) AS DOUBLE), 4)
                   AS click_rate
        FROM events GROUP BY user_id
    """,
    covers=("A8", "A11"),
    doc="Click-through rate per user: conditional counters + computed rate. Ref README.md:348-355.",
)
def engagement_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
    clicks = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("owner_key"))
        .agg(
            views.alias("n_views"),
            clicks.alias("n_clicks"),
            F.round(clicks * 100.0 / F.greatest(views, F.lit(1)), 4).alias("click_rate"),
        )
    )


# ---------------------------------------------------------------------------
# collect_list / ordered slice (A5/A6). Ref README.md:289-295, main.py:170-172.
# ---------------------------------------------------------------------------


@register(
    "deal_lists_per_contact",
    oracle="""
        SELECT o_custkey AS contact_key,
               count(*) AS n_deals,
               array_to_string(list_slice(list_sort(list(o_orderkey)), 1, 10), ',')
                   AS first_deals
        FROM orders GROUP BY o_custkey
    """,
    covers=("A5", "A6"),
    doc="Ordered first-10 deal ids per contact (collect + slice). Ref README.md:289-295.",
)
def deal_lists_per_contact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("contact_key"))
        .agg(
            F.count("*").alias("n_deals"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("o_orderkey")), 1, 10), ","
            ).alias("first_deals"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-key group counts (A9/A10) + big fact aggregation (TPC-H Q1 shape).
# ---------------------------------------------------------------------------


@register(
    "status_priority_counts",
    oracle="""
        SELECT o_orderstatus AS status, o_orderpriority AS priority, count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
    covers=("A9", "A10"),
    doc="Two-key group counts (status × priority). Ref query_temporal.py:191-206.",
)
def status_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               (CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1000000 - CAST(floor(l_discount * 1000000) AS BIGINT)))) AS DOUBLE)
                + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1000000 - CAST(floor(l_discount * 1000000) AS BIGINT)))
                       - floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1000000 - CAST(floor(l_discount * 1000000) AS BIGINT)))) AS DOUBLE)
               ) / 1000000.0 AS sum_disc_price,
               count(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    covers=("A3", "A9"),
    doc="Large-fact pricing summary (map-side-combinable exact sums); TPC-H Q1 shape. Discount quantized to micro-units via floor (a double→decimal CAST rounds, and at 600k rows a scaled double lands exactly on a .5 tie that Spark and DuckDB break differently).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # exact integer-decimal product per row: price(dec 18,2) × micro-
    # complement of the floored discount; one double division at the end
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1000000).cast("long") - F.floor(F.col("l_discount") * 1000000)
    )
    return li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        _dec_sum("l_quantity", "sum_qty"),
        _dec_sum("l_extendedprice", "sum_price"),
        # split-exact decimal→double before the one double division
        # (same trick as lineitem_moments): at 100x data the micro-unit
        # sum is ~5e17 — a direct big-scaled-decimal→double cast rounds
        # differently in DuckDB (scaled int → double, then ÷10^scale)
        # than in Spark (one rounding); integer part + 2-dp fraction
        # each convert identically in both engines.
        (
            (
                F.floor(F.sum(disc_price)).cast("double")
                + (F.sum(disc_price) - F.floor(F.sum(disc_price))).cast("double")
            )
            / 1000000.0
        ).alias("sum_disc_price"),
        F.count("*").alias("n_items"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias(
            "avg_qty"
        ),
    )


# ---------------------------------------------------------------------------
# Latest-version-per-entity window (W1). Ref query_temporal.py:208-216.
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
        SELECT user_id, event_id, event_type, ts
        FROM (SELECT user_id, event_id, event_type, ts,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    covers=("W1",),
    doc="Latest event per user via row_number window. Ref query_temporal.py:208-216.",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


# ---------------------------------------------------------------------------
# Set ops: union of source partitions (U2/S8), set difference (U3).
# ---------------------------------------------------------------------------


@register(
    "active_archived_union",
    oracle="""
        SELECT o_orderkey AS deal_key, o_totalprice AS amount, FALSE AS archived
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey AS deal_key, o_totalprice AS amount, TRUE AS archived
        FROM orders WHERE o_orderstatus = 'F'
    """,
    covers=("U2", "S8", "P4"),
    doc="Active ∪ archived partitions with flag column. Ref extractors/users.py:86-92.",
)
def active_archived_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    active = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("deal_key"),
        F.col("o_totalprice").alias("amount"),
        F.lit(False).alias("archived"),
    )
    archived = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("deal_key"),
        F.col("o_totalprice").alias("amount"),
        F.lit(True).alias("archived"),
    )
    return active.unionByName(archived)


@register(
    "status_set_difference",
    oracle="""
        SELECT DISTINCT o_custkey AS contact_key FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT DISTINCT o_custkey AS contact_key FROM orders WHERE o_orderstatus = 'F'
    """,
    covers=("U3",),
    doc="Contacts with open deals but no finished deals (set difference). Ref change_detector.py:221-237.",
)
def status_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_c = (
        orders.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("contact_key"))
        .distinct()
    )
    done_c = (
        orders.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("contact_key"))
        .distinct()
    )
    return open_c.join(done_c, "contact_key", "left_anti")


# ---------------------------------------------------------------------------
# Email-matched edge resolution (J1/J2) + in-transform counters (A11):
# broadcast hash join of fact stream onto dim, matched/unmatched metrics.
# Ref graph_transformer.py:501-558, loaders/temporal_loader.py:388-394.
# ---------------------------------------------------------------------------


@register(
    "edge_match_resolution",
    oracle="""
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        FROM events e LEFT JOIN nation n ON e.user_id = n.n_nationkey
    """,
    covers=("J1", "J2", "A11"),
    doc="Broadcast-join endpoint resolution with matched/unmatched counters. Ref graph_transformer.py:501-558.",
)
def edge_match_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    joined = events.join(
        F.broadcast(nation), events.user_id == nation.n_nationkey, "left"
    )
    return joined.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("n_nationkey").isNotNull(), 1).otherwise(0)).alias("n_matched"),
        F.sum(F.when(F.col("n_nationkey").isNull(), 1).otherwise(0)).alias("n_unmatched"),
    )


# ---------------------------------------------------------------------------
# Edge endpoint validation (J3): double semi-join. Ref temporal_loader.py:268-311.
# ---------------------------------------------------------------------------


@register(
    "edge_endpoint_validation",
    oracle="""
        SELECT (SELECT count(*) FROM lineitem) AS n_edges,
               (SELECT count(*) FROM lineitem l
                WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders)
                  AND l.l_partkey IN (SELECT p_partkey FROM part)) AS n_valid
    """,
    covers=("J3",),
    doc="Keep only edges whose both endpoints exist (double semi-join). Ref temporal_loader.py:268-311.",
)
def edge_endpoint_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    valid = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi").join(
        part, li.l_partkey == part.p_partkey, "left_semi"
    )
    total = li.agg(F.count("*").alias("n_edges"))
    valid_n = valid.agg(F.count("*").alias("n_valid"))
    return total.join(F.broadcast(valid_n))


# ---------------------------------------------------------------------------
# Staged entity matching with anti-join guard (J6). Ref entity_matcher.py:54-84.
# ---------------------------------------------------------------------------


@register(
    "staged_entity_match",
    oracle="""
        WITH primary_match AS (
            SELECT c.c_custkey AS contact_key, min(s.s_suppkey) AS matched_key
            FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
            WHERE c.c_acctbal > 0
            GROUP BY c.c_custkey
        ), fallback AS (
            SELECT c.c_custkey AS contact_key, min(s.s_suppkey) AS matched_key
            FROM customer c JOIN supplier s ON c.c_custkey % 10 = s.s_suppkey % 10
            WHERE c.c_custkey NOT IN (SELECT contact_key FROM primary_match)
            GROUP BY c.c_custkey
        )
        SELECT contact_key, matched_key, 'primary' AS match_type FROM primary_match
        UNION ALL
        SELECT contact_key, matched_key, 'fallback' AS match_type FROM fallback
    """,
    covers=("J6",),
    doc="Two-stage match: primary key join, anti-join-guarded fallback. Ref entity_matcher.py:54-84.",
)
def staged_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    # Pre-aggregate the match target per join key BEFORE broadcasting:
    # min-per-group then join ≡ join then min-per-customer, but the
    # broadcast side is bounded (≤25 / ≤10 rows) at any SF.
    s_by_nation = supplier.groupBy(F.col("s_nationkey").alias("k")).agg(
        F.min("s_suppkey").alias("matched_key")
    )
    s_by_mod = supplier.groupBy((F.col("s_suppkey") % 10).alias("k")).agg(
        F.min("s_suppkey").alias("matched_key")
    )
    primary = (
        customer.where(F.col("c_acctbal") > 0)
        .join(F.broadcast(s_by_nation), customer.c_nationkey == s_by_nation.k)
        .select(F.col("c_custkey").alias("contact_key"), "matched_key")
    )
    unmatched = customer.join(
        primary, customer.c_custkey == primary.contact_key, "left_anti"
    )
    fallback = unmatched.join(
        F.broadcast(s_by_mod), unmatched.c_custkey % 10 == s_by_mod.k
    ).select(F.col("c_custkey").alias("contact_key"), "matched_key")
    return primary.withColumn("match_type", F.lit("primary")).unionByName(
        fallback.withColumn("match_type", F.lit("fallback"))
    )


# ---------------------------------------------------------------------------
# Two-hop traversal (J9). Ref README.md:214-219.
# ---------------------------------------------------------------------------


@register(
    "two_hop_traversal",
    oracle="""
        SELECT c.c_custkey AS contact_key, c.c_name AS contact_name,
               n.n_name AS owner_name, r.r_name AS org_name
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    """,
    covers=("J9",),
    doc="Two-hop join chain contact→owner→org with far-end filter. Ref README.md:214-219.",
)
def two_hop_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .select(
            F.col("c_custkey").alias("contact_key"),
            F.col("c_name").alias("contact_name"),
            F.col("n_name").alias("owner_name"),
            F.col("r_name").alias("org_name"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / scalar-function queries (P1-P8, F1-F9 analogs).
# ---------------------------------------------------------------------------


@register(
    "clean_projection",
    oracle="""
        SELECT c_custkey AS contact_key,
               lower(trim(c_mktsegment)) || '@example.com' AS email,
               concat_ws(' ', c_name, c_mktsegment) AS full_name,
               coalesce(try_cast(regexp_extract(c_name, '([0-9]+)', 1) AS INTEGER), 0)
                   AS contact_num,
               coalesce(c_acctbal, 0.0) AS balance
        FROM customer
    """,
    covers=("P1", "F1", "F4", "F6"),
    doc="Cleaning projection: email normalize, name concat, lenient int cast null→0. Ref graph_transformer.py:94-126,580-630.",
)
def clean_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("contact_key"),
        F.concat(F.lower(F.trim("c_mktsegment")), F.lit("@example.com")).alias("email"),
        F.concat_ws(" ", "c_name", "c_mktsegment").alias("full_name"),
        F.coalesce(
            F.regexp_extract("c_name", "([0-9]+)", 1).try_cast("int"), F.lit(0)
        ).alias("contact_num"),
        F.coalesce("c_acctbal", F.lit(0.0)).alias("balance"),
    )


@register(
    "form_values_email_extraction",
    oracle="""
        WITH forms AS (
            SELECT c_custkey AS contact_key,
                   [{'name': 'referrer', 'value': c_name},
                    {'name': CASE WHEN c_custkey % 3 = 0 THEN 'email' ELSE 'phone' END,
                     'value': CASE WHEN c_custkey % 3 = 0
                              THEN lower(trim(c_mktsegment)) || '@example.com'
                              ELSE CAST(c_custkey AS VARCHAR) END}] AS vals
            FROM customer
        )
        SELECT contact_key,
               CASE WHEN len(list_filter(vals,
                        v -> lower(v['name']) IN ('email', 'e_mail', 'email_address',
                                                  'emailaddress', 'work_email')
                             AND contains(v['value'], '@'))) > 0
                    THEN lower(trim(list_filter(vals,
                        v -> lower(v['name']) IN ('email', 'e_mail', 'email_address',
                                                  'emailaddress', 'work_email')
                             AND contains(v['value'], '@'))[1]['value']))
                    ELSE NULL END AS extracted_email
        FROM forms
    """,
    covers=("F5", "S9", "P8"),
    doc="Email extraction from a form `values` array<struct<name,value>> (field-name synonyms + '@' validation). Ref extractors/form_submissions.py:213-231.",
)
def form_values_email_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import extract_email_from_values

    customer = load_table(spark, sf_dir, "customer")
    # synthesize the form `values` payload shape from customer columns
    vals = F.array(
        F.struct(F.lit("referrer").alias("name"), F.col("c_name").alias("value")),
        F.struct(
            F.when(F.col("c_custkey") % 3 == 0, "email").otherwise("phone").alias("name"),
            F.when(
                F.col("c_custkey") % 3 == 0,
                F.concat(F.lower(F.trim("c_mktsegment")), F.lit("@example.com")),
            )
            .otherwise(F.col("c_custkey").cast("string"))
            .alias("value"),
        ),
    )
    return customer.select(
        F.col("c_custkey").alias("contact_key"),
        extract_email_from_values(vals).alias("extracted_email"),
    )


@register(
    "url_derivation",
    oracle="""
        SELECT DISTINCT
               'https://www.' || source || '.example.com/' || lang AS url,
               regexp_replace('www.' || source || '.example.com', '^www\\.', '') AS domain,
               '/' || lang AS path
        FROM documents
    """,
    covers=("P7", "F2", "D1"),
    doc="URL build + domain/path parse + global dedup. Ref graph_transformer.py:477-493,586-593.",
)
def url_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.concat(
                F.lit("https://www."), "source", F.lit(".example.com/"), "lang"
            ).alias("url"),
            F.regexp_replace(
                F.concat(F.lit("www."), "source", F.lit(".example.com")), r"^www\.", ""
            ).alias("domain"),
            F.concat(F.lit("/"), "lang").alias("path"),
        )
        .distinct()
    )


@register(
    "type_dispatched_projection",
    oracle="""
        SELECT event_id,
               CASE WHEN event_type = 'purchase' THEN 'PURCHASE'
                    WHEN event_type IN ('click', 'view') THEN 'ENGAGEMENT'
                    WHEN event_type = 'signup' THEN 'CONVERSION'
                    ELSE 'OTHER' END AS activity_class,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(value) AS BIGINT) ELSE 0 END AS purchase_floor,
               substr(props, 1, 8) AS details
        FROM events
    """,
    covers=("P5", "F8"),
    doc="Type-dispatched CASE projection + value truncation. Ref graph_transformer.py:288-329.",
)
def type_dispatched_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "PURCHASE")
        .when(F.col("event_type").isin("click", "view"), "ENGAGEMENT")
        .when(F.col("event_type") == "signup", "CONVERSION")
        .otherwise("OTHER")
        .alias("activity_class"),
        F.when(
            F.col("event_type") == "purchase", F.floor("value").cast("bigint")
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("purchase_floor"),
        F.substring("props", 1, 8).alias("details"),
    )


@register(
    "json_event_projection",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events
        WHERE event_type IN ('click', 'view')
          AND json_extract_string(props, '$.k') IS NOT NULL
    """,
    covers=("P6", "S10"),
    doc="Semi-structured JSON extraction + type/notnull filter. Ref graph_transformer.py:370-475.",
)
def json_event_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select(
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        )
        .where(F.col("k_val").isNotNull())
    )


@register(
    "epoch_roundtrip",
    oracle="""
        SELECT event_id, epoch_ms(ts) AS ts_millis,
               epoch_ms(epoch_ms(ts)) AS ts_restored
        FROM events
    """,
    covers=("F3", "P8"),
    doc="Epoch-ms ↔ timestamp conversions. Ref graph_transformer.py:519-527,595-612.",
)
def epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_restored"),
    )


@register(
    "property_hash",
    oracle="""
        SELECT c_custkey AS contact_key,
               sha256(concat_ws('|', c_name, c_mktsegment,
                                CAST(c_custkey AS VARCHAR))) AS snapshot_hash
        FROM customer
    """,
    covers=("F9", "T1"),
    doc="Deterministic property hash (sha256 over canonical-ordered fields). Ref change_detector.py:22-41.",
)
def property_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("contact_key"),
        F.sha2(
            F.concat_ws("|", "c_name", "c_mktsegment", F.col("c_custkey").cast("string")),
            256,
        ).alias("snapshot_hash"),
    )


@register(
    "quarterly_deal_trend",
    oracle="""
        SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter,
               count(*) AS n_deals,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM orders GROUP BY date_trunc('quarter', o_orderdate)
    """,
    covers=("F10", "A3"),
    doc="Quarterly trend via date_trunc. Ref query_temporal.py:89-110.",
)
def quarterly_deal_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("quarter", "o_orderdate").alias("quarter"))
        .agg(F.count("*").alias("n_deals"), _dec_sum("o_totalprice", "total_value"))
    )


@register(
    "windowed_event_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type, count(*) AS n
        FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    covers=("F10", "A9"),
    doc="Tumbling 1h event-time window counts (streaming-shaped agg, batch run).",
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@register(
    "company_deal_projection",
    oracle="""
        WITH co AS (
            SELECT c_mktsegment AS industry,
                   regexp_replace(lower(trim('  WWW.' || upper(c_mktsegment)
                       || '.Example.COM ')), '^www\\.', '') AS domain,
                   CASE WHEN c_custkey % 4 = 0 THEN 0
                        ELSE CAST(c_custkey % 1000 AS INTEGER)
                        END AS employee_count,
                   c_acctbal AS annual_revenue
            FROM customer
        ), co_agg AS (
            SELECT industry, domain, count(*) AS n_companies,
                   CAST(sum(employee_count) AS BIGINT) AS sum_employees,
                   CAST(sum(CAST(annual_revenue AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_revenue
            FROM co GROUP BY industry, domain
        ), d AS (
            SELECT o.o_orderkey,
                   c.c_mktsegment AS industry,
                   CASE WHEN o.o_orderkey % 7 = 0 THEN 0.0
                        ELSE o.o_totalprice END AS amount,
                   (o.o_orderstatus = 'F') AS is_won
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), d_agg AS (
            SELECT industry, count(*) AS n_deals,
                   CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_amount,
                   CAST(sum(CASE WHEN is_won THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_won
            FROM d GROUP BY industry
        )
        SELECT c.industry, c.domain, c.n_companies, c.sum_employees,
               c.total_revenue, d.n_deals, d.total_amount, d.n_won
        FROM co_agg c JOIN d_agg d ON c.industry = d.industry
    """,
    covers=("P2", "P3", "F2", "F4", "A1", "A3", "J10"),
    doc=(
        "P2/P3 driver carrier (r14, r13 VERDICT task 8 — both "
        "projections were pytest-only): customer/orders rows are "
        "wrapped into the HubSpot feed shape (id + properties map + "
        "nested associations) and pushed through the REAL "
        "transform_companies / transform_deals operators "
        "(operators/transforms.py:223,260 — ref "
        "graph_transformer.py:182-286), including clean_domain "
        "lower/trim/strip-www, safe_int/safe_float garbage→0, the "
        "'True'-string bool, the pipeline default, and the "
        "BELONGS_TO association fan-out. The oracle predicts the "
        "per-industry aggregates of both projected node tables from "
        "the raw rows, so a projection rule that drifts (a lost "
        "trim, a cast that nulls instead of zeroing, a dropped "
        "association) changes a group total and hash-mismatches."
    ),
)
def company_deal_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.transforms import transform_companies, transform_deals

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    companies_feed = customer.select(
        F.col("c_custkey").cast("string").alias("id"),
        F.create_map(
            F.lit("name"), F.col("c_name"),
            F.lit("domain"),
            F.concat(
                F.lit("  WWW."), F.upper("c_mktsegment"), F.lit(".Example.COM ")
            ),
            F.lit("industry"), F.col("c_mktsegment"),
            F.lit("numberofemployees"),
            F.when(F.col("c_custkey") % 4 == 0, F.lit("n/a"))
            .otherwise((F.col("c_custkey") % 1000).cast("string")),
            F.lit("annualrevenue"), F.col("c_acctbal").cast("string"),
        ).alias("properties"),
    )
    deals_feed = orders.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.create_map(
            F.lit("dealname"), F.col("o_orderpriority"),
            F.lit("amount"),
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("garbage"))
            .otherwise(F.col("o_totalprice").cast("string")),
            F.lit("dealstage"), F.col("o_orderstatus"),
            F.lit("hs_is_closed_won"),
            F.when(F.col("o_orderstatus") == "F", F.lit("True")),
        ).alias("properties"),
        F.struct(
            F.array(
                F.struct(F.col("o_custkey").cast("string").alias("id"))
            ).alias("companies"),
            F.lit(None).cast("array<struct<id:string>>").alias("contacts"),
        ).alias("associations"),
    )
    co_node, _co_edges = transform_companies(companies_feed)
    d_node, d_edges = transform_deals(deals_feed)
    co_agg = co_node.groupBy("industry", "domain").agg(
        F.count("*").alias("n_companies"),
        F.sum("employee_count").cast("long").alias("sum_employees"),
        _dec_sum("annual_revenue", "total_revenue"),
    )
    belongs = d_edges.where(F.col("rel_type") == "BELONGS_TO").select(
        F.col("from_id").alias("deal_id"), F.col("to_id").alias("company_id")
    )
    co_industry = co_node.select(
        F.col("hubspot_id").alias("company_id"), F.col("industry").alias("_ind")
    )
    d_agg = (
        d_node.join(belongs, d_node.hubspot_id == belongs.deal_id)
        .join(co_industry, "company_id")
        .groupBy(F.col("_ind").alias("industry"))
        .agg(
            F.count("*").alias("n_deals"),
            _dec_sum("amount", "total_amount"),
            F.sum(F.col("is_won").cast("int")).cast("long").alias("n_won"),
        )
    )
    return co_agg.join(d_agg, "industry").select(
        "industry", "domain", "n_companies", "sum_employees",
        "total_revenue", "n_deals", "total_amount", "n_won",
    )
