"""Warehouse analytics shapes beyond the reference's query list:
ROLLUP/grouping-sets, pivot, running-total windows, ratio-to-report
window aggregates, and the classic multi-way star-join volumes
(TPC-H Q3/Q5 shapes on the driver's star schema).

The reference engine exposes group-by/having/top-k (SURVEY §2 A/W
families); a drop-in analytics replacement also needs the grouping-set
and windowed-aggregate families — registered here with full DuckDB
oracles.

Determinism follows plans/core_queries.py: money sums via
DECIMAL(18,2) on raw columns; double PRODUCTS (price×(1-discount))
are floor-quantized to cents BEFORE summing (cast-to-decimal on a
product can land on a rounding tie — see the core module docstring);
rolled-up group keys are coalesced to 'ALL' so null handling never
depends on engine sort order; every top-k carries a unique tie-break.

Scale notes: dims broadcast; fact-fact joins shuffle on their keys;
ROLLUP is one shuffle (Spark expands grouping sets map-side); windows
partition by bounded keys (customer, nation) — no global sort
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register


def _dec_sum(col, alias):
    """Order-insensitive exact money sum, surfaced as DOUBLE."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


def _revenue_cents(price="l_extendedprice", discount="l_discount"):
    """Discounted revenue in integer cents: floor-quantized (tie-free in
    both engines), summable exactly as a BIGINT."""
    return F.floor(F.col(price) * (1 - F.col(discount)) * 100).cast("long")


@register(
    "sales_rollup",
    oracle="""
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(n_name, o_orderpriority) AS INTEGER) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_sales
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, o_orderpriority)
    """,
    covers=("A9", "A1", "J7"),
    doc=(
        "ROLLUP over (nation, priority): per-cell, per-nation subtotal, and "
        "grand total in ONE pass with grouping_id disambiguation — the "
        "grouping-sets family the reference lacks. Scale: Spark expands the "
        "rollup map-side and shuffles once; nation dim broadcasts."
    ),
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            _dec_sum("o_totalprice", "total_sales"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("int").alias("gid"),
            "n_orders",
            "total_sales",
        )
    )


@register(
    "priority_status_pivot",
    oracle="""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sales_f
        FROM orders
        GROUP BY o_orderpriority
    """,
    covers=("A9", "A10"),
    doc=(
        "Pivot (long → wide): order counts per priority × status as "
        "columns, plus a pivoted money sum. Spark's pivot with an explicit "
        "value list compiles to conditional aggregates — one scan, one "
        "shuffle, no per-value passes."
    ),
)
def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # explicit value list => no values-discovery job, stable columns
    status = F.col("o_orderstatus")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(status == "F", 1)).alias("n_f"),
        F.count(F.when(status == "O", 1)).alias("n_o"),
        F.count(F.when(status == "P", 1)).alias("n_p"),
        F.sum(
            F.when(status == "F", F.col("o_totalprice").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("sales_f"),
    )


@register(
    "customer_cumulative_revenue",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE) AS cum_spend,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS order_seq
        FROM orders
    """,
    covers=("W1", "A3", "F10"),
    doc=(
        "Running-total window: per-customer cumulative spend in order-date "
        "order (decimal prefix sum — exact at any partitioning) plus the "
        "order sequence number. Scale: partitioned by customer key, no "
        "global sort; the frame is ROWS-bounded so state is O(1)."
    ),
)
def customer_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        cum.alias("cum_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "shipping_priority",
    oracle="""
        WITH anchor AS (
            SELECT max(o_orderdate) - INTERVAL 180 DAY AS cutoff FROM orders
        )
        SELECT o_orderkey,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                    AS DOUBLE) / 100 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        CROSS JOIN anchor
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < cutoff
          AND l_shipdate > cutoff
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, o_orderkey
        LIMIT 10
    """,
    covers=("J10", "A3", "W2"),
    doc=(
        "TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem, "
        "unshipped-revenue per order, top-10. Anchor is data-derived "
        "(max order date − 180d) as a broadcast 1-row aggregate. Scale: "
        "the segment filter pushes to the customer scan, the date filters "
        "push to both fact scans, revenue sums exactly in integer cents, "
        "top-k is TakeOrderedAndProject."
    ),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    anchor = orders.agg(
        F.date_sub(F.max("o_orderdate"), 180).cast("timestamp").alias("cutoff")
    )
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(F.broadcast(anchor))
        .where(
            (F.col("o_orderdate") < F.col("cutoff"))
            & (F.col("l_shipdate") > F.col("cutoff"))
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(_revenue_cents()).cast("double") / 100).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "regional_supplier_volume",
    oracle="""
        SELECT r_name AS region, n_name AS nation,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                    AS DOUBLE) / 100 AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
              AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    covers=("J8", "J7", "A3"),
    doc=(
        "TPC-H Q5 shape: 6-way star join (lineitem ⋈ supplier ⋈ orders ⋈ "
        "customer, customer and supplier in the SAME nation, ⋈ nation ⋈ "
        "region), local-supplier revenue per nation. Scale: nation/region "
        "broadcast; supplier broadcasts under AQE at test SF and shuffles "
        "on the key beyond; the co-nation predicate is an equi-join "
        "condition (not a post-filter), so Catalyst keeps it in the join."
    ),
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            (F.sum(_revenue_cents()).cast("double") / 100).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "supplier_share_of_nation",
    oracle="""
        WITH per_supplier AS (
            SELECT s_nationkey, s_suppkey, s_name,
                   CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                        AS DOUBLE) / 100 AS revenue
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey, s_suppkey, s_name
        )
        SELECT n_name AS nation, s_suppkey, s_name, revenue,
               floor(revenue / sum(revenue) OVER (PARTITION BY s_nationkey)
                     * 10000) / 10000 AS nation_share,
               rank() OVER (
                   PARTITION BY s_nationkey
                   ORDER BY revenue DESC, s_suppkey
               ) AS nation_rank
        FROM per_supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    covers=("W1", "A8", "J7"),
    doc=(
        "Ratio-to-report window: each supplier's revenue share and rank "
        "within its nation — aggregate first (per-supplier partials), THEN "
        "window over the small aggregated set. Scale: the window input is "
        "|suppliers| rows, not |lineitem|; share is floor-quantized for "
        "cross-engine determinism."
    ),
)
def supplier_share_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_supplier = (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey", "s_name")
        .agg((F.sum(_revenue_cents()).cast("double") / 100).alias("revenue"))
    )
    share_w = Window.partitionBy("s_nationkey")
    rank_w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("revenue"), F.asc("s_suppkey")
    )
    return (
        per_supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
        )
        .select(
            F.col("n_name").alias("nation"),
            "s_suppkey",
            "s_name",
            "revenue",
            (
                F.floor(
                    F.col("revenue") / F.sum("revenue").over(share_w) * 10000
                )
                / 10000
            ).alias("nation_share"),
            F.rank().over(rank_w).alias("nation_rank"),
        )
    )


@register(
    "status_priority_cube",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER)
                   AS gid,
               count(*) AS n_orders
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    covers=("A9", "A10"),
    doc=(
        "CUBE over (status, priority): all four grouping sets in one pass "
        "with grouping_id disambiguation — completes the grouping-set "
        "family next to sales_rollup. Scale: map-side Expand, one shuffle."
    ),
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("int").alias("gid"),
            "n_orders",
        )
    )


N_HIST_BUCKETS = 24
HIST_LO, HIST_HI = 0.0, 600000.0


@register(
    "order_value_histogram",
    oracle=f"""
        WITH bucketed AS (
            SELECT CAST(CASE
                       WHEN o_totalprice < {HIST_LO} THEN 0
                       WHEN o_totalprice >= {HIST_HI} THEN {N_HIST_BUCKETS} + 1
                       ELSE floor((o_totalprice - {HIST_LO})
                                  / (({HIST_HI} - {HIST_LO}) / {N_HIST_BUCKETS})) + 1
                   END AS BIGINT) AS bucket,
                   o_totalprice
            FROM orders
        )
        SELECT bucket,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS bucket_value
        FROM bucketed GROUP BY bucket
    """,
    covers=("A9", "A3"),
    doc=(
        "Equi-width histogram (width_bucket semantics, spelled as explicit "
        "arithmetic so both engines evaluate the identical double ops): "
        "24 buckets over order value + under/overflow bins. Scale: pure "
        "map-side bucketing, one small shuffle on the bucket id."
    ),
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    width = (HIST_HI - HIST_LO) / N_HIST_BUCKETS
    x = F.col("o_totalprice")
    bucket = (
        F.when(x < HIST_LO, F.lit(0))
        .when(x >= HIST_HI, F.lit(N_HIST_BUCKETS + 1))
        .otherwise(F.floor((x - HIST_LO) / width) + 1)
        .cast("long")
    )
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum("o_totalprice", "bucket_value"),
        )
    )


@register(
    "lineitem_moments",
    oracle="""
        WITH sums AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS sy,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx,
                   sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS syy,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        , dbl AS (
            SELECT l_returnflag, n,
                   CAST(floor(sx) AS DOUBLE) + CAST(sx - floor(sx) AS DOUBLE) AS sx,
                   CAST(floor(sy) AS DOUBLE) + CAST(sy - floor(sy) AS DOUBLE) AS sy,
                   CAST(floor(sxx) AS DOUBLE) + CAST(sxx - floor(sxx) AS DOUBLE) AS sxx,
                   CAST(floor(syy) AS DOUBLE) + CAST(syy - floor(syy) AS DOUBLE) AS syy,
                   CAST(floor(sxy) AS DOUBLE) + CAST(sxy - floor(sxy) AS DOUBLE) AS sxy
            FROM sums
        )
        SELECT l_returnflag,
               n,
               sx / n AS mean_price,
               (CAST(n AS DOUBLE) * sxx - sx * sx)
               / (CAST(n AS DOUBLE) * (n - 1)) AS var_price,
               (CAST(n AS DOUBLE) * sxy - sx * sy)
               / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
                   AS corr_price_qty
        FROM dbl
    """,
    covers=("A3", "A8", "A9"),
    doc=(
        "Exact distributed moment statistics: variance and correlation from "
        "DECIMAL sums of products (2-dp inputs → 4-dp products, exact and "
        "order-free), combined by ONE fixed double formula at the end — "
        "bit-identical across engines and partitionings, unlike naive "
        "corr()/stddev() whose double accumulation is order-dependent. "
        "Decimal→double conversion is split into integer + fractional "
        "parts: DuckDB double-rounds big scale-4 decimal casts (scaled "
        "int → double, then ÷10⁴) while Spark rounds once, so the parts "
        "must each convert exactly (integer part < 2^53 — holds for these "
        "sums through ~sf1; pre-scale inputs beyond). Scale: map-side "
        "combinable partial sums, one shuffle on the group key."
    ),
)
def lineitem_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    xd = F.col("l_extendedprice").cast("decimal(18,2)")
    yd = F.col("l_quantity").cast("decimal(18,2)")
    sums = lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )

    def dbl(name):
        # exact split conversion: int part (< 2^53) + small 4-dp fraction,
        # each cast is exact / correctly rounded in BOTH engines
        c = F.col(name)
        return F.floor(c).cast("double") + (c - F.floor(c)).cast("double")

    n = F.col("n").cast("double")
    sx = dbl("sx")
    sy = dbl("sy")
    sxx = dbl("sxx")
    syy = dbl("syy")
    sxy = dbl("sxy")
    return sums.select(
        "l_returnflag",
        "n",
        (sx / F.col("n")).alias("mean_price"),
        ((n * sxx - sx * sx) / (n * (F.col("n") - 1))).alias("var_price"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_price_qty"),
    )


@register(
    "order_value_median",
    oracle="""
        WITH ranked AS (
            SELECT o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        )
        SELECT o_orderstatus,
               CAST(max(n) AS BIGINT) AS n_orders,
               CAST(sum(price) / count(*) AS DOUBLE) AS median_value
        FROM ranked
        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        GROUP BY o_orderstatus
    """,
    covers=("A4", "W1"),
    doc=(
        "Exact median per group WITHOUT interpolation ambiguity: rank per "
        "group, keep the middle row (odd n) or both middle rows (even n), "
        "average them in DECIMAL — exact, so no engine-specific "
        "percentile-interpolation rounding can diverge (Spark percentile "
        "and DuckDB quantile_cont use algebraically different interpolation "
        "forms). Scale: one per-group window + a trivially small final agg; "
        "at 100 TB swap in approx_percentile and drop the oracle."
    ),
)
def order_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    cw = Window.partitionBy("o_orderstatus")
    ranked = orders.select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cw).alias("n"),
    )
    mid_lo = F.floor((F.col("n") + 1) / 2)
    mid_hi = F.floor((F.col("n") + 2) / 2)
    return (
        ranked.where((F.col("rn") == mid_lo) | (F.col("rn") == mid_hi))
        .groupBy("o_orderstatus")
        .agg(
            F.max("n").alias("n_orders"),
            (F.sum("price") / F.count("*")).cast("double").alias("median_value"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', l_shipdate) AS ship_month,
                   CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                        FILTER (WHERE p_type = 'PROMO') AS DOUBLE) / 100
                       AS promo_revenue,
                   CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                        AS DOUBLE) / 100 AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY ship_month
        )
        SELECT ship_month, promo_revenue, total_revenue,
               floor(promo_revenue / total_revenue * 10000) / 10000
                   AS promo_share
        FROM monthly
    """,
    covers=("A8", "J10", "F10"),
    doc=(
        "TPC-H Q14 shape: monthly promo-vs-total revenue share — a "
        "conditional aggregate over the lineitem ⋈ part join. Scale: part "
        "projects to (key, type) before the join (2-col read), revenue is "
        "exact integer cents, the share is floor-quantized; one shuffle on "
        "the join key + one on the month."
    ),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = _revenue_cents()
    promo_cents = F.when(F.col("p_type") == "PROMO", cents)
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey)
    return (
        joined.groupBy(
            F.date_trunc("month", "l_shipdate").alias("ship_month")
        )
        .agg(
            (F.sum(promo_cents).cast("double") / 100).alias("promo_revenue"),
            (F.sum(cents).cast("double") / 100).alias("total_revenue"),
        )
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            (
                F.floor(
                    F.col("promo_revenue") / F.col("total_revenue") * 10000
                )
                / 10000
            ).alias("promo_share"),
        )
    )


@register(
    "repeat_buyers_intersect",
    oracle="""
        WITH anchor AS (
            SELECT min(o_orderdate)
                   + (max(o_orderdate) - min(o_orderdate)) / 2 AS mid
            FROM orders
        )
        SELECT o_custkey FROM orders CROSS JOIN anchor
        WHERE o_orderdate < mid
        INTERSECT
        SELECT o_custkey FROM orders CROSS JOIN anchor
        WHERE o_orderdate >= mid
    """,
    covers=("U3", "U4", "F10"),
    doc=(
        "INTERSECT set op: customers ordering in BOTH halves of the "
        "(data-derived) date range — the remaining set-op family next to "
        "union/except. Spark compiles intersect to a LeftSemi join over "
        "distincts; the midpoint anchor is a broadcast 1-row aggregate. "
        "Scale: two pushed-down scans + one semi join on the key."
    ),
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        (
            F.min("o_orderdate")
            + ((F.max("o_orderdate") - F.min("o_orderdate")) / 2)
        ).alias("mid")
    )
    with_mid = orders.join(F.broadcast(anchor))
    first_half = with_mid.where(F.col("o_orderdate") < F.col("mid")).select(
        "o_custkey"
    )
    second_half = with_mid.where(F.col("o_orderdate") >= F.col("mid")).select(
        "o_custkey"
    )
    return first_half.intersect(second_half)


@register(
    "priority_status_unpivot",
    oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM wide
        UNION ALL
        SELECT o_orderpriority, 'n_o', n_o FROM wide
        UNION ALL
        SELECT o_orderpriority, 'n_p', n_p FROM wide
    """,
    covers=("U1", "A9"),
    doc=(
        "Unpivot (wide → long, the inverse reshape of the pivot query): "
        "melt the per-status count columns back to (priority, status, n) "
        "rows via Spark's native unpivot — an Expand node, one pass, no "
        "self-union of the input. Oracle spelled as UNION ALL (identical "
        "result set)."
    ),
)
def priority_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = priority_status_pivot(spark, sf_dir).drop("sales_f")
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_f", "n_o", "n_p"],
        variableColumnName="status_col",
        valueColumnName="n",
    )


def _pagerank_oracle(
    n_iter: int = 5, scale: int = 1 << 20, num: int = 85, den: int = 100
) -> str:
    """Unrolled-CTE fixed-point PageRank — one CTE per iteration, no
    RECURSIVE needed (the iteration count is part of the spec). Every
    step is int64 (floor division on non-negatives ≡ Spark's `div`),
    so the ranks are cross-engine cell-exact; see
    operators/graph.pagerank_quantized."""
    teleport = (scale * (den - num)) // den
    rounds = "".join(
        f""", r{i + 1} AS (
            SELECT v.id AS id,
                   CAST({teleport} + ({num} * COALESCE(m.in_mass, 0)) // {den}
                        AS BIGINT) AS rank_q
            FROM vertices v LEFT JOIN (
                SELECT e.dst AS id, SUM(r.rank_q // o.od) AS in_mass
                FROM r{i} r JOIN outdeg o ON r.id = o.src
                            JOIN edges e ON e.src = r.id
                GROUP BY e.dst
            ) m ON v.id = m.id
        )"""
        for i in range(n_iter)
    )
    return f"""
        WITH edges AS (
            SELECT CAST(c_custkey AS BIGINT) AS src,
                   CAST(1000000000 + c_nationkey AS BIGINT) AS dst
            FROM customer
            UNION ALL
            SELECT CAST(3000000000 + s_suppkey AS BIGINT),
                   CAST(1000000000 + s_nationkey AS BIGINT)
            FROM supplier
            UNION ALL
            SELECT CAST(1000000000 + n_nationkey AS BIGINT),
                   CAST(2000000000 + n_regionkey AS BIGINT)
            FROM nation
        ), vertices AS (
            SELECT DISTINCT src AS id FROM edges
            UNION
            SELECT DISTINCT dst FROM edges
        ), outdeg AS (
            SELECT src, count(*) AS od FROM edges GROUP BY src
        ), r0 AS (
            SELECT id, CAST({scale} AS BIGINT) AS rank_q FROM vertices
        ){rounds}
        SELECT id, rank_q, CAST(rank_q AS DOUBLE) / {scale} AS rank
        FROM r{n_iter}
        ORDER BY rank_q DESC, id
        LIMIT 25
    """


@register(
    "pagerank_topk",
    oracle=_pagerank_oracle(),
    covers=("A1", "W2", "J7"),
    doc=(
        "Fixed-point PageRank over the ownership DAG (customer → "
        "nation ← supplier, nation → region — the same layered "
        "ownership shape as the reference's contact → company → owner "
        "traversal, reference loaders/neo4j_loader.py relationship "
        "edges), top 25 vertices by rank with a unique id tie-break. "
        "r12 (r11 VERDICT task 4): the LAST operator with no "
        "oracle-checked registry row. Rank ties on leaf vertices are "
        "exact (identical teleport-only integers), hub ranks "
        "accumulate real mass; 5 unrolled iterations, all int64 — "
        "Spark's truncating div and DuckDB's flooring // agree on the "
        "non-negative recurrence, so the ranks hash-match cell-exact "
        "(the kmeans_seeds_quantized technique applied to an "
        "iterative graph algorithm). Scale: one join pair + one "
        "aggregation per round, lineage truncated per round; top-k is "
        "TakeOrderedAndProject, never a global sort."
    ),
)
def pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import PR_SCALE, pagerank_quantized

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    E = 1_000_000_000
    edges = (
        cust.select(
            F.col("c_custkey").cast("long").alias("src"),
            (F.lit(E) + F.col("c_nationkey").cast("long")).alias("dst"),
        )
        .unionByName(
            supp.select(
                (F.lit(3 * E) + F.col("s_suppkey").cast("long")).alias("src"),
                (F.lit(E) + F.col("s_nationkey").cast("long")).alias("dst"),
            )
        )
        .unionByName(
            nat.select(
                (F.lit(E) + F.col("n_nationkey").cast("long")).alias("src"),
                (F.lit(2 * E) + F.col("n_regionkey").cast("long")).alias("dst"),
            )
        )
    )
    ranks = pagerank_quantized(edges, n_iter=5)
    return (
        ranks.orderBy(F.desc("rank_q"), F.asc("id"))
        .limit(25)
        .select(
            "id",
            "rank_q",
            (F.col("rank_q").cast("double") / F.lit(float(PR_SCALE))).alias(
                "rank"
            ),
        )
    )
