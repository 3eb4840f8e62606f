"""SparkSession factory.

One place to own the configs that matter for both local correctness
runs and a real multi-executor cluster:

- AQE on (runtime coalesce, skew-join splitting, broadcast demotion)
- UTC session timezone (oracle comparisons against DuckDB's naive UTC)
- Arrow for pandas interchange (Pandas UDFs, toPandas)
- shuffle partitions sized to the local core count; on a real cluster
  AQE coalesces the 2048 initial partitions down to what the data needs
- ``nanosAsLong`` because the synthetic events table stores
  TIMESTAMP(NANOS), which Spark's parquet reader refuses otherwise
  (sources/tpch.py converts the long back to a timestamp column).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    app_name: str = "hubspot-neo4j-pipeline-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    NOTE: getOrCreate() semantics — if a session already exists in
    this process, it is returned as-is and cpus/shuffle_partitions/
    extra_conf are IGNORED. Callers that need specific configs (bench)
    must be the first to create the session in their process.

    In local mode ``spark.driver.memory`` is the whole JVM; keep the
    default unless the caller overrides via extra_conf.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # local mode: the driver JVM is the whole cluster — the 1g
        # default OOMs under 32 concurrent tasks + cached frames.
        .config("spark.driver.memory", "16g")
        # JVM unified-logging warnings (gc,alloc) print to STDOUT and
        # would corrupt single-JSON-line protocols (bench.py).
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
