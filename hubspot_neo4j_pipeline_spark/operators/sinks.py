"""Report sinks / formatters (SURVEY.md §2.1 S11, S15-S17) and the
node/edge table writers (S12-S14 restated for Spark).

Reference: reporting/neo4j_reporter.py:213-345 (CSV/JSON/table),
extractors/base_extractor.py:79-83 (JSON dump), loaders (MERGE upserts).
Spark-first: distributed writes for data, driver-side pretty printing
only for human-facing tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import truncate_value


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S15: headered CSV (schema union is inherent — DataFrames are
    rectangular; the reference had to union dict keys by hand)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11/S16: JSON-lines dataset."""
    df.write.mode(mode).json(path)


def to_table_string(df: DataFrame, max_width: int = 50, limit: int = 100) -> str:
    """S17: human-facing grid with value truncation
    (neo4j_reporter.py:267-345). Truncation happens distributed
    (truncate_value column expr); only `limit` rows reach the driver.
    """
    truncated = df.select(
        *[truncate_value(c, max_width).alias(c) for c in df.columns]
    )
    return truncated._show_string(limit, truncate=False)


def print_table(df: DataFrame, max_width: int = 50, limit: int = 100) -> None:
    print(to_table_string(df, max_width=max_width, limit=limit))


def upsert_nodes(
    nodes: DataFrame, path: str, key: str = "hubspot_id", mode: str = "overwrite"
) -> None:
    """S12 restated: MERGE-on-key idempotency = dedup on key then
    deterministic overwrite of the partitioned node table. (With a
    transactional format this is a MERGE INTO; plain parquet gets
    last-writer-wins per run.)"""
    nodes.dropDuplicates([key]).write.mode(mode).parquet(path)


def append_edges(
    edges: DataFrame, path: str, partition_by: str = "rel_type"
) -> None:
    """S13/S14 restated: edge table partitioned by rel_type so
    per-relationship queries prune partitions."""
    edges.write.mode("append").partitionBy(partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table: hash-partitioned AND sorted by ``key`` at
    write time, registered in the session catalog (external, at ``path``).

    This is THE repeated-join optimization at 100 TB: two tables
    bucketed by the same key with the same bucket count join with ZERO
    shuffle — Spark proves the children's output partitioning matches
    and elides both Exchanges (see tests/test_cli_and_sinks.py for the
    plan assertion). Pay the shuffle once at ingest, never per query.
    Bucket count should target ~128 MB per bucket-file at full scale.
    """
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a
    plain ``spark.read.parquet(path)`` would LOSE the bucketing and
    reintroduce the join shuffle)."""
    return spark.table(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("source", "shard_id"),
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """Materialize a packed training set as partitioned parquet — the
    write side of ``doc_shard_packing``/``dataset_split_assignment``.

    Layout contract: one directory per (source, shard_id) so a trainer
    streams shards independently and a re-run replaces exactly the
    partitions it recomputes (``partitionOverwriteMode=dynamic`` on a
    real deployment). ``max_records_per_file`` (0 = Spark default)
    bounds file sizes without an extra repartition — the writer splits
    files as it streams, so no shuffle is added to the packing plan.
    At 100 TB this is the same one-pass write: work is proportional to
    data written, partition count is bounded by sources × shards.
    """
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file > 0:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
