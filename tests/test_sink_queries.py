"""Sink round-trip queries: partition pruning + MERGE idempotency.

The value correctness of both queries is oracle-checked by
tools/verify_queries.py (full DuckDB oracles); these tests pin the
structural claims the oracles can't see — the read-back scan actually
PRUNES to one shard's partitions, and the upsert store holds exactly
one row per key after a duplicate-key double upsert.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.plans.sink_queries import (
    _scratch,
    shard_write_roundtrip,
    upsert_idempotency_roundtrip,
)


def test_shard_readback_prunes_partitions(spark, sf_dir):
    shard_write_roundtrip(spark, sf_dir).collect()  # materialize the store
    back = spark.read.parquet(_scratch(spark, "shard_write_roundtrip", sf_dir)).where(
        F.col("shard_id") == 3
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "shard filter not applied at partition level"
    # pruned scan actually reads only shard 3 directories
    files = [
        r.f for r in back.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all("shard_id=3" in f for f in files)


def test_shard_write_is_idempotent(spark, sf_dir):
    a = {tuple(r) for r in shard_write_roundtrip(spark, sf_dir).collect()}
    b = {tuple(r) for r in shard_write_roundtrip(spark, sf_dir).collect()}
    assert a == b and a


def test_upsert_collapses_duplicate_keys(spark, sf_dir):
    rows = upsert_idempotency_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_nodes == r.n_keys, f"duplicate keys survived in {r.c_mktsegment}"
    # store-level check: exactly one row per key despite the doubled feed
    back = spark.read.parquet(_scratch(spark, "upsert_idempotency_roundtrip", sf_dir))
    total = back.count()
    assert total == back.select("c_custkey").distinct().count()
