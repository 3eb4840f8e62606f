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


def test_prune_stale_spares_live_dirs(tmp_path):
    """r7 ADVICE: staleness must key on the NEWEST mtime in the tree.
    A >24h-old appId top-level dir with a fresh query subdir belongs
    to a live (other-app) run and must survive; a tree stale
    throughout goes; the current app's dir survives regardless."""
    import os
    import time

    from hubspot_neo4j_pipeline_spark.plans.sink_queries import _prune_stale

    old = time.time() - 3 * 86400

    def appdir(name, leaf_fresh):
        d = tmp_path / name / "some_query" / "sf0.1"
        d.mkdir(parents=True)
        f = d / "part-0000.parquet"
        f.write_bytes(b"x")
        if not leaf_fresh:
            for p in (f, d, d.parent):
                os.utime(p, (old, old))
        # top-level dir always looks stale (mtime moves only on
        # direct-child adds — the failure mode under test)
        os.utime(tmp_path / name, (old, old))

    appdir("app-live-other", leaf_fresh=True)
    appdir("app-dead", leaf_fresh=False)
    appdir("app-mine-old", leaf_fresh=False)

    _prune_stale(str(tmp_path), keep="app-mine-old")
    survivors = sorted(os.listdir(tmp_path))
    assert survivors == ["app-live-other", "app-mine-old"], survivors
