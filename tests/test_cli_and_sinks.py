"""report.py CLI (via its functions) + Neo4j sink capability gate."""

from __future__ import annotations

import argparse

import pytest

from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
    connector_available,
    edge_write_options,
    node_write_options,
    write_nodes,
)
from hubspot_neo4j_pipeline_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def store(spark, crm_feeds, tmp_path_factory):
    s = str(tmp_path_factory.mktemp("cli_store"))
    run_pipeline(spark, crm_feeds, s, now="2024-03-01 00:00:00")
    return s


def _args(**kw):
    defaults = dict(owner=None, days=30, format="table", output=None, limit=100)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_cli_reports_run_on_store(spark, store):
    import report

    g = report.load_graph(spark, store)
    for t, owner in [
        ("contacts", "Owner"),
        ("all-owners", None),
        ("lifecycle", None),
        ("funnel", None),
        ("campaigns", None),
        ("engaged", None),
    ]:
        df = report.build_report(g, _args(type=t, owner=owner))
        assert df.columns
        df.limit(5).collect()


def test_cli_table_output(spark, store, capsys):
    import report
    from hubspot_neo4j_pipeline_spark.operators import sinks

    g = report.load_graph(spark, store)
    df = report.build_report(g, _args(type="lifecycle"))
    sinks.print_table(df)
    out = capsys.readouterr().out
    assert "lifecycle_stage" in out and "customer" in out


def test_neo4j_sink_gate(spark):
    assert connector_available(spark) is False  # no jar in this env
    df = spark.createDataFrame([("a",)], ["hubspot_id"])
    with pytest.raises(RuntimeError, match="connector not on classpath"):
        write_nodes(df, "neo4j://localhost", "HUBSPOT_Contact")


def test_neo4j_option_construction():
    n = node_write_options("HUBSPOT_Contact")
    assert n["labels"] == ":HUBSPOT_Contact" and n["node.keys"] == "hubspot_id"
    e = edge_write_options("OWNED_BY", "HUBSPOT_Contact", "HUBSPOT_User")
    assert e["relationship"] == "OWNED_BY"
    assert e["relationship.source.node.keys"] == "from_id:hubspot_id"


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    from hubspot_neo4j_pipeline_spark.operators.sinks import (
        read_bucketed,
        write_bucketed,
    )
    from hubspot_neo4j_pipeline_spark.sources.tpch import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", str(tmp_path / "b_orders"), "o_custkey", 8,
    )
    write_bucketed(
        cust.select("c_custkey", "c_name"),
        "b_cust", str(tmp_path / "b_cust"), "c_custkey", 8,
    )
    try:
        bo, bc = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_cust")
        # disable broadcast so the bucket-join path (not BHJ) is exercised
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = with_conf.get("spark.sql.adaptive.enabled")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with_conf.set("spark.sql.adaptive.enabled", "false")
        try:
            joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan  # co-located: both shuffles elided
            n_bucketed = joined.count()
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            with_conf.set("spark.sql.adaptive.enabled", old_aqe)
        n_plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
        assert n_bucketed == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_partitioned_edges_prune_on_read(spark, store, tmp_path):
    # append_edges partitions by rel_type; a rel_type filter must prune
    # partitions at the scan (PartitionFilters), not scan-then-filter
    import pyspark.sql.functions as F

    path = str(tmp_path / "edges")
    edges = spark.createDataFrame(
        [("a", "b", "OWNS"), ("b", "c", "WORKS_AT"), ("c", "d", "OWNS")],
        "src string, dst string, rel_type string",
    )
    edges.write.mode("overwrite").partitionBy("rel_type").parquet(path)
    df = spark.read.parquet(path).where(F.col("rel_type") == "OWNS")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(rel_type" in plan
    assert df.count() == 2


def test_write_training_shards_roundtrip(spark, sf_dir, tmp_path):
    """Shard packing -> partitioned write -> partition-pruned read-back:
    the layout a trainer consumes (one dir per (source, shard_id)),
    with per-shard char mass preserved and a shard filter pruning at
    the scan."""
    import pyspark.sql.functions as F

    from hubspot_neo4j_pipeline_spark.operators.sinks import write_training_shards
    from hubspot_neo4j_pipeline_spark.plans.curation_queries import doc_shard_packing

    packed = doc_shard_packing(spark, sf_dir)
    path = str(tmp_path / "shards")
    write_training_shards(packed, path, max_records_per_file=100)

    back = spark.read.parquet(path)
    assert back.count() == packed.count()
    # partition columns survive the round trip with per-shard mass intact
    expect = {
        (r["source"], r["shard_id"]): r["chars"]
        for r in packed.groupBy("source", "shard_id")
        .agg(F.sum("n_chars").alias("chars"))
        .collect()
    }
    got = {
        (r["source"], r["shard_id"]): r["chars"]
        for r in back.groupBy("source", "shard_id")
        .agg(F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert got == expect
    # a shard predicate prunes partitions at the scan
    one = next(iter(expect))
    df = back.where(
        (F.col("source") == one[0]) & (F.col("shard_id") == one[1])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan
