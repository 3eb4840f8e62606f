"""Physical-plan regression tests: the optimizations PERF.md documents
must actually appear in the plans (pushdown reaching parquet scans,
broadcast joins on dims, semi/anti joins for EXISTS, top-k via
TakeOrderedAndProject, partial aggregation before exchange)."""

from __future__ import annotations

import pytest

from hubspot_neo4j_pipeline_spark.plans import get_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = get_queries()[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_flagship_topk_and_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "deals_by_company")
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "json_event_projection")
    assert "In(event_type, [click,view])" in plan  # predicate at the parquet scan
    # column pruning: scan must not read value/user_id/ts
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "value" not in scan_schema and "user_id" not in scan_schema


def test_exists_compiles_to_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "engaged_contacts")
    assert "LeftSemi" in plan


def test_not_exists_compiles_to_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "contacts_without_company")
    assert "LeftAnti" in plan


def test_partial_aggregation_before_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # partial + final HashAggregate around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("recent_activity", "two_hop_traversal", "contacts_by_owner"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name  # dims must not shuffle-join
