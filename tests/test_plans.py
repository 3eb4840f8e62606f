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


def test_rollup_single_shuffle(spark, sf_dir):
    # ROLLUP expands grouping sets map-side: exactly one agg exchange
    # (plus the broadcast for the nation dim), never one pass per set.
    plan = _plan(spark, sf_dir, "sales_rollup")
    assert "Expand" in plan
    assert "BroadcastHashJoin" in plan
    agg_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(agg_exchanges) <= 2  # join key + grouping-set agg


def test_pivot_is_one_pass(spark, sf_dir):
    # conditional aggregates: one scan, one shuffle, no per-status jobs
    plan = _plan(spark, sf_dir, "priority_status_pivot")
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Union" not in plan  # not one pass per pivot value
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_q3_shape_pushdown_and_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "shipping_priority")
    assert "TakeOrderedAndProject" in plan
    # the segment filter must reach the customer parquet scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_share_window_runs_on_aggregated_input(spark, sf_dir):
    # aggregate-then-window: the Window must sit above the final
    # HashAggregate (per-supplier partials), not above the raw scan
    plan = _plan(spark, sf_dir, "supplier_share_of_nation")
    lines = plan.splitlines()
    win = min(i for i, l in enumerate(lines) if "Window" in l)
    agg = min(i for i, l in enumerate(lines) if "HashAggregate" in l)
    assert win < agg  # formatted plans list consumers before producers


def test_shard_packing_no_global_sort(spark, sf_dir):
    # the prefix sum partitions by source — a global single-partition
    # Exchange would be the 100 TB killer
    plan = _plan(spark, sf_dir, "doc_shard_packing")
    assert "SinglePartition" not in plan


def test_decontaminate_joins_on_gram_hash(spark, sf_dir):
    plan = _plan(spark, sf_dir, "doc_decontaminate")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
