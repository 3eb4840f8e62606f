"""Approximate-aggregate scale path: at 100 TB the exact median /
count(DISTINCT) queries swap to approx_percentile / approx_count_distinct
(documented in their docstrings). These tests pin the error bounds that
make that swap safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.sources.tpch import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    # HLL++ at rsd=0.02: allow 3 standard errors
    assert abs(row.approx - row.exact) <= 0.06 * row.exact


def test_approx_percentile_brackets_exact_median(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    per_status = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
            F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        )
        .collect()
    )
    for r in per_status:
        # accuracy=10000 → rank error ≤ n/10000; totalprice spread makes
        # 2% a generous value-space bound at every SF the driver uses
        assert abs(r.approx - r.exact) <= 0.02 * r.exact, r


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    """int8 quantization must preserve neighbor quality: per query,
    >=8 of the exact float top-10 appear in the quantized top-10."""
    from hubspot_neo4j_pipeline_spark.plans.vector_queries import (
        ann_bruteforce_topk,
        ann_quantized_topk,
    )

    exact = ann_bruteforce_topk(spark, sf_dir).collect()
    quant = ann_quantized_topk(spark, sf_dir).collect()
    by_q_exact: dict[int, set[int]] = {}
    by_q_quant: dict[int, set[int]] = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        by_q_quant.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(by_q_exact) == set(by_q_quant)
    for q, exact_ids in by_q_exact.items():
        overlap = len(exact_ids & by_q_quant[q])
        assert overlap >= 8, f"query {q}: only {overlap}/10 quantized recall"
