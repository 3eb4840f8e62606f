"""Results must not depend on the cluster's parallelism.

The determinism contract (plans/registry.py) claims every query is
exact regardless of partition/summation order — decimal money sums,
in-order double folds, tie-broken orderings, hash-threshold sampling.
This test executes the claim: a representative query from each
order-sensitive family runs under different shuffle-partition counts
and must produce IDENTICAL rows. On a real cluster this is the
difference between a reproducible pipeline and one whose outputs
drift with autoscaling.
"""

from __future__ import annotations

import pytest

from hubspot_neo4j_pipeline_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# one per risk family: windowed prefix sums, decimal aggregation,
# double folds (vector math), order statistics (sketch), top-k with
# tie-breakers, minhash banding, iterative connected components
CASES = [
    "doc_shard_packing",
    "pricing_summary",
    "ann_bruteforce_topk",
    "corpus_kmv_sketch",
    "top_deals_by_value",
    "doc_minhash_lsh_pairs",
    "doc_dedup_keeplist",
    "user_value_trend",
    "curation_funnel",
    "term_cms_sketch",
    "source_overlap_matrix",
    # island-window span merge over per-doc positions (r8)
    "doc_dup_spans",
]


def _rows(spark, name):
    df = QUERIES[name].spark(spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_parallelism(spark, name):
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "1")
        serial = _rows(spark, name)
        spark.conf.set(key, "13")
        wide = _rows(spark, name)
    finally:
        spark.conf.set(key, orig)
    assert serial == wide, f"{name}: rows differ between 1 and 13 partitions"
