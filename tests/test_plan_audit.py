"""Plan-shape regression gate over the ENTIRE query registry.

The per-query perf story (PERF.md) rests on structural properties of
the physical plans, not on timings; this test pins them so a future
edit can't silently reintroduce a scale-killer:

- no CartesianProduct / unbounded BroadcastNestedLoopJoin anywhere
  except the documented bounded-broadcast sites;
- constant-size dimension joins broadcast (never shuffle both sides);
- parquet range filters reach the scan (PushedFilters) for the
  representative temporal queries after the inferTimestampNTZ change.

Plans are built at sf0.001 — plan shape does not depend on SF for
these checks (AQE may coalesce at runtime, but the static strategy,
join types, and pushdown are visible pre-execution).
"""

from __future__ import annotations

import pytest

from hubspot_neo4j_pipeline_spark.plans import get_queries

SF_DIR = "/root/testdata/sf0.001"

# BroadcastNestedLoopJoin appears only where the broadcast side is a
# bounded constant (documented in VERDICT r2 / PERF.md): the 1-row
# "now" anchor, the <=32-row hyperplane/seed tables, and the bounded
# ANN query sets.
BNLJ_ALLOWED = {
    "recent_activity",  # 1-row max-ts anchor
    "recent_changes",  # 1-row max-ts anchor
    "shipping_priority",  # 1-row anchor
    "ann_bruteforce_topk",  # bounded query set (oracle twin)
    "ann_hard_negatives",  # bounded query set (contrastive mining)
    "ann_quantized_topk",  # bounded query set (quantized scale path)
    "ann_lsh_topk",  # hyperplane table <= 32 rows
    "ann_ivf_topk",  # 25 seed centroids
    "ann_ivf_topk_trained",  # <=10 trained centroids (seed + assign broadcasts)
    "ivf_assignment",  # 25 seed centroids
    "semantic_dedup",  # <=10 seed centroids (ivf_assign broadcast)
    "semantic_dedup_slice",  # same bounded seed broadcast (sliced variant)
    "embedding_near_dup_pairs_slice",  # plane table (sliced variant)
    "source_length_drift",  # bounded grid: sources x length-buckets + 1-row total
    "cluster_balanced_sample",  # <=10 seed centroids (ivf_assign broadcast)
    "embedding_near_dup_pairs",  # plane table
    "vector_norms",
    "embedding_centroids",
    "multimodal_features",
    "stratified_doc_sample",  # per-source count frame (bounded)
    "order_value_median",  # 3-row quantile frame
    "edge_endpoint_validation",  # two scalar count frames joined (1 row each)
    "repeat_buyers_intersect",  # 1-row data-derived mid-date anchor
    "doc_tfidf_top_terms",  # 1-row corpus doc-count frame
    "incremental_tfidf_topk",  # 1-row (store + batch) doc-count frame
    "source_mixture_sample",  # 1-row global-min char-mass target
    "source_temperature_weights",  # 1-row global-max char-mass anchor
    "corpus_kmv_sketch",  # 1-row merged-sketch (kth-min) frame
    "dedup_method_agreement",  # three 1-row count frames joined
    "dedup_method_agreement_slice",  # same three 1-row count frames (r11)
    "fuzzy_name_pairs",  # 1-row corpus-lcp frame (prefix strip, r8)
    "incremental_window_counts",  # 1-row store max-day anchor (r11)
    "incremental_ann_topk",  # 1-row pinned-planes frame (r11 vector store)
}


def _plan(spark, name, fn) -> str:
    return fn(spark, SF_DIR)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in get_queries().items():
        out[name] = _plan(spark, name, fn)
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"cartesian products in: {offenders}"


def test_nested_loop_joins_only_at_bounded_sites(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == [], (
        f"unexpected BroadcastNestedLoopJoin in: {offenders}; if the "
        "broadcast side is a bounded constant, document it in BNLJ_ALLOWED"
    )


def test_constant_dims_broadcast(plans):
    """nation/region joins must be broadcast, never a shuffle join."""
    for name in ("deals_by_company", "edge_match_resolution", "regional_supplier_volume"):
        assert "BroadcastHashJoin" in plans[name], f"{name} lost its broadcast join"


def test_temporal_range_filters_reach_the_scan(plans):
    """After inferTimestampNTZ=false the o_orderdate/l_shipdate range
    predicates must appear in PushedFilters, not just post-scan."""
    for name, col in (
        ("change_classification", "o_orderdate"),
        ("relationship_diff", "l_shipdate"),
        ("soft_delete_candidates", "o_orderdate"),
    ):
        pushed = [
            ln for ln in plans[name].splitlines() if "PushedFilters" in ln and col in ln
        ]
        assert pushed, f"{name}: no pushed filter on {col}"


def test_scans_prune_columns(plans):
    """The flagship roll-up must not read the wide orders schema."""
    read = [ln for ln in plans["deals_by_company"].splitlines() if "ReadSchema" in ln]
    assert read, "no ReadSchema lines found"
    for ln in read:
        assert "o_comment" not in ln, "unpruned orders scan reads o_comment"


def test_rank_limit_samples_get_window_group_limit(plans):
    """The cap-per-group samplers advertise WindowGroupLimit pushdown
    (rank filter applied map-side before the window shuffle) — pin it
    so a query edit or Spark upgrade can't silently lose the rewrite."""
    for name in ("cluster_balanced_sample", "stratified_doc_sample"):
        assert "WindowGroupLimit" in plans[name], (
            f"{name}: rank-limit window lost its WindowGroupLimit rewrite"
        )


def test_latest_writer_store_reads_do_not_shuffle(spark, tmp_path_factory):
    """r13: the latest-writer stores' merge-on-read is broadcast
    anti-joins against the (micro-batch-sized) newer key sets — at
    100 TB the difference between READING the store and RESHUFFLING
    it. Pin the physical shape: a multi-frame read (compacted base +
    live deltas) must contain no shuffle Exchange, no Sort, and no
    Window — only BroadcastExchange of the delta key sets."""
    from hubspot_neo4j_pipeline_spark.plans.core_queries import load_table
    from hubspot_neo4j_pipeline_spark.streaming.lsh_store import (
        lsh_store_update_batch,
        read_lsh_store,
    )
    from hubspot_neo4j_pipeline_spark.streaming.vector_store import (
        read_vector_store,
        vector_store_update_batch,
    )

    root = str(tmp_path_factory.mktemp("noshuffle"))
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for k in range(3):  # compaction at 2, so: base + one live delta
        lsh_store_update_batch(
            docs.where(f"doc_id % 3 = {k}"), root + "/lsh", batch_id=k,
            compact_every=2,
        )
    emb = load_table(spark, SF_DIR, "embeddings")
    for k in range(3):
        vector_store_update_batch(
            emb.where(f"vec_id % 3 = {k}"), root + "/vec", batch_id=k,
            compact_every=2,
        )
    for reader, store in (
        (read_lsh_store, root + "/lsh"),
        (read_vector_store, root + "/vec"),
    ):
        plan = (
            reader(spark, store)._jdf.queryExecution().executedPlan().toString()
        )
        bad = [
            ln.strip()[:100]
            for ln in plan.splitlines()
            if ("Exchange" in ln and "BroadcastExchange" not in ln)
            or "Window" in ln
            or ln.strip().startswith("Sort")
        ]
        assert bad == [], f"store read at {store} shuffles: {bad}"
