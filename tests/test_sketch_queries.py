"""Structural properties of the sketch / chunking / mixture-weight
queries that the oracle compare can't express:

- the KMV estimate is a REAL estimate (bounded relative error vs the
  exact count, ~1/sqrt(k));
- the merged '__all__' sketch equals the sketch built directly from the
  full distinct set (mergeability identity — the scale argument);
- chunk windows tile every token with the documented size/stride;
- temperature weights monotonically boost smaller sources.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.plans import QUERIES
from hubspot_neo4j_pipeline_spark.plans.sketch_queries import (
    KMV_K,
    _SHINGLE_HASH_SPARK,
)
from hubspot_neo4j_pipeline_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_kmv_estimate_error_bound(spark):
    rows = {
        r["source"]: r
        for r in QUERIES["corpus_kmv_sketch"].spark(spark, SF_DIR).collect()
    }
    assert "__all__" in rows and len(rows) == 21
    for src, r in rows.items():
        exact, est = r["exact_distinct"], r["kmv_estimate"]
        assert exact > 0
        if exact <= KMV_K:
            # sketch holds the whole set — estimate must be exact
            assert est == exact, (src, est, exact)
        else:
            # KMV standard error is ~1/sqrt(k) ≈ 12.5% at k=64; allow 4σ
            assert abs(est - exact) / exact < 0.5, (src, est, exact)


def test_kmv_merge_equals_direct_global_sketch(spark):
    """The '__all__' row is built by merging per-source sketches; it
    must equal the sketch computed directly over the global distinct
    hash set (i.e. merging loses nothing)."""
    docs = load_table(spark, SF_DIR, "documents")
    all_h = (
        docs.select(F.expr(_SHINGLE_HASH_SPARK).alias("h")).distinct()
    )
    direct = (
        all_h.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
        .collect()[0]
    )
    merged = {
        r["source"]: r
        for r in QUERIES["corpus_kmv_sketch"].spark(spark, SF_DIR).collect()
    }["__all__"]
    if direct["n"] >= KMV_K:
        assert merged["kth_min"] == direct["kth"]
    assert merged["exact_distinct"] == all_h.count()


def test_chunks_tile_documents(spark):
    from hubspot_neo4j_pipeline_spark.plans.curation_queries import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    chunks = QUERIES["doc_chunk_split"].spark(spark, SF_DIR)
    joined = chunks.join(docs, "doc_id")
    bad = joined.where(
        (F.col("chunk_start") != F.col("chunk_idx") * CHUNK_STRIDE + 1)
        | (F.col("chunk_len") <= 0)
        | (F.col("chunk_len") > CHUNK_TOKENS)
        | (F.col("chunk_start") + F.col("chunk_len") - 1 > F.col("n_tokens"))
    ).count()
    assert bad == 0
    # the last chunk of every doc must reach the final token
    last = (
        joined.groupBy("doc_id", "n_tokens")
        .agg(F.max(F.col("chunk_start") + F.col("chunk_len") - 1).alias("covered"))
        .where(F.col("covered") != F.col("n_tokens"))
        .count()
    )
    assert last == 0
    # short docs yield exactly one chunk
    one = (
        joined.where(F.col("n_tokens") <= CHUNK_TOKENS)
        .groupBy("doc_id")
        .count()
        .where(F.col("count") != 1)
        .count()
    )
    assert one == 0


def test_temperature_boost_monotone(spark):
    rows = QUERIES["source_temperature_weights"].spark(spark, SF_DIR).collect()
    assert len(rows) == 20
    by_mass = sorted(rows, key=lambda r: r["total_chars"])
    # boost >= 1 everywhere (sqrt lifts everything below the max source)
    assert all(r["boost"] >= 1.0 for r in rows)
    # smaller source => greater-or-equal boost
    boosts = [r["boost"] for r in by_mass]
    assert boosts == sorted(boosts, reverse=True)
    # the largest source is the fixed point: weight == mass == 1
    top = by_mass[-1]
    assert top["rel_mass"] == 1.0 and top["rel_weight"] == 1.0


def test_source_overlap_matrix_shape(spark):
    rows = QUERIES["source_overlap_matrix"].spark(spark, SF_DIR).collect()
    # upper-triangle only, jaccard in (0, 1], overlap bounded by sizes
    assert 0 < len(rows) <= 20 * 19 // 2
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0 < r["shared_shingles"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0


def test_cms_never_undercounts_and_is_tight_at_this_scale(spark):
    rows = QUERIES["term_cms_sketch"].spark(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        # CMS property: estimate >= true count, always
        assert r["overcount"] >= 0
        assert r["cms_estimate"] == r["exact_freq"] + r["overcount"]
    # with |vocab| << depth*width the sketch should be nearly exact for
    # head terms: at least half the probes collide with nothing heavier
    tight = sum(1 for r in rows if r["overcount"] <= r["exact_freq"])
    assert tight >= 5
