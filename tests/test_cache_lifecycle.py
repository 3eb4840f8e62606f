"""Cache lifecycle (r7 ADVICE): the multi-consumer caches inside the
pair kernels must be releasable by long-lived library sessions — via
``no_cache=True`` (never cached at all) or
``operators.caching.release_caches()`` (freed after materializing).
Batch tools clearCache between queries; these tests pin the contract
for everyone else.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.caching import (
    release_caches,
    tracked_cache,
)
from hubspot_neo4j_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from hubspot_neo4j_pipeline_spark.operators.skew import bucket_self_pairs


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def clean_cache(spark):
    spark.catalog.clearCache()
    release_caches()
    assert _cache_empty(spark)
    yield
    spark.catalog.clearCache()
    release_caches()


def _docs(spark):
    rows = [
        (i, f"the quick brown fox jumps over lazy dog number {i % 7}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _buckets(spark):
    return spark.range(60).select(
        (F.col("id") % 5).alias("bk"), F.col("id").alias("item")
    )


def test_no_cache_leaves_storage_at_baseline(spark, clean_cache):
    """N invocations with no_cache=True must leave the cache manager
    empty — the long-session leak the flag exists to close."""
    for _ in range(3):
        bucket_self_pairs(_buckets(spark), ["bk"], "item", no_cache=True).count()
        minhash_lsh_pairs(
            _docs(spark), "doc_id", "text", no_cache=True
        ).count()
        simhash_near_pairs(
            _docs(spark), "doc_id", "text", hot_chunk_df=4, no_cache=True
        ).count()
    assert _cache_empty(spark), "no_cache=True still left cached plans behind"
    assert release_caches() == 0, "no_cache=True registered frames for release"


def test_release_caches_frees_default_mode_caches(spark, clean_cache):
    """Default (caching) mode populates the cache manager; one
    release_caches() call returns it to baseline without touching
    caller-owned caches."""
    mine = spark.range(100).selectExpr("id", "id * 3 as y").cache()
    mine.count()
    n_runs = 3
    for _ in range(n_runs):
        bucket_self_pairs(_buckets(spark), ["bk"], "item").count()
        minhash_lsh_pairs(_docs(spark), "doc_id", "text").count()
    assert not _cache_empty(spark)
    released = release_caches()
    # per run: the explicit kernel's grouped cache + minhash's
    # signature cache + minhash's internal kernel grouped cache
    assert released == 3 * n_runs
    assert not _cache_empty(spark), "release_caches dropped a caller-owned cache"
    mine.unpersist()
    assert _cache_empty(spark)


def test_no_cache_output_identical(spark, clean_cache):
    """The flag is a lifecycle knob, not a semantics knob."""
    cached = sorted(
        minhash_lsh_pairs(_docs(spark), "doc_id", "text").collect()
    )
    release_caches()
    uncached = sorted(
        minhash_lsh_pairs(_docs(spark), "doc_id", "text", no_cache=True).collect()
    )
    assert cached == uncached


def test_tracked_cache_double_release_is_safe(spark, clean_cache):
    df = tracked_cache(spark.range(10).selectExpr("id", "id + 1 as z"))
    df.count()
    assert release_caches() == 1
    assert release_caches() == 0
    assert _cache_empty(spark)
