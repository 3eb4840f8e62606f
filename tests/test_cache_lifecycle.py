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


def test_cached_session_scope_releases_on_exit(spark, clean_cache):
    """The with-block wrapper (r8 VERDICT task 7): caches built inside
    the scope are freed on exit — including on exceptions — without
    touching caller-owned caches, and nested scopes release only their
    own frames."""
    from hubspot_neo4j_pipeline_spark.operators.caching import cached_session

    mine = spark.range(10).cache()
    mine.count()  # caller-owned cache, must survive the scope
    with cached_session():
        bucket_self_pairs(_buckets(spark), ["bk"], "item").collect()
        assert not _cache_empty(spark)
        with cached_session():
            simhash_near_pairs(_docs(spark), "doc_id", "text").collect()
        # inner scope released its caches; outer's are still pinned
        assert not _cache_empty(spark)
    assert mine.storageLevel.useMemory  # caller cache untouched
    mine.unpersist()
    assert _cache_empty(spark)

    # exception path: release still happens
    with pytest.raises(RuntimeError):
        with cached_session():
            bucket_self_pairs(_buckets(spark), ["bk"], "item").collect()
            raise RuntimeError("boom")
    assert _cache_empty(spark)

    # ambient release_caches must NOT steal an open scope's caches
    with cached_session():
        bucket_self_pairs(_buckets(spark), ["bk"], "item").collect()
        assert release_caches() == 0
        assert not _cache_empty(spark)
    assert _cache_empty(spark)


def test_cached_session_scopes_are_thread_local(spark, clean_cache):
    """r9 ADVICE: the scope stack was process-global, so a thread's
    tracked_cache could land in ANOTHER thread's innermost scope and
    be unpersisted under its feet. Each thread must own its nesting:
    a frame cached on a thread with no open scope goes to the ambient
    registry even while another thread holds a scope open."""
    import threading

    from hubspot_neo4j_pipeline_spark.operators import caching

    df_outer = spark.range(10).select(F.col("id"))
    inner_done = threading.Event()
    release_inner = threading.Event()
    captured: list = []

    def holder():
        with caching.cached_session():
            captured.append(caching.tracked_cache(spark.range(5)))
            captured[-1].count()
            inner_done.set()
            release_inner.wait(timeout=30)

    t = threading.Thread(target=holder)
    t.start()
    assert inner_done.wait(timeout=30)
    # main thread has NO open scope: its cache must be ambient, not
    # captured by the other thread's live scope
    cached = caching.tracked_cache(df_outer)
    cached.count()
    assert cached.storageLevel.useMemory
    with caching._LOCK:
        assert any(f is cached for f in caching._TRACKED)
    release_inner.set()
    t.join(timeout=30)
    # the holder thread's scope exit released ITS frame only
    assert not captured[0].storageLevel.useMemory
    assert cached.storageLevel.useMemory
    assert caching.release_caches() == 1
    assert not cached.storageLevel.useMemory
