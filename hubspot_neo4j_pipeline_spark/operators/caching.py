"""Cache lifecycle for multi-consumer intermediates.

Several operators ``.cache()`` a frame that feeds 2-4 downstream
consumers in the SAME query plan (MinHash signatures, simhash chunks,
LSH buckets, the pair kernel's grouped arrays). The cache is a real
win there — without it the expensive upstream (a 60-vote simhash
aggregation, an n_perms-array signature transform) re-executes once
per consumer, measured 4x wall at sf0.1 — but Spark unpins cached
plans lazily, so a LONG-LIVED session invoking these operators
repeatedly accumulates dead cached blocks until storage eviction.
Batch tools (bench.py, tools/verify_queries.py) compensate with
``spark.catalog.clearCache()`` between queries; library callers
embedding these operators in a service got the leak (r7 ADVICE).

Two remedies, composable:

- every caching operator takes ``no_cache=True`` to skip caching
  entirely (trades bounded recompute for zero storage footprint —
  right for one-shot calls inside an already-cached outer pipeline);
- caches are registered here via ``tracked_cache`` so a caller can
  free exactly the library's caches after materializing results with
  ``release_caches(spark)`` — unlike ``spark.catalog.clearCache()``
  this never touches frames the CALLER cached for its own reasons.

The registry holds weak-by-contract references: ``release_caches``
drains it, and unpersisting an already-unpersisted frame is a no-op,
so double-release (or a tool's clearCache racing it) is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_cache(df: DataFrame, no_cache: bool = False) -> DataFrame:
    """``df.cache()`` registered for later ``release_caches``; with
    ``no_cache=True`` returns ``df`` unchanged (no cache, no entry)."""
    if no_cache:
        return df
    df = df.cache()
    _TRACKED.append(df)
    return df


def release_caches(spark=None) -> int:
    """Unpersist every frame cached through ``tracked_cache`` since
    the last release; returns how many were released. Blocking=False:
    the executors free blocks asynchronously, but the frames leave the
    cache manager immediately, so re-invoking an operator rebuilds a
    fresh cache rather than pinning a stale one. The ``spark`` arg is
    accepted for call-site symmetry with ``catalog.clearCache()`` and
    ignored (each frame knows its own session)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to free
        n += 1
    return n
