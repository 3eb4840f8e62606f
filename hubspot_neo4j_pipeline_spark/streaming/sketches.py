"""Streaming sketch maintenance: a count-min grid kept current by
foreachBatch merges.

Because the CMS grid is additive (operators/sketches.cms_merge), the
streaming path needs no custom state store: each micro-batch builds
its partial grid and cell-wise-sums it into the persisted one. The
persisted state is the DEPTH x WIDTH counter grid — a fixed few KB no
matter how much text has streamed past, which is exactly why a 100 TB
ingest keeps a frequency sketch instead of a term->count table. The
stream ≡ batch test (tests/test_streaming.py) asserts the streamed
grid is IDENTICAL to the one a single batch pass builds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.sketches import cms_grid, cms_merge


def cms_update_batch(batch_docs: DataFrame, store_path: str) -> None:
    """Merge one micro-batch's partial grid into the persisted grid.

    localCheckpoint materializes the merged grid before the overwrite
    (same read-then-overwrite discipline as incremental.upsert_batch).
    """
    spark = batch_docs.sparkSession
    partial = cms_grid(batch_docs)
    if os.path.exists(store_path):
        existing = spark.read.parquet(store_path)
        merged = cms_merge(existing, partial)
    else:
        merged = partial
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(store_path)


def stream_cms_into_store(
    stream_df: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch driver: maintain the corpus CMS grid incrementally
    as documents stream in."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        cms_update_batch(batch, store_path)

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def kmv_update_batch(
    batch_docs: DataFrame, store_path: str, k: int | None = None
) -> None:
    """Merge one micro-batch's k-min set into the persisted KMV sketch."""
    from ..operators.sketches import KMV_K, kmv_kmin, kmv_merge

    k = k or KMV_K
    spark = batch_docs.sparkSession
    partial = kmv_kmin(batch_docs, k)
    if os.path.exists(store_path):
        existing = spark.read.parquet(store_path)
        merged = kmv_merge(k, existing, partial)
    else:
        merged = partial
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(store_path)


def stream_kmv_into_store(
    stream_df: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch driver: maintain the corpus cardinality sketch
    incrementally — the state is <= k hash values however much text
    has streamed past."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        kmv_update_batch(batch, store_path)

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
