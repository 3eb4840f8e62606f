"""Incremental ingestion: streaming micro-batches merged into the
SCD2 graph store.

The reference re-extracts full snapshots per run (main.py); streaming
feeds deliver *partial* batches, so the merge here is UPSERT-only
(new/updated version chains) — soft deletes require full-snapshot
semantics and stay with the batch pipeline (operators/scd2.scd2_merge).

`stream_dedup` is the training-data-pipeline primitive: exact
content-hash dedup over an unbounded stream with bounded state
(dropDuplicatesWithinWatermark evicts keys older than the watermark).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scd2 import snapshot_hash, with_temporal_fields


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on key_cols with watermark-bounded state.

    Batch frames fall back to plain dropDuplicates (same semantics,
    no state needed) — batch output is the oracle for the stream.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def upsert_batch(
    batch: DataFrame, store_path: str, key: str, now: str
) -> None:
    """Merge one (partial) snapshot batch into the SCD2 current table:
    new keys insert; changed keys close the old version into history
    and insert a fresh current row; unchanged keys no-op. No deletes.
    """
    spark = batch.sparkSession
    cur_path = os.path.join(store_path, "current")
    incoming = batch.dropDuplicates([key])
    if not os.path.exists(cur_path):
        with_temporal_fields(incoming, now).write.mode("overwrite").parquet(cur_path)
        return
    current = spark.read.parquet(cur_path)
    inc_hashed = incoming.withColumn("_new_hash", snapshot_hash(incoming))
    live = current.where(F.col("is_current") & ~F.col("is_deleted"))
    # classify against live rows by key
    old = live.select(F.col(key).alias("_k"), F.col("snapshot_hash").alias("_old_hash"))
    joined = inc_hashed.join(old, inc_hashed[key] == old._k, "left")
    changed_keys = joined.where(
        F.col("_old_hash").isNull() | (F.col("_new_hash") != F.col("_old_hash"))
    ).select(F.col(key))
    fresh = with_temporal_fields(
        incoming.join(changed_keys, key, "left_semi"), now
    )
    closing = (
        live.join(changed_keys, key, "left_semi")
        .withColumn("valid_to", F.lit(now).cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    untouched = current.join(changed_keys, key, "left_anti")
    new_current = untouched.unionByName(fresh).localCheckpoint(eager=True)
    history_append = closing.localCheckpoint(eager=True)
    new_current.write.mode("overwrite").parquet(cur_path)
    history_append.write.mode("append").parquet(os.path.join(store_path, "history"))


def run_foreach_batch(
    stream_df: DataFrame,
    sink,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Shared foreachBatch driver (SCD2 upserts, sketch maintainers):
    availableNow trigger, then await completion.

    awaitTermination's boolean result is CHECKED: on timeout the query
    is stopped and a TimeoutError raised — returning silently would
    hand the caller a store missing the tail micro-batches while an
    orphaned query keeps mutating it in the background.
    """
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming query did not drain within {timeout_sec}s; "
            "stopped — the store may be missing tail micro-batches"
        )


def stream_into_store(
    stream_df: DataFrame,
    store_path: str,
    key: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch driver: each micro-batch upserts into the SCD2
    store; batch_id stamps `now` deterministically for tests."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        # deterministic per-batch timestamp (epoch + batch_id minutes)
        now = f"2024-01-01 00:{batch_id:02d}:00"
        upsert_batch(batch, store_path, key, now)

    run_foreach_batch(stream_df, _sink, checkpoint_dir, timeout_sec)


# The exact-substring gram-count store (r8) lives in its own module
# since the r9 incremental rewrite (delta segments + compaction, no
# full-store rewrite per batch); names re-exported for callers that
# import them from here.
from .gram_store import (  # noqa: E402,F401
    gram_store_compact,
    gram_store_last_batch_id,
    gram_store_update_batch,
    read_gram_store,
    score_batch_against_store,
    stream_gram_store,
)
