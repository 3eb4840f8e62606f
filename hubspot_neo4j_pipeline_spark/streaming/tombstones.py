"""Deletion (tombstone) support for the content stores (r13, r12
VERDICT task 6): hash, LSH, cluster, and vector stores can retract
documents without a rebuild — right-to-erasure and eval-set refresh
are routine operations on a production corpus, and until r13
latest-writer-wins could only overwrite, never remove (the reference's
own T4 soft-delete semantics, ``loaders/temporal_loader.py:227-266``,
stopped at the SCD2 store).

Mechanism — one extra delta kind on the unchanged segment layer:

* ``<store>_delete_batch(ids)`` commits a normal atomic delta dir
  whose rows are TOMBSTONES: the store key plus ``_del = true`` (and
  typed-null payload columns where the reader's schema needs them).
  Same batch-id sequence, same replay guard, same crash contract as
  ingest deltas — a delete is just another mutation batch.
* Read/scoring paths honor tombstones by SEQUENCE, never by luck:
  - latest-writer stores (lsh, vector) already order rows by the
    ingest batch id ``_ubid``; a tombstone is simply the newest row
    for its key, so the existing merge window hides the doc, and a
    LATER re-ingest of the same key resurrects it naturally.
  - min-merge stores (hash, cluster) are order-free by design, so
    rows carry no batch id on disk; the reader instead derives each
    frame's sequence position from its PROVENANCE — a delta's dir id,
    a base's ``consumed_through`` at the compaction that wrote it —
    and drops data rows older than their key's newest tombstone
    before the min() merge (``min_merge_with_tombstones``). Replayed
    or out-of-order deltas keep deterministic semantics because the
    sequence comes from committed dir ids, not arrival order.
* Compaction RECLAIMS: the fold applies tombstones, writes only
  surviving rows, and drops the tombstone rows themselves — safe
  because ``consumed_through`` advances past the delete batch, so
  every future delta outranks it and the replay guard keeps
  already-consumed ids out. Deleted bytes physically leave the store
  at the same moment they would have been rewritten anyway.

Cost: zero on stores with no pending deletes — readers check the live
delta schemas (``has_tombstones``, a footer-metadata check on frames
they already opened) and keep the exact pre-r13 plan when none carry
``_del``. With pending deletes, the extra work is one aggregate over
the (usually tiny) tombstone rows plus one equi-join on the store key
— the same shuffle key the merge already uses.

Semantic notes (documented, not hidden): deleting a doc removes ITS
rows. In the hash store the tombstone is keyed by content hash (the
erasure request is "forget this content"), so content known only
through deleted docs stops matching future batches. In the cluster
store the doc's assignment row disappears from every read, but other
members' labels are untouched — a component label is an opaque
cluster id, not a liveness claim, and keeper re-election after
erasing a canonical member is a rebuild-time decision (edges are
append-only facts; see cluster_store.py's retraction note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOMB_COL = "_del"
SEQ_COL = "_sbid"


def has_tombstones(frames: list[DataFrame]) -> bool:
    """True iff any frame carries the tombstone column. Frames are
    already-opened parquet reads, so this is a schema lookup, not I/O."""
    return any(TOMB_COL in f.columns for f in frames)


def with_seq(frame: DataFrame, seq: int) -> DataFrame:
    """Attach the frame's provenance-derived sequence position and a
    normalized ``_del`` (false when the frame predates tombstones).
    ``seq`` is the delta's dir id, or ``consumed_through`` for a base
    — the newest batch whose rows the frame can contain."""
    out = frame.withColumn(SEQ_COL, F.lit(seq).cast("long"))
    if TOMB_COL not in frame.columns:
        out = out.withColumn(TOMB_COL, F.lit(False))
    else:
        out = out.withColumn(TOMB_COL, F.coalesce(F.col(TOMB_COL), F.lit(False)))
    return out


def min_merge_with_tombstones(
    rows: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """The min-merge stores' read rule under deletion: per key, data
    rows at or below the key's newest tombstone sequence are dead;
    min(value) merges the survivors. ``rows`` must carry ``_sbid`` and
    ``_del`` (``with_seq``). Data and tombstone batch ids are distinct
    (each delta is one batch), so strict > is an exact cut. Both
    aggregates and the join share the store-key shuffle, and the
    tombstone side holds only keys someone actually deleted."""
    tombs = (
        rows.where(F.col(TOMB_COL))
        .groupBy(*key_cols)
        .agg(F.max(SEQ_COL).alias("_tomb"))
    )
    live = (
        rows.where(~F.col(TOMB_COL))
        .join(tombs, key_cols, "left")
        .where(F.col("_tomb").isNull() | (F.col(SEQ_COL) > F.col("_tomb")))
    )
    return live.groupBy(*key_cols).agg(F.min(value_col).alias(value_col))


# Broadcast gate for latest_writer_union (r14, r13 VERDICT task 6):
# the anti-join masks are unions of NEWER frames' key sets, and the
# largest one (shading the base) holds every live delta's keys. Under
# the micro-batch store contract that is tiny, but nothing enforced
# it — a bulk-sized delta (mass re-ingest, giant delete) would be
# broadcast-materialized on every executor and the driver. Past this
# many mask rows (longs/strings ~8-40 B each → low hundreds of MB,
# the same order as Spark's 8 GB hard broadcast ceiling with margin)
# the read falls back to the classic per-row window merge: one
# shuffle of the store, which at that delta size is proportional to
# work that must happen anyway.
LATEST_WRITER_BROADCAST_MAX_ROWS = 4_000_000


def _latest_writer_window(
    frames_old_to_new: list[DataFrame], key_col: str
) -> DataFrame:
    """Fallback merge for oversized deltas: newest frame wins per key
    via a per-row window over the frame-sequence position (frame order
    IS batch order — the same rule the broadcast path encodes)."""
    from pyspark.sql import Window

    out = frames_old_to_new[0].withColumn("_fseq", F.lit(0))
    for i, f in enumerate(frames_old_to_new[1:], start=1):
        out = out.unionByName(
            f.withColumn("_fseq", F.lit(i)), allowMissingColumns=True
        )
    w = Window.partitionBy(key_col).orderBy(F.col("_fseq").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_fseq")
    )


def latest_writer_union(
    frames_old_to_new: list[DataFrame],
    key_col: str,
    frame_rows: list[int | None] | None = None,
    max_broadcast_rows: int | None = None,
) -> DataFrame:
    """The latest-writer merge computed WITHOUT shuffling the store
    (r13): every frame of a latest-writer store is unique per key BY
    CONSTRUCTION (_doc_rows/_vec_rows dedup within a batch, compaction
    windows the base, delete deltas are distinct), and all rows of a
    frame share one batch id, so the per-ROW window the read used to
    run is exactly a per-FRAME rule: a newer frame's row shades any
    older frame's row with the same key. That is one broadcast
    anti-join per older frame against the union of newer frames' key
    sets — delta key sets are micro-batch-sized by the store contract,
    and the base (oldest, arbitrarily large) only ever sits on the
    probe side. Merge-on-read becomes a plain pruned scan plus
    broadcast anti-joins: no exchange, no sort, no window barrier —
    at 100 TB the difference between reading the store and reshuffling
    it. Equality with the window merge is pinned by
    test_latest_writer_union_equals_window (incl. re-ingested keys
    and tombstones; tombstone rows shade like any other row and are
    dropped afterwards by ``drop_tombstoned_latest``).

    STORE-FORMAT ASSUMPTION (explicit since r14, r13 ADVICE): the
    per-frame shading rule is only equivalent to the per-row window
    when every frame is unique per key. All stores written since the
    _doc_rows/_vec_rows dedup hold this; a vector store written
    BEFORE intra-batch vec_id dedup existed could carry duplicate ids
    inside one frame, and this merge would return both rows where the
    old window picked one. Scratch stores rebuilt per run are
    unaffected; a long-lived legacy store should be compacted once
    (compaction rewrites the base through the windowed fold) before
    switching reads over. test_latest_writer_store_frames_unique_per_key
    pins the invariant on freshly-written stores.

    ``frame_rows`` (r14, r13 VERDICT task 6): per-frame row counts in
    the same order as ``frames_old_to_new`` (None for unknown),
    sourced from delta manifests / base metadata — no data scan. When
    the NEWER frames' total (the largest anti-join mask) exceeds
    ``max_broadcast_rows``, or any newer frame's count is unknown,
    the merge falls back to the per-row window: broadcasting a
    bulk-sized key set would materialize it on every executor.
    Callers that omit ``frame_rows`` (micro-frame tests) keep the
    broadcast path unconditionally."""
    if len(frames_old_to_new) == 1:
        return frames_old_to_new[0]
    if max_broadcast_rows is None:  # module constant read at call time
        max_broadcast_rows = LATEST_WRITER_BROADCAST_MAX_ROWS
    if frame_rows is not None:
        newer = frame_rows[1:]
        if any(r is None for r in newer) or sum(newer) > max_broadcast_rows:
            return _latest_writer_window(frames_old_to_new, key_col)
    contribs: list[DataFrame] = []
    mask: DataFrame | None = None
    for f in reversed(frames_old_to_new):  # newest first
        contrib = (
            f
            if mask is None
            else f.join(F.broadcast(mask), key_col, "left_anti")
        )
        contribs.append(contrib)
        ids = f.select(key_col)
        mask = ids if mask is None else mask.unionByName(ids)
    out = contribs[0]
    for f in contribs[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def drop_tombstoned_latest(merged: DataFrame) -> DataFrame:
    """The latest-writer stores' filter: after the per-key newest-row
    window, a surviving tombstone means the key's latest state is
    'deleted' — hide it. Frames that never saw a delete lack the
    column; callers union with allowMissingColumns so it reads null."""
    if TOMB_COL not in merged.columns:
        return merged
    return merged.where(~F.coalesce(F.col(TOMB_COL), F.lit(False)))
