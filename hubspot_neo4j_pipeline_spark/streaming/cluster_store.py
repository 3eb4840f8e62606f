"""Incremental duplicate-CLUSTER maintenance: connected-component
assignments kept current as near-dup PAIRS stream in.

The LSH store (streaming/lsh_store.py) closes pair DETECTION against
the full ingested history; what a production dedup pipeline actually
consumes is the cluster verdict per document — which cluster am I in,
and am I its canonical keeper. One-shot, that is
``operators/graph.dedup_clusters`` (hash-min CC over the pair set);
this module maintains the SAME assignment table incrementally, so a
micro-batch of new pairs never re-clusters the corpus.

Key invariant (what makes an exact oracle possible): if micro-batches
partition the corpus and each batch's pairs are computed against
(history ∪ batch) restricted to pairs touching the batch — exactly
``neardup_pairs_against_store``'s contract — then the UNION of those
per-batch pair sets is the one-shot operator's full pair set: every
pair (a, b) surfaces in the batch of its later-ingested member. So
after ingesting every batch, the store's assignments must equal
one-shot CC over ``minhash_lsh_pairs`` of the whole corpus — pinned by
test AND by the registered oracle ``incremental_dup_clusters``
(DuckDB recursive-CTE transitive closure).

Incremental step (the contraction argument): a stored component with
label c = min member id is connectivity-equivalent to the single
vertex c, so new edges are CONDENSED — each endpoint replaced by its
current label — before any clustering runs. The condensed graph's
nodes are component labels and never-assigned batch vertices; its
size is O(batch pairs), independent of component sizes. Components
containing no endpoint of a new pair cannot change. Connectivity over
the condensed graph yields an (old label → new label) map; applying
it is one equi-join against the assignment table (relabeling exactly
the touched components' members) plus the map's never-assigned rows.
Labels stay min member ids because every condensed node IS a min
(or an unassigned vertex id). Because edges are only ever ADDED, a
vertex's label is monotonically non-increasing over time, so the
store merges on read with an idempotent, order-free ``min(comp) per
doc_id`` — the hash store's rule — and replays, out-of-order deltas,
or a guard bypass cannot corrupt an assignment. (Edge RETRACTION — a
doc re-ingested with dissimilar text — is out of scope: near-dup
edges in a training-data pipeline are append-only facts about
observed content; a corpus rebuild is the retraction path. DOC
deletion is different and supported since r13:
``cluster_store_delete_batch`` tombstones a doc's assignment row —
it stops appearing in reads/verdicts and compaction reclaims it —
while other members' labels stay, as opaque cluster ids; see
streaming/tombstones.py.)

Connectivity solve: micro-batches condense to a few thousand edges at
most in any realistic trigger interval, so the default solve is a
driver-side union-find over one bounded collect (≤
``driver_cc_max_edges`` condensed edges — the same bounded-collect
class as the 32-row bucket manifests); a batch that exceeds the bound
falls back to the distributed hash-min CC kernel
(``operators/graph.connected_components``) over the SAME condensed
graph, so the scale path is never a correctness fork (pinned by a
test that forces the bound to 0 and compares).

Scale (100 TB): the store holds one slim (doc_id, comp) row per
PAIRED document — duplicates only, typically a small fraction of the
corpus, two orderable columns wide. Per batch: one scan of that slim
table (the condensation join), a connectivity solve over O(batch
pairs) condensed edges, and one O(batch + touched members) atomic
delta — never O(corpus). The expensive upstream (the LSH scoring
plan feeding ``pairs``) is executed exactly ONCE per batch: the
condensation consumes it a single time and everything downstream
works off the collected/condensed map. Compactions are bucket-partial
with r11 adaptive bucket growth (segments.py contract, shared with
the five sibling stores).

Reference parity: the reference has no streaming surface; this is the
streaming closure of its dedup step's cluster form (SURVEY §2 D1/D3),
with ``operators/graph.connected_components`` as the kernel and the
recursive-CTE oracle of ``doc_dup_clusters`` as the ground-truth
model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import segments

CLUSTER_STORE_BUCKETS = 32
COMPACT_EVERY = 8


def _bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_buckets)).cast(
        "int"
    )


def _assign_frames(
    spark: SparkSession,
    store_path: str,
    meta: dict,
    deltas: dict[int, str],
    buckets: list[int] | None = None,
) -> list[tuple[int, DataFrame]]:
    """Raw (sequence, frame) pairs — base at its compaction's
    ``consumed_through``, each live delta at its dir id — the
    provenance sequence tombstone resolution orders by (the hash
    store's `_hash_frames` rule; streaming/tombstones.py)."""
    frames: list[tuple[int, DataFrame]] = []
    if meta["base"]:
        f = spark.read.parquet(os.path.join(store_path, meta["base"]))
        if buckets is not None:
            f = f.where(F.col("_bucket").isin(buckets))
        frames.append((meta["consumed_through"], f))
    for bid, path in sorted(deltas.items()):
        frames.append((bid, spark.read.parquet(path)))
    return frames


def _merged_assignments(frames: list[tuple[int, DataFrame]]) -> DataFrame | None:
    """(doc_id, comp) visible state: plain min-merge when no live
    delta carries tombstones (exact pre-r13 plan), the sequence-aware
    merge otherwise. None when only tombstone deltas exist."""
    from . import tombstones

    raw = [f for _seq, f in frames]
    if not any("comp" in f.columns for f in raw):
        return None
    if not tombstones.has_tombstones(raw):
        cols = [f.select("doc_id", "comp") for f in raw]
        if len(cols) == 1:
            return cols[0]
        out = cols[0]
        for f in cols[1:]:
            out = out.unionByName(f)
        return out.groupBy("doc_id").agg(F.min("comp").alias("comp"))
    seqd = []
    for seq, f in frames:
        keep = [c for c in ("doc_id", "comp", tombstones.TOMB_COL)
                if c in f.columns]
        seqd.append(tombstones.with_seq(f.select(*keep), seq))
    out = seqd[0]
    for f in seqd[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return tombstones.min_merge_with_tombstones(out, ["doc_id"], "comp")


def read_cluster_assignments(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, comp = min doc id reachable over every pair ever
    ingested). Merge-on-read is min(comp) per doc_id — idempotent and
    order-free because labels only decrease (see module docstring) —
    switching to the sequence-aware rule while tombstone deltas are
    pending (``cluster_store_delete_batch``). Only PAIRED docs have
    rows; singletons are their own cluster by definition and never
    need storage."""
    meta = segments.read_meta(store_path)
    frames = _assign_frames(
        spark, store_path, meta, segments.live_deltas(store_path, meta)
    )
    merged = _merged_assignments(frames) if frames else None
    if merged is None:
        raise FileNotFoundError(f"empty cluster store at {store_path}")
    return merged


def _driver_union_find(edge_rows: list) -> dict:
    """Min-label union-find over a bounded, collected condensed edge
    list — deterministic (root = minimum node id, matching hash-min CC
    and the recursive-CTE oracle). Implementation shared with the
    one-shot ``operators/graph.components_min_label`` since r15."""
    from ..operators.graph import min_label_union_find

    return min_label_union_find(edge_rows)


class PendingFold:
    """Handle between ``cluster_store_condense_batch`` and
    ``cluster_store_commit_condensed`` (r15, guide §2.6): after the
    condense step the batch's upstream ``pairs`` plan has been fully
    EXECUTED into an eager localCheckpoint, so nothing the commit step
    does still references the pair source's files. A caller may
    therefore overlap the commit with work that mutates OTHER stores —
    in particular the LSH ingest/compaction of the same micro-batch,
    the hazard that blocked whole-step overlap in r14 (an LSH
    compaction sweeping delta dirs a mid-flight pairs plan still
    read). The commit touches only ``store_path``."""

    __slots__ = (
        "spark",
        "store_path",
        "batch_id",
        "compact_every",
        "n_buckets",
        "id_type",
        "assign",
        "cond",
        "driver_cc_max_edges",
        "noop",
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw.get(k))


def cluster_store_update_batch(
    pairs: DataFrame,
    store_path: str,
    batch_id: int | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    compact_every: int = COMPACT_EVERY,
    n_buckets: int = CLUSTER_STORE_BUCKETS,
    driver_cc_max_edges: int = 200_000,
) -> None:
    """Fold one micro-batch of near-dup PAIRS into the assignment
    table: condense each pair endpoint to its current component label,
    solve connectivity over the condensed graph (driver union-find
    when it is small — the normal case; distributed hash-min CC past
    ``driver_cc_max_edges``), and commit the relabeled rows as one
    atomic delta. O(touched members + batch) — untouched components'
    rows are never rewritten (pinned by test), and the expensive
    upstream plan feeding ``pairs`` executes exactly once. Same
    replay / crash / compaction contract as the sibling stores
    (segments.py); min-merge additionally makes even a replay-guard
    bypass harmless.

    Implemented as condense-then-commit (r15): this convenience
    wrapper is exactly ``cluster_store_commit_condensed(
    cluster_store_condense_batch(...))`` — callers that want to
    overlap the commit with independent other-store work call the two
    phases themselves (state parity pinned by
    ``test_forked_fold_state_equals_sequential``)."""
    cluster_store_commit_condensed(
        cluster_store_condense_batch(
            pairs,
            store_path,
            batch_id=batch_id,
            id_a=id_a,
            id_b=id_b,
            compact_every=compact_every,
            n_buckets=n_buckets,
            driver_cc_max_edges=driver_cc_max_edges,
        )
    )


def cluster_store_condense_batch(
    pairs: DataFrame,
    store_path: str,
    batch_id: int | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    compact_every: int = COMPACT_EVERY,
    n_buckets: int = CLUSTER_STORE_BUCKETS,
    driver_cc_max_edges: int = 200_000,
) -> PendingFold:
    """Phase 1 of the fold: replay guard, meta pins, endpoint
    condensation against the current assignments, and the ONE eager
    execution of the upstream ``pairs`` plan into a localCheckpoint.
    Returns the handle ``cluster_store_commit_condensed`` finishes;
    see ``PendingFold`` for what may safely overlap the commit."""
    spark = pairs.sparkSession
    os.makedirs(store_path, exist_ok=True)
    if batch_id is None:
        batch_id = segments.next_batch_id(store_path)
    elif segments.already_ingested(store_path, batch_id):
        return PendingFold(noop=True)  # replayed micro-batch
    meta = segments.read_meta(store_path)
    n_buckets = segments.pin_n_buckets(store_path, meta, n_buckets)
    # ids must stay one orderable type store-wide: min(comp) is numeric
    # for numeric ids, lexicographic for strings — mixed ingest would
    # unionByName-coerce and silently flip the order (hash_store's r10
    # ADVICE fix, same rule here)
    segments.pin_value(store_path, meta, "id_type", dict(pairs.dtypes)[id_a])
    id_type = dict(pairs.dtypes)[id_a]
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    try:
        assign = read_cluster_assignments(spark, store_path)
    except FileNotFoundError:
        assign = None
    if assign is not None:
        # condense: endpoint -> its current label (own id if never
        # assigned), carrying a was-assigned flag per endpoint so the
        # driver path never needs a second pass over the store to
        # tell fresh vertices from old labels (a node value cannot be
        # both: a label always has its own (c, c) assignment row)
        la = assign.select(
            F.col("doc_id").alias("src"), F.col("comp").alias("_ca")
        )
        lb = assign.select(
            F.col("doc_id").alias("dst"), F.col("comp").alias("_cb")
        )
        edges = (
            edges.join(la, "src", "left")
            .join(lb, "dst", "left")
            .select(
                F.coalesce("_ca", F.col("src")).alias("src"),
                F.coalesce("_cb", F.col("dst")).alias("dst"),
                F.col("_ca").isNotNull().alias("sa"),
                F.col("_cb").isNotNull().alias("sb"),
            )
            .where(F.col("src") != F.col("dst"))
        )
    else:
        edges = edges.select(
            "src", "dst", F.lit(False).alias("sa"), F.lit(False).alias("sb")
        )
    # the ONE execution of the upstream pairs plan: an eager local
    # checkpoint of the condensed edges (r12, ADVICE fix — checkpoint
    # BEFORE the bounding collect, so the distributed fallback reuses
    # the materialized blocks instead of re-running the expensive LSH
    # plan a second time; the collect below then reads checkpointed
    # blocks, never recomputes). limit(N+1) caps driver memory; an
    # overflowing batch re-plans distributed over the same checkpoint.
    cond = edges.distinct().localCheckpoint(eager=True)
    return PendingFold(
        spark=spark,
        store_path=store_path,
        batch_id=batch_id,
        compact_every=compact_every,
        n_buckets=n_buckets,
        id_type=id_type,
        assign=assign,
        cond=cond,
        driver_cc_max_edges=driver_cc_max_edges,
        noop=False,
    )


def cluster_store_commit_condensed(pending: PendingFold) -> None:
    """Phase 2 of the fold: connectivity solve over the checkpointed
    condensed edges (driver union-find under the bound, distributed
    hash-min CC past it), the relabel join, the atomic delta commit,
    and the compaction trigger. Touches only the cluster store."""
    if pending.noop:
        return
    spark = pending.spark
    store_path = pending.store_path
    batch_id = pending.batch_id
    compact_every = pending.compact_every
    n_buckets = pending.n_buckets
    id_type = pending.id_type
    assign = pending.assign
    cond = pending.cond
    driver_cc_max_edges = pending.driver_cc_max_edges
    head = cond.limit(driver_cc_max_edges + 1).collect()
    relabel_changed = None  # (node, new_comp) for old labels that moved
    fresh_delta = None  # (doc_id, comp) rows needing no store join
    if not head:
        # nothing to relabel, but the batch id must still commit so
        # replay accounting stays exact (empty delta, like the sibling
        # stores' empty-batch path)
        pass
    elif len(head) <= driver_cc_max_edges:
        mapping = _driver_union_find([(r["src"], r["dst"]) for r in head])
        was_assigned: set = set()
        for r in head:
            if r["sa"]:
                was_assigned.add(r["src"])
            if r["sb"]:
                was_assigned.add(r["dst"])
        changed_rows = [
            (n, m) for n, m in mapping.items() if n in was_assigned and m != n
        ]
        fresh_rows = [
            (n, m) for n, m in mapping.items() if n not in was_assigned
        ]
        schema = f"node {id_type}, new_comp {id_type}"
        # pandas/Arrow + coalesce(1): createDataFrame over a plain
        # Python list parallelizes it into defaultParallelism
        # PYTHON-RDD slices, so the downstream delta write pays one
        # task + one Python-worker round-trip + one parquet commit PER
        # SLICE (~0.5-2 s of pure overhead for a 52-row delta at 32
        # cores — r14 flagship profile; coalescing THOSE slices is
        # worse still, one task walking 32 Python partitions
        # sequentially). The pandas path ships the rows as Arrow
        # batches the JVM owns outright — no Python worker at task
        # time — and coalesce(1) then makes the write a single fast
        # task (~0.2 s measured). These frames are driver-bounded by
        # construction (<= driver_cc_max_edges mapping entries, a few
        # MB at the bound), so one slice is safe at any corpus scale.
        import pandas as pd

        cols = ["node", "new_comp"]
        if changed_rows:
            relabel_changed = F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame(changed_rows, columns=cols), schema
                ).coalesce(1)
            )
        if fresh_rows:
            fresh_delta = (
                spark.createDataFrame(
                    pd.DataFrame(fresh_rows, columns=cols), schema
                )
                .coalesce(1)
                .select(
                    F.col("node").alias("doc_id"),
                    F.col("new_comp").alias("comp"),
                )
            )
    else:
        from ..operators.graph import connected_components

        # cond is already an eager checkpoint — the iterative kernel
        # reads the materialized blocks, no upstream re-execution
        labels = connected_components(
            cond.select("src", "dst"), src="src", dst="dst"
        ).select(
            F.col("id").alias("node"), F.col("comp").alias("new_comp")
        )
        relabel_changed = labels.where(F.col("node") != F.col("new_comp"))
        if assign is not None:
            fresh_delta = labels.join(
                assign, labels.node == assign.doc_id, "left_anti"
            ).select(
                F.col("node").alias("doc_id"),
                F.col("new_comp").alias("comp"),
            )
        else:
            fresh_delta = labels.select(
                F.col("node").alias("doc_id"),
                F.col("new_comp").alias("comp"),
            )
    # members of components whose label CHANGED relabel via one
    # equi-join on comp — minimal: unchanged components write nothing
    parts = []
    if relabel_changed is not None and assign is not None:
        parts.append(
            assign.join(
                relabel_changed, assign.comp == relabel_changed.node
            ).select("doc_id", F.col("new_comp").alias("comp"))
        )
    if fresh_delta is not None:
        parts.append(fresh_delta)
    if parts:
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        delta = delta.withColumn("_bucket", _bucket_expr(n_buckets))
    else:
        delta = spark.createDataFrame(
            [], f"doc_id {id_type}, comp {id_type}, _bucket int"
        ).coalesce(1)
    segments.commit_delta(delta, store_path, batch_id, bucket_col="_bucket")
    if len(segments.live_deltas(store_path)) >= compact_every:
        cluster_store_compact(spark, store_path, n_buckets)


def cluster_store_compact(
    spark: SparkSession,
    store_path: str,
    n_buckets: int = CLUSTER_STORE_BUCKETS,
    rows_per_bucket: int = segments.ROWS_PER_BUCKET,
) -> None:
    """Fold live deltas into a fresh doc-bucketed base via one atomic
    meta replace — bucket-PARTIAL (only delta-touched ``_bucket=K``
    partitions are min-merged; the rest hard-link into the new base)
    with r11 adaptive bucket growth, exactly the hash store's
    contract. The merge rule is min(comp) per doc_id, so compaction
    order and replayed deltas cannot corrupt assignments."""
    meta = segments.read_meta(store_path)
    segments.sweep(store_path, meta)
    deltas = segments.live_deltas(store_path, meta)
    if not deltas:
        return
    n_buckets = segments.pin_n_buckets(store_path, meta, n_buckets)
    grown = segments.grown_n_buckets(meta, deltas, n_buckets, rows_per_bucket)
    new_base = segments.next_base_name(meta)
    touched = (
        segments.touched_buckets(deltas, "_bucket")
        if grown == n_buckets
        and meta["base"]
        and meta.get("base_n_buckets") == n_buckets
        else None
    )
    n_buckets = grown
    wrote = True
    if touched == []:  # only empty deltas live: carry the base verbatim
        merged_tmp = os.path.join(store_path, f"_tmp-merge-{new_base}")
        os.makedirs(merged_tmp, exist_ok=True)
        segments.assemble_partial_base(
            store_path, meta["base"], merged_tmp, new_base, "_bucket", touched
        )
    elif touched is not None and len(touched) < n_buckets:
        # tombstone-aware merge (r13): applies pending deletes and
        # drops the tombstones, so the new partitions physically
        # reclaim erased docs (a tombstone lives in its key's bucket,
        # so the touched set covers it)
        merged = _merged_assignments(
            _assign_frames(spark, store_path, meta, deltas, buckets=touched)
        )
        merged = merged.withColumn("_bucket", _bucket_expr(n_buckets))
        merged_tmp = os.path.join(store_path, f"_tmp-merge-{new_base}")
        merged.repartition("_bucket").write.partitionBy("_bucket").mode(
            "overwrite"
        ).parquet(merged_tmp)
        segments.assemble_partial_base(
            store_path, meta["base"], merged_tmp, new_base, "_bucket", touched
        )
    else:
        merged = _merged_assignments(
            _assign_frames(spark, store_path, meta, deltas)
        )
        # an all-empty history commits base=None (segments.write_base);
        # a tombstones-only history (merged is None) is the same case
        wrote = merged is not None and segments.write_base(
            merged.withColumn("_bucket", _bucket_expr(n_buckets)),
            store_path,
            new_base,
            "_bucket",
        )
    segments.write_meta(
        store_path,
        {
            **meta,  # preserve pinned properties (id_type, ...)
            "base": new_base if wrote else None,
            "consumed_through": max(deltas),
            "n_buckets": n_buckets,
            "base_n_buckets": n_buckets,
            "base_rows": (
                segments.base_row_count(spark, store_path, new_base)
                if wrote
                else 0
            ),
        },
    )
    segments.sweep(store_path, segments.read_meta(store_path))


def cluster_store_delete_batch(
    ids: DataFrame,
    store_path: str,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    compact_every: int = COMPACT_EVERY,
) -> None:
    """Retract documents from the assignment table (r13, r12 VERDICT
    task 6): one atomic tombstone delta keyed by doc_id. Deleted docs
    disappear from ``read_cluster_assignments`` and score as
    singletons in ``dedup_verdicts_from_store``; a doc RE-paired by a
    later batch gets a fresh assignment that outranks the tombstone.
    Other members' labels are untouched — a component label is an
    opaque cluster id, not a liveness claim (see the module
    docstring's retraction note); erasing a canonical member does not
    rewrite stored labels. Consumers that need a keeper among the
    SURVIVORS re-elect read-side via
    ``dedup_verdicts_from_store(..., reelect_keepers=True)`` (r14).
    The next compaction physically drops dead rows
    + tombstones. Same batch-id sequence / replay guard / crash
    contract as ingest."""
    from . import tombstones

    os.makedirs(store_path, exist_ok=True)
    if batch_id is None:
        batch_id = segments.next_batch_id(store_path)
    elif segments.already_ingested(store_path, batch_id):
        return  # replayed delete batch
    meta = segments.read_meta(store_path)
    n_buckets = segments.pin_n_buckets(store_path, meta, CLUSTER_STORE_BUCKETS)
    rows = (
        ids.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .withColumn(tombstones.TOMB_COL, F.lit(True))
        .withColumn("_bucket", _bucket_expr(n_buckets))
    )
    segments.commit_delta(rows, store_path, batch_id, bucket_col="_bucket")
    if len(segments.live_deltas(store_path)) >= compact_every:
        cluster_store_compact(ids.sparkSession, store_path, n_buckets)


def dedup_verdicts_from_store(
    docs: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    reelect_keepers: bool = False,
) -> DataFrame:
    """The consumable dedup answer per document, straight from the
    assignment table — no pair recomputation, no CC run: (doc_id,
    cluster_id, keep). cluster_id is the doc's component label (its
    own id for singletons); keep is true iff the doc is its cluster's
    canonical (min member) — ``doc_dedup_keeplist``'s exact contract,
    answered incrementally. One left equi-join against the slim
    store.

    ``reelect_keepers`` (r14, r13 VERDICT task 4): after erasing a
    cluster's canonical member (``cluster_store_delete_batch``) the
    surviving members still carry the erased doc's id as their opaque
    label, so the default keep rule (doc_id == label) leaves the
    cluster with NO keeper — a consumer computing a keeplist from the
    store after deletes would drop every survivor. With the flag set,
    the keeper is re-elected READ-side as the min LIVE member per
    surviving cluster: one aggregation over the slim assignment table,
    no stored-label mutation (labels stay opaque ids; the store is
    untouched). Clusters whose canonical is still live elect the same
    keeper as the default rule, so the flag only changes answers for
    erased-canonical clusters."""
    spark = docs.sparkSession
    ids = docs.select(F.col(id_col).alias("doc_id"))
    try:
        assign = read_cluster_assignments(spark, store_path)
    except FileNotFoundError:
        assign = None
    if assign is None:
        return ids.select(
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
            F.lit(True).alias("keep"),
        )
    joined = ids.join(assign, "doc_id", "left")
    cluster = F.coalesce("comp", F.col("doc_id"))
    if not reelect_keepers:
        return joined.select(
            "doc_id",
            cluster.alias("cluster_id"),
            (F.col("doc_id") == cluster).alias("keep"),
        )
    keepers = assign.groupBy("comp").agg(F.min("doc_id").alias("_keeper"))
    return (
        joined.join(keepers, "comp", "left")
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            # a doc outside the store is its own singleton keeper;
            # inside, the min live member of its cluster keeps
            (F.col("doc_id") == F.coalesce("_keeper", F.col("doc_id"))).alias(
                "keep"
            ),
        )
    )


def stream_dedup_clusters(
    stream_df: DataFrame,
    lsh_store_path: str,
    cluster_store_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 240,
    compact_every: int = COMPACT_EVERY,
    threshold: float = 0.5,
) -> None:
    """The full streaming dedup pipeline in one foreachBatch driver:
    per micro-batch of documents — (1) signatures ingested into the
    LSH store, (2) near-dup pairs vs (history ∪ batch) scored from it,
    (3) the pairs folded into the cluster assignments. Both stores
    share the batch id, so a replayed micro-batch is a no-op
    end-to-end — and the ORDER makes a crash between the two writes
    recoverable: the signature ingest lands first, and because
    ``neardup_pairs_against_store`` dedups doc_id collisions
    batch-wins, re-scoring a batch whose signatures are already stored
    yields the identical pair set, so the replay completes the cluster
    fold it crashed before. checkpoint_dir lives and dies with BOTH
    store paths (segments.py lifecycle contract)."""
    from .incremental import run_foreach_batch
    from .lsh_store import lsh_store_update_batch, neardup_pairs_against_store

    from .lsh_store import _doc_rows

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if segments.already_ingested(cluster_store_path, batch_id):
            return  # fully applied on a prior attempt
        # one signature build per batch, shared by ingest and scoring
        rows = _doc_rows(batch, "doc_id", "text").localCheckpoint(eager=True)
        lsh_store_update_batch(  # own replay guard: no-op if landed
            batch,
            lsh_store_path,
            batch_id,
            compact_every=compact_every,
            doc_rows=rows,
        )
        pairs = neardup_pairs_against_store(
            batch, lsh_store_path, threshold=threshold, doc_rows=rows
        )
        cluster_store_update_batch(
            pairs, cluster_store_path, batch_id, compact_every=compact_every
        )

    run_foreach_batch(stream_df, _sink, checkpoint_dir, timeout_sec)


def cluster_store_bootstrap(
    pairs: DataFrame,
    store_path: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> None:
    """Day-0 bulk load: one-shot distributed CC over the existing
    corpus' full pair set (the initial clustering a production dedup
    runs ONCE in batch), written directly as the first compacted base;
    incremental pair batches then maintain it. Equivalent state to
    folding the same pairs through update_batch, pinned by test."""
    from ..operators.graph import connected_components

    id_type = dict(pairs.dtypes)[id_a]
    labels = connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("id").alias("doc_id"), "comp"
    )
    n_rows = pairs.select(id_a).unionByName(
        pairs.select(F.col(id_b).alias(id_a))
    ).distinct().count()
    n_buckets = segments.sized_n_buckets(n_rows)
    rows = labels.withColumn("_bucket", _bucket_expr(n_buckets))
    segments.bootstrap_base(
        rows, store_path, "_bucket", n_buckets,
        extra_meta={"id_type": id_type},
    )
