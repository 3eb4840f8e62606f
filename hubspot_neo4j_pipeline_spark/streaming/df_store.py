"""Incremental CORPUS STATISTICS: a document-frequency (vocabulary)
store on the shared LSM segment layer.

Every relevance / novelty / quality signal that depends on corpus-wide
term statistics — TF-IDF, OOV rate, stop-term ratios — is a join
against two aggregates: df(term) = how many documents contain the
term, and n_docs. One-shot, those are re-derived from the full corpus
per run (``doc_tfidf_top_terms``, ``doc_vocab_oov``); this store
maintains them incrementally: each micro-batch folds its per-term
distinct-document counts (plus its document count) into additive
partials, ingested in O(batch) as an atomic delta, and an incoming
batch is scored against statistics of EVERYTHING ever ingested —
no corpus re-scan, ever.

Additivity: df partials sum exactly when micro-batches PARTITION the
document stream (each doc ingested once — the append-only corpus
contract all five sibling stores share); the per-batch-id replay
guard is the only idempotency sums need. The corpus document count
rides inside the same delta as a reserved row (``DOC_COUNT_KEY`` —
a key no whitespace token can be, enforced by filter), so df and
n_docs can never be torn by a crash: both commit in one rename.

Scale (100 TB): the store is one slim (term, df) row per distinct
vocabulary term — vastly smaller than the corpus, bucket-partitioned
by term hash with bucket-partial compaction and r11 adaptive growth.
Scoring an incoming batch semi-joins the store by the BATCH's
vocabulary (broadcast — a batch's distinct terms are small) before
the sum-merge, so the read does no corpus-wide shuffle.

Exactness: scores follow the registered TF-IDF rule — ln() on
IEEE-identical double inputs, floor-quantized at 1e-4
(``plans/curation_queries.doc_tfidf_top_terms``) — so the registered
oracle ``incremental_tfidf_topk`` compares cell-exact.

Reference parity: the reference has no streaming surface and no term
statistics; this is beyond-reference LLM-pipeline infrastructure
(SURVEY §2's curation family made incremental), with the batch
TF-IDF operator as ground truth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import segments

DF_STORE_BUCKETS = 32
COMPACT_EVERY = 8
MIN_TERM_LEN = 3  # doc_tfidf_top_terms' token rule
# Reserved term key carrying the ingested-document count. A real token
# can never collide: batch tokens are whitespace-split substrings and
# _terms() filters this exact key defensively anyway.
DOC_COUNT_KEY = "\x00__n_docs__"


def _terms(batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term) — DISTINCT per doc (df counts documents, not
    occurrences), under the registered token rule."""
    return (
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.length("term") >= MIN_TERM_LEN)
        .where(F.col("term") != DOC_COUNT_KEY)
        .distinct()
    )


def _partial_df(batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One batch's additive (term, df) partials plus the reserved
    doc-count row — one frame, so both land in the same atomic delta."""
    terms = (
        _terms(batch, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n = batch.agg(
        F.lit(DOC_COUNT_KEY).alias("term"), F.count("*").alias("df")
    )
    return terms.unionByName(n)


def _bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)).cast("int")


def _merged_rows(
    spark: SparkSession, store_path: str, terms_filter: DataFrame | None = None
) -> DataFrame:
    """Raw (term, df) partial rows across base + live deltas,
    optionally semi-join-pruned to a term set BEFORE the sum-merge
    (sound: a term's total never needs other terms' rows)."""
    meta = segments.read_meta(store_path)
    frames = []
    if meta["base"]:
        frames.append(
            spark.read.parquet(os.path.join(store_path, meta["base"])).select(
                "term", "df"
            )
        )
    for _bid, path in sorted(segments.live_deltas(store_path, meta).items()):
        frames.append(spark.read.parquet(path).select("term", "df"))
    if not frames:
        raise FileNotFoundError(f"empty df store at {store_path}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if terms_filter is not None:
        out = out.join(F.broadcast(terms_filter), "term", "left_semi")
    return out


def read_df_store(
    spark: SparkSession, store_path: str, terms_filter: DataFrame | None = None
) -> DataFrame:
    """The store's current (term, df) view, sum-merged; the reserved
    doc-count row is excluded (use ``corpus_doc_count``). A
    compacted-base-only store (no live deltas) skips the merge shuffle
    — it is already one row per term and never stores non-positive
    counts. With live deltas the merge hides terms netted to 0 by
    negative delete partials (``df_store_delete_batch``)."""
    meta = segments.read_meta(store_path)
    n_deltas = len(segments.live_deltas(store_path, meta))
    rows = _merged_rows(spark, store_path, terms_filter).where(
        F.col("term") != DOC_COUNT_KEY
    )
    if n_deltas == 0:
        return rows
    return (
        rows.groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .where(F.col("df") > 0)
    )


def corpus_doc_count(spark: SparkSession, store_path: str) -> DataFrame:
    """1-row (n_docs): how many documents the store has ingested."""
    rows = _merged_rows(spark, store_path).where(
        F.col("term") == DOC_COUNT_KEY
    )
    # negative delete partials decrement; coalesce covers the fully
    # emptied store (every doc retracted → the reserved row nets to 0
    # and compaction drops it)
    return rows.agg(
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("n_docs")
    )


def df_store_update_batch(
    batch: DataFrame,
    store_path: str,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = COMPACT_EVERY,
    n_buckets: int = DF_STORE_BUCKETS,
) -> None:
    """Ingest one micro-batch's (term, df) partials + doc count as an
    atomic delta — O(batch), the existing state is NOT read. Same
    replay / crash / compaction contract as the sibling stores."""
    os.makedirs(store_path, exist_ok=True)
    if batch_id is None:
        batch_id = segments.next_batch_id(store_path)
    elif segments.already_ingested(store_path, batch_id):
        return  # replayed micro-batch
    meta = segments.read_meta(store_path)
    n_buckets = segments.pin_n_buckets(store_path, meta, n_buckets)
    partial = _partial_df(batch, id_col, text_col).withColumn(
        "_bucket", _bucket_expr(n_buckets)
    )
    segments.commit_delta(partial, store_path, batch_id, bucket_col="_bucket")
    if len(segments.live_deltas(store_path)) >= compact_every:
        df_store_compact(batch.sparkSession, store_path, n_buckets)


def df_store_compact(
    spark: SparkSession,
    store_path: str,
    n_buckets: int = DF_STORE_BUCKETS,
    rows_per_bucket: int = segments.ROWS_PER_BUCKET,
) -> None:
    """Fold live deltas into a fresh term-bucketed base via one atomic
    meta replace — bucket-PARTIAL (sum-merge only delta-touched
    ``_bucket=K`` partitions, hard-link the rest) with r11 adaptive
    bucket growth; the window store's contract on (term, df) rows.
    The reserved doc-count row sum-merges like any term."""
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
        merged = (
            spark.read.parquet(os.path.join(store_path, meta["base"]))
            .where(F.col("_bucket").isin(touched))  # partition-pruned
            .select("term", "df")
        )
        for _b, p in sorted(deltas.items()):
            merged = merged.unionByName(
                spark.read.parquet(p).select("term", "df")
            )
        merged = (
            merged.groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            # terms netted to 0 by delete partials reclaim here (the
            # reserved doc-count row only nets to 0 when every doc was
            # retracted — the empty store)
            .where(F.col("df") > 0)
            .withColumn("_bucket", _bucket_expr(n_buckets))
        )
        merged_tmp = os.path.join(store_path, f"_tmp-merge-{new_base}")
        merged.repartition("_bucket").write.partitionBy("_bucket").mode(
            "overwrite"
        ).parquet(merged_tmp)
        segments.assemble_partial_base(
            store_path, meta["base"], merged_tmp, new_base, "_bucket", touched
        )
    else:
        merged = (
            _merged_rows(spark, store_path)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            .where(F.col("df") > 0)  # reclaim netted-out terms
            .withColumn("_bucket", _bucket_expr(n_buckets))
        )
        # an all-empty history commits base=None (segments.write_base)
        wrote = segments.write_base(merged, store_path, new_base, "_bucket")
    segments.write_meta(
        store_path,
        {
            **meta,  # preserve pinned properties
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


def df_store_delete_batch(
    deleted_docs: DataFrame,
    store_path: str,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = COMPACT_EVERY,
) -> None:
    """Retract documents from the vocabulary statistics (r14 — the
    additive half of right-to-erasure: until now an erased doc's terms
    kept inflating df and ``corpus_doc_count``, skewing every TF-IDF
    score computed after the erasure). Retraction is a NEGATIVE
    partial: one atomic delta carrying the deleted docs' own (term,
    df) partials AND the reserved doc-count row, all negated — both
    decrement in the SAME rename, so df and n_docs can never be torn
    by a crash (the exact invariant ingest has). A term contained only
    in deleted docs nets to 0 and vanishes from every read
    (``read_df_store``'s ``df > 0`` rule); shared terms just
    decrement; the next compaction physically drops netted-out rows.
    The erasure request carries the documents (their text) — partials
    recompute from the supplied frame under the same token rule as
    ingest. Contract: delete only previously-ingested docs, each at
    most once."""
    os.makedirs(store_path, exist_ok=True)
    if batch_id is None:
        batch_id = segments.next_batch_id(store_path)
    elif segments.already_ingested(store_path, batch_id):
        return  # replayed delete batch
    meta = segments.read_meta(store_path)
    n_buckets = segments.pin_n_buckets(store_path, meta, DF_STORE_BUCKETS)
    partial = (
        _partial_df(deleted_docs, id_col, text_col)
        .select("term", (-F.col("df")).cast("long").alias("df"))
        .withColumn("_bucket", _bucket_expr(n_buckets))
    )
    segments.commit_delta(partial, store_path, batch_id, bucket_col="_bucket")
    if len(segments.live_deltas(store_path)) >= compact_every:
        df_store_compact(deleted_docs.sparkSession, store_path, n_buckets)


def tfidf_batch_against_store(
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per incoming document, where df and n_docs
    cover everything ever ingested PLUS the batch itself (pre-ingest
    contract, like the gram store's scoring: the batch's own partial
    counts are unioned in) — so the result equals the one-shot
    ``doc_tfidf_top_terms`` over (history ∪ batch) restricted to the
    batch's docs, which is the registered oracle. Scale: tf shuffles
    on the BATCH's (doc, term) only; the store is semi-join-pruned to
    the batch's vocabulary before its sum-merge; n_docs is a 1-row
    broadcast. Output: (doc_id, term, tfidf)."""
    from pyspark.sql import Window

    spark = batch.sparkSession
    toks = (
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.length("term") >= MIN_TERM_LEN)
        # same reserved-key filter _terms applies on ingest (r12,
        # ADVICE fix): a document containing the literal DOC_COUNT_KEY
        # token must tokenize identically on the scoring side, or it
        # would be scored with batch-only df for that term
        .where(F.col("term") != DOC_COUNT_KEY)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    batch_df = tf.groupBy("term").agg(F.count("*").alias("df"))
    batch_n = batch.agg(F.count("*").alias("n_docs"))
    try:
        vocab = batch_df.select("term")
        hist_df = read_df_store(spark, store_path, terms_filter=vocab)
        hist_n = corpus_doc_count(spark, store_path)
        df_total = (
            batch_df.unionByName(hist_df)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        n_total = batch_n.unionByName(
            hist_n.select(F.col("n_docs"))
        ).agg(F.sum("n_docs").cast("long").alias("n_docs"))
    except FileNotFoundError:
        df_total, n_total = batch_df, batch_n
    scored = (
        tf.join(df_total, "term")
        .join(F.broadcast(n_total))
        .select(
            "doc_id",
            "term",
            (
                F.floor(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * 10000
                )
                / 10000
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tfidf")
    )


def stream_df_store(
    stream_df: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
    compact_every: int = COMPACT_EVERY,
) -> None:
    """foreachBatch driver: maintain the vocabulary store as documents
    stream in. store_path and checkpoint_dir live and die together
    (segments.py lifecycle contract)."""
    from .incremental import run_foreach_batch

    run_foreach_batch(
        stream_df,
        lambda batch, batch_id: df_store_update_batch(
            batch, store_path, batch_id, compact_every=compact_every
        ),
        checkpoint_dir,
        timeout_sec,
    )


def df_store_bootstrap(
    corpus: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Day-0 bulk load: the whole existing corpus' (term, df) totals
    plus its doc count written directly as the first compacted base.
    Bucket count sized by the corpus' document count (vocabulary row
    count is sublinear in documents, so this over-provisions — the
    safe direction). Equivalent state to update-then-compact, pinned
    by test."""
    n_buckets = segments.sized_n_buckets(corpus.count())
    rows = _partial_df(corpus, id_col, text_col).withColumn(
        "_bucket", _bucket_expr(n_buckets)
    )
    segments.bootstrap_base(rows, store_path, "_bucket", n_buckets)
