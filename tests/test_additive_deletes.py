"""Deletion round-trips for the three ADDITIVE stores (r14, r13
VERDICT task 1): gram, window, and df retract via NEGATIVE-count
partial deltas on the unchanged segment layer — ingest → delete →
reads show the never-ingested answer → compaction physically reclaims
→ re-ingest resurrects. Completes right-to-erasure across all eight
stores (the latest-writer/min-merge stores got tombstones in r13 —
tests/test_tombstones.py); semantics in each store's delete_batch
docstring.
"""

from __future__ import annotations

import glob
import os
from decimal import Decimal

import pyarrow.parquet as pq

from hubspot_neo4j_pipeline_spark.streaming import segments


def _base_rows(store: str) -> list[dict]:
    """Rows of the committed base read with pyarrow — the assertion is
    about BYTES ON DISK, not about what a reader chooses to show."""
    meta = segments.read_meta(store)
    assert meta["base"], "expected a committed base"
    rows: list = []
    for f in glob.glob(
        os.path.join(store, meta["base"], "**", "*.parquet"), recursive=True
    ):
        rows.extend(pq.read_table(f).to_pylist())
    return rows


def test_gram_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.gram_store import (
        contamination_against_store,
        gram_store_compact,
        gram_store_delete_batch,
        gram_store_update_batch,
        read_gram_store,
    )

    store = str(tmp_path_factory.mktemp("adddel")) + "/grams"
    dup_text = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 2 5-grams
    other = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, dup_text), (2, dup_text), (3, other)], "doc_id long, text string"
    )
    gram_store_update_batch(docs, store, batch_id=0, compact_every=99)
    counts = {r.h: r.n for r in read_gram_store(spark, store).collect()}
    assert sorted(counts.values()) == [1, 1, 2, 2]  # dup grams counted twice

    # retract doc 2: shared grams DECREMENT (still present via doc 1)
    gram_store_delete_batch(
        docs.where("doc_id = 2"), store, batch_id=1, compact_every=99
    )
    after = {r.h: r.n for r in read_gram_store(spark, store).collect()}
    assert sorted(after.values()) == [1, 1, 1, 1]
    assert set(after) == set(counts)

    # retract doc 1 too: its grams net to 0 and VANISH from the read
    gram_store_delete_batch(
        docs.where("doc_id = 1"), store, batch_id=2, compact_every=99
    )
    survivors = {r.h: r.n for r in read_gram_store(spark, store).collect()}
    assert sorted(survivors.values()) == [1, 1]
    assert set(survivors) == set(counts) - set(
        k for k, v in counts.items() if v == 2
    )

    # replayed delete batch is a no-op (per-batch-id guard)
    gram_store_delete_batch(
        docs.where("doc_id = 3"), store, batch_id=2, compact_every=99
    )
    assert {r.h: r.n for r in read_gram_store(spark, store).collect()} == survivors

    # decontamination forgets the erased content: a training doc
    # sharing grams only with the deleted text now screens clean
    train = spark.createDataFrame(
        [(100, dup_text), (101, other)], "doc_id long, text string"
    )
    flags = {r.doc_id: r.n_shared_grams
             for r in contamination_against_store(train, store).collect()}
    assert flags == {101: 2}

    # compaction physically reclaims: only surviving grams on disk,
    # no negative/zero rows
    gram_store_compact(spark, store)
    rows = _base_rows(store)
    assert sorted(r["n"] for r in rows) == [1, 1]
    assert {r["h"] for r in rows} == set(survivors)
    assert not segments.live_deltas(store)

    # re-ingest resurrects with fresh counts
    gram_store_update_batch(
        docs.where("doc_id = 1"), store, compact_every=99
    )
    res = {r.h: r.n for r in read_gram_store(spark, store).collect()}
    assert sorted(res.values()) == [1, 1, 1, 1]


def test_window_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.window_store import (
        read_window_store,
        recency_report_from_store,
        window_store_compact,
        window_store_delete_batch,
        window_store_update_batch,
    )

    store = str(tmp_path_factory.mktemp("adddel")) + "/windows"
    events = spark.createDataFrame(
        [
            (1, "2024-03-01 10:00:00", "alice", 10.50),
            (2, "2024-03-01 11:00:00", "alice", 2.25),
            (3, "2024-03-01 12:00:00", "bob", 5.00),
            (4, "2024-03-02 09:00:00", "alice", 1.00),
        ],
        "event_id long, ts string, user_id string, value double",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value")
    window_store_update_batch(events, store, batch_id=0, compact_every=99)

    def cells():
        return {
            (str(r.day.date()), r.user_id): (r.n, r.total_value)
            for r in read_window_store(spark, store).collect()
        }

    assert cells() == {
        ("2024-03-01", "alice"): (2, Decimal("12.75")),
        ("2024-03-01", "bob"): (1, Decimal("5.00")),
        ("2024-03-02", "alice"): (1, Decimal("1.00")),
    }

    # retract ONE of alice's two day-1 events: cell decrements exactly
    window_store_delete_batch(
        events.where("event_id = 2"), store, batch_id=1, compact_every=99
    )
    assert cells()[("2024-03-01", "alice")] == (1, Decimal("10.50"))

    # retract the other: the cell nets to 0 and vanishes
    window_store_delete_batch(
        events.where("event_id = 1"), store, batch_id=2, compact_every=99
    )
    assert cells() == {
        ("2024-03-01", "bob"): (1, Decimal("5.00")),
        ("2024-03-02", "alice"): (1, Decimal("1.00")),
    }

    # the recency report (the reference-parity consumer) reflects the
    # erasure: alice's lifetime totals now exclude the retracted events
    rep = {r.user_id: (r.n_events_total, r.n_days_active)
           for r in recency_report_from_store(spark, store).collect()}
    assert rep == {"alice": (1, 1), "bob": (1, 1)}

    # compaction physically reclaims the netted-out cell
    window_store_compact(spark, store)
    rows = _base_rows(store)
    assert sorted((r["user_id"], r["n"]) for r in rows) == [
        ("alice", 1), ("bob", 1)
    ]
    assert all(r["n"] > 0 for r in rows)

    # re-ingest resurrects
    window_store_update_batch(
        events.where("event_id = 1"), store, compact_every=99
    )
    assert cells()[("2024-03-01", "alice")] == (1, Decimal("10.50"))


def test_df_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.df_store import (
        corpus_doc_count,
        df_store_compact,
        df_store_delete_batch,
        df_store_update_batch,
        read_df_store,
    )

    store = str(tmp_path_factory.mktemp("adddel")) + "/vocab"
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "apple dog"), (3, "elder fig")],
        "doc_id long, text string",
    )
    df_store_update_batch(docs, store, batch_id=0, compact_every=99)

    def vocab():
        return {r.term: r.df for r in read_df_store(spark, store).collect()}

    def ndocs():
        return corpus_doc_count(spark, store).collect()[0].n_docs

    assert vocab() == {
        "apple": 2, "banana": 1, "cherry": 1, "dog": 1, "elder": 1, "fig": 1
    }
    assert ndocs() == 3

    # retract doc 1: shared term decrements, its exclusive terms
    # vanish, and the doc count drops IN THE SAME atomic delta
    df_store_delete_batch(
        docs.where("doc_id = 1"), store, batch_id=1, compact_every=99
    )
    assert vocab() == {"apple": 1, "dog": 1, "elder": 1, "fig": 1}
    assert ndocs() == 2

    # replayed delete is a no-op
    df_store_delete_batch(
        docs.where("doc_id = 2"), store, batch_id=1, compact_every=99
    )
    assert ndocs() == 2

    # compaction physically reclaims netted-out terms; the reserved
    # doc-count row persists at its decremented value
    df_store_compact(spark, store)
    rows = _base_rows(store)
    terms_on_disk = {r["term"]: r["df"] for r in rows}
    assert terms_on_disk.pop("\x00__n_docs__") == 2
    assert terms_on_disk == {"apple": 1, "dog": 1, "elder": 1, "fig": 1}

    # re-ingest resurrects
    df_store_update_batch(docs.where("doc_id = 1"), store, compact_every=99)
    assert vocab()["apple"] == 2
    assert ndocs() == 3


def test_df_store_delete_tfidf_equals_fresh_store(spark, tmp_path_factory):
    """Scoring against (ingest ∪ delete) must equal scoring against a
    store that never saw the deleted docs — the additive-store
    statement of 'reads show the never-ingested answer'."""
    from hubspot_neo4j_pipeline_spark.streaming.df_store import (
        df_store_delete_batch,
        df_store_update_batch,
        tfidf_batch_against_store,
    )

    root = str(tmp_path_factory.mktemp("adddel"))
    docs = spark.createDataFrame(
        [
            (1, "quick brown fox jumps over lazy dog"),
            (2, "quick blue hare naps under busy dog"),
            (3, "slow green turtle walks past quiet pond"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "quick dog pond walks")], "doc_id long, text string"
    )
    full = root + "/full"
    df_store_update_batch(docs, full, batch_id=0, compact_every=99)
    df_store_delete_batch(
        docs.where("doc_id = 2"), full, batch_id=1, compact_every=99
    )
    fresh = root + "/fresh"
    df_store_update_batch(
        docs.where("doc_id != 2"), fresh, batch_id=0, compact_every=99
    )
    key = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.term, r.tfidf) for r in df.collect()
    )
    assert key(tfidf_batch_against_store(batch, full)) == key(
        tfidf_batch_against_store(batch, fresh)
    )
