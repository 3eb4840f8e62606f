"""Deletion (tombstone) round-trips for the four content stores (r13,
r12 VERDICT task 6): ingest → delete → scoring shows no matches →
compaction physically drops the rows → a later re-ingest resurrects.
Production corpora need doc removal (right-to-erasure, eval-set
refresh) without a rebuild; until r13 latest-writer-wins could only
overwrite. Semantics and the sequence rule: streaming/tombstones.py.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from hubspot_neo4j_pipeline_spark.streaming import segments


def _base_scan(store: str):
    """(column-name set, rows as list of dicts) of the committed base
    — read with pyarrow, so the assertion is about BYTES ON DISK, not
    about what a reader chooses to show."""
    meta = segments.read_meta(store)
    assert meta["base"], "expected a committed base"
    cols: set = set()
    rows: list = []
    for f in glob.glob(
        os.path.join(store, meta["base"], "**", "*.parquet"), recursive=True
    ):
        t = pq.read_table(f)
        cols |= set(t.column_names)
        rows.extend(t.to_pylist())
    return cols, rows


def test_latest_writer_union_equals_window(spark, tmp_path_factory):
    """r13 read-path rewrite: the latest-writer merge is computed as
    broadcast anti-joins against newer frames' key sets instead of a
    per-row window over the whole store. Equality must hold on the
    adversarial shape — keys re-ingested across batches, a key only in
    the base, a tombstone shading a base key, and a re-ingest AFTER a
    tombstone — because frames are unique-per-key by construction and
    frame order is batch order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hubspot_neo4j_pipeline_spark.streaming.tombstones import (
        drop_tombstoned_latest,
        latest_writer_union,
    )

    base = spark.createDataFrame(
        [(1, "b1", 0), (2, "b2", 0), (3, "b3", 0), (4, "b4", 0)],
        "doc_id long, payload string, _ubid long",
    )
    d1 = spark.createDataFrame(  # re-ingests 2, tombstones 3
        [(2, "d1-2", 1, False), (3, None, 1, True), (5, "d1-5", 1, False)],
        "doc_id long, payload string, _ubid long, _del boolean",
    )
    d2 = spark.createDataFrame(  # re-ingests 3 AFTER its tombstone
        [(3, "d2-3", 2), (6, "d2-6", 2)],
        "doc_id long, payload string, _ubid long",
    )
    frames = [base, d1, d2]
    fast = drop_tombstoned_latest(latest_writer_union(frames, "doc_id"))
    allrows = base.withColumn("_del", F.lit(False))
    for f in (d1, d2):
        allrows = allrows.unionByName(f, allowMissingColumns=True)
    w = Window.partitionBy("doc_id").orderBy(F.col("_ubid").desc())
    slow = drop_tombstoned_latest(
        allrows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    key = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["payload"]) for r in df.collect()
    )
    assert key(fast) == key(slow) == [
        (1, "b1"), (2, "d1-2"), (3, "d2-3"), (4, "b4"),
        (5, "d1-5"), (6, "d2-6"),
    ]


def test_latest_writer_union_broadcast_gate(spark, tmp_path_factory):
    """r14 (r13 VERDICT task 6): past LATEST_WRITER_BROADCAST_MAX_ROWS
    of newer-frame keys (or with unknown counts) the merge must fall
    back to the per-row window instead of broadcasting a bulk-sized
    key set — with identical results. The micro-batch case keeps the
    no-shuffle broadcast plan (pinned separately in
    test_latest_writer_store_reads_do_not_shuffle)."""
    from pyspark.sql import functions as F

    from hubspot_neo4j_pipeline_spark.streaming.tombstones import (
        drop_tombstoned_latest,
        latest_writer_union,
    )

    base = spark.createDataFrame(
        [(1, "b1", 0), (2, "b2", 0), (3, "b3", 0), (4, "b4", 0)],
        "doc_id long, payload string, _ubid long",
    )
    d1 = spark.createDataFrame(
        [(2, "d1-2", 1, False), (3, None, 1, True), (5, "d1-5", 1, False)],
        "doc_id long, payload string, _ubid long, _del boolean",
    )
    d2 = spark.createDataFrame(
        [(3, "d2-3", 2), (6, "d2-6", 2)], "doc_id long, payload string, _ubid long"
    )
    frames = [base, d1, d2]
    expected = [
        (1, "b1"), (2, "d1-2"), (3, "d2-3"), (4, "b4"),
        (5, "d1-5"), (6, "d2-6"),
    ]
    key = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["payload"]) for r in df.collect()
    )

    # oversized newer frames -> window fallback, same answer
    over = latest_writer_union(
        frames, "doc_id", frame_rows=[4, 3, 2], max_broadcast_rows=4
    )
    plan = over._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "broadcast" not in plan.lower()
    assert key(drop_tombstoned_latest(over)) == expected

    # unknown newer-frame count -> conservative fallback
    unk = latest_writer_union(frames, "doc_id", frame_rows=[4, None, 2])
    assert "Window" in unk._jdf.queryExecution().executedPlan().toString()
    assert key(drop_tombstoned_latest(unk)) == expected

    # within the gate -> broadcast path, no window barrier
    under = latest_writer_union(frames, "doc_id", frame_rows=[4, 3, 2])
    plan = under._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "BroadcastExchange" in plan
    assert key(drop_tombstoned_latest(under)) == expected

    # frames written by TODAY'S stores are unique per key — the
    # store-format assumption the broadcast path rests on (r13 ADVICE:
    # a pre-_vec_rows legacy store could violate it)
    import glob as _glob
    import os as _os

    from hubspot_neo4j_pipeline_spark.streaming.vector_store import (
        vector_store_update_batch,
    )

    store = str(tmp_path_factory.mktemp("uniq")) + "/vec"
    dup_vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    vector_store_update_batch(dup_vecs, store, batch_id=0, compact_every=99)
    delta_dirs = list(segments.live_deltas(store).values())
    assert delta_dirs
    for d in delta_dirs:
        ids = []
        for f in _glob.glob(_os.path.join(d, "**", "*.parquet"), recursive=True):
            ids.extend(pq.read_table(f, columns=["vec_id"])["vec_id"].to_pylist())
        assert len(ids) == len(set(ids)), f"frame {d} has duplicate keys"


def test_hash_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.hash_store import (
        dedup_batch_against_store,
        hash_store_compact,
        hash_store_delete_batch,
        hash_store_update_batch,
        read_hash_store,
    )

    store = str(tmp_path_factory.mktemp("tomb")) + "/hash"
    docs = spark.createDataFrame(
        [(1, "erase me"), (2, "keep me"), (3, "erase me"), (4, "other")],
        "doc_id long, text string",
    )
    hash_store_update_batch(docs, store, batch_id=0, compact_every=99)
    inc = spark.createDataFrame(
        [(10, "erase me"), (11, "keep me")], "doc_id long, text string"
    )
    before = {r.doc_id: r.is_duplicate
              for r in dedup_batch_against_store(inc, store).collect()}
    assert before == {10: True, 11: True}

    # delete the CONTENT "erase me" (the erasure request carries the
    # documents; the tombstone is keyed by content hash)
    hash_store_delete_batch(
        spark.createDataFrame([("erase me",)], "text string"),
        store, batch_id=1, compact_every=99,
    )
    after = {r.doc_id: r.is_duplicate
             for r in dedup_batch_against_store(inc, store).collect()}
    assert after == {10: False, 11: True}  # forgotten content; other intact
    assert sorted(
        r.owner_id for r in read_hash_store(spark, store).collect()
    ) == [2, 4]

    # replayed delete batch is a no-op
    hash_store_delete_batch(
        spark.createDataFrame([("keep me",)], "text string"),
        store, batch_id=1, compact_every=99,
    )
    assert after == {
        r.doc_id: r.is_duplicate
        for r in dedup_batch_against_store(inc, store).collect()
    }

    # compaction physically reclaims: no tombstone column, no dead row
    hash_store_compact(spark, store)
    cols, rows = _base_scan(store)
    assert "_del" not in cols
    assert sorted(r["owner_id"] for r in rows) == [2, 4]

    # re-ingest of the erased content RESURRECTS with the new owner
    hash_store_update_batch(
        spark.createDataFrame([(20, "erase me")], "doc_id long, text string"),
        store, compact_every=99,
    )
    res = {r.doc_id: (r.canonical_id, r.is_duplicate)
           for r in dedup_batch_against_store(inc, store).collect()}
    assert res[10] == (10, False)  # 10 < 20: the batch row IS canonical
    assert sorted(
        r.owner_id for r in read_hash_store(spark, store).collect()
    ) == [2, 4, 20]


def test_lsh_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.lsh_store import (
        lsh_store_compact,
        lsh_store_delete_batch,
        lsh_store_update_batch,
        neardup_pairs_against_store,
        read_lsh_store,
    )

    store = str(tmp_path_factory.mktemp("tomb")) + "/lsh"
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    hist = spark.createDataFrame(
        [(1, t), (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    lsh_store_update_batch(hist, store, batch_id=0, compact_every=99)
    probe = spark.createDataFrame([(9, t)], "doc_id long, text string")
    assert [(r.id_a, r.id_b) for r in
            neardup_pairs_against_store(probe, store).collect()] == [(1, 9)]

    lsh_store_delete_batch(
        spark.createDataFrame([(1,)], "doc_id long"),
        store, batch_id=1, compact_every=99,
    )
    assert neardup_pairs_against_store(probe, store).count() == 0
    assert sorted(r.doc_id for r in read_lsh_store(spark, store).collect()) == [2]

    # compaction physically reclaims the signature row + tombstone
    lsh_store_compact(spark, store)
    cols, rows = _base_scan(store)
    assert "_del" not in cols
    assert sorted(r["doc_id"] for r in rows) == [2]

    # re-ingest resurrects (newer _ubid outranks any old tombstone)
    lsh_store_update_batch(
        spark.createDataFrame([(1, t)], "doc_id long, text string"),
        store, compact_every=99,
    )
    assert [(r.id_a, r.id_b) for r in
            neardup_pairs_against_store(probe, store).collect()] == [(1, 9)]


def test_vector_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.vector_store import (
        ann_topk_against_store,
        read_vector_store,
        vector_store_compact,
        vector_store_delete_batch,
        vector_store_update_batch,
    )

    store = str(tmp_path_factory.mktemp("tomb")) + "/vec"
    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(1, 30)],
        "vec_id long, embedding array<double>",
    )
    vector_store_update_batch(vecs, store, batch_id=0, compact_every=99)
    q = spark.createDataFrame(
        [(100, [1.0, 3.0, 1.0])], "vec_id long, embedding array<double>"
    )
    before = {r.neighbor_id for r in
              ann_topk_against_store(q, store, k=50).collect()}
    assert before  # bucketed candidates exist
    victim = sorted(before)[0]

    vector_store_delete_batch(
        spark.createDataFrame([(victim,)], "vec_id long"),
        store, batch_id=1, compact_every=99,
    )
    after = {r.neighbor_id for r in
             ann_topk_against_store(q, store, k=50).collect()}
    assert victim not in after
    assert after == before - {victim}
    assert victim not in {
        r.vec_id for r in read_vector_store(spark, store).collect()
    }

    vector_store_compact(spark, store)
    cols, rows = _base_scan(store)
    assert "_del" not in cols
    assert victim not in {r["vec_id"] for r in rows}

    # re-ingest resurrects
    vector_store_update_batch(
        vecs.where(f"vec_id = {victim}"), store, compact_every=99
    )
    assert victim in {
        r.neighbor_id for r in ann_topk_against_store(q, store, k=50).collect()
    }


def test_cluster_store_delete_roundtrip(spark, tmp_path_factory):
    from hubspot_neo4j_pipeline_spark.streaming.cluster_store import (
        cluster_store_compact,
        cluster_store_delete_batch,
        cluster_store_update_batch,
        dedup_verdicts_from_store,
        read_cluster_assignments,
    )

    store = str(tmp_path_factory.mktemp("tomb")) + "/cc"
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    cluster_store_update_batch(pairs, store, batch_id=0, compact_every=99)
    assert {(r.doc_id, r.comp) for r in
            read_cluster_assignments(spark, store).collect()} == {
        (1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}

    cluster_store_delete_batch(
        spark.createDataFrame([(2,)], "doc_id long"),
        store, batch_id=1, compact_every=99,
    )
    assert {(r.doc_id, r.comp) for r in
            read_cluster_assignments(spark, store).collect()} == {
        (1, 1), (3, 1), (7, 7), (8, 7)}
    docs = spark.createDataFrame([(2,), (3,)], "doc_id long")
    verdicts = {r.doc_id: (r.cluster_id, r.keep) for r in
                dedup_verdicts_from_store(docs, store).collect()}
    # the erased doc scores as a singleton; siblings keep their label
    # (an opaque cluster id — erasure re-elects no keeper)
    assert verdicts == {2: (2, True), 3: (1, False)}

    cluster_store_compact(spark, store)
    cols, rows = _base_scan(store)
    assert "_del" not in cols
    assert {(r["doc_id"], r["comp"]) for r in rows} == {
        (1, 1), (3, 1), (7, 7), (8, 7)}

    # a later pair re-admits the doc with a fresh assignment
    cluster_store_update_batch(
        spark.createDataFrame([(2, 9)], "id_a long, id_b long"),
        store, compact_every=99,
    )
    assert {(r.doc_id, r.comp) for r in
            read_cluster_assignments(spark, store).collect()} == {
        (1, 1), (3, 1), (7, 7), (8, 7), (2, 2), (9, 2)}


def test_cluster_store_keeper_reelection(spark, tmp_path_factory):
    """r14 (r13 VERDICT task 4): erasing a cluster's CANONICAL member
    leaves survivors labeled by the dead doc's id, so the default keep
    rule elects nobody; reelect_keepers=True re-elects the min LIVE
    member read-side — no stored-label mutation, untouched clusters
    keep the same answer as the default rule."""
    from hubspot_neo4j_pipeline_spark.streaming.cluster_store import (
        cluster_store_delete_batch,
        cluster_store_update_batch,
        dedup_verdicts_from_store,
    )

    store = str(tmp_path_factory.mktemp("tomb")) + "/cc"
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    cluster_store_update_batch(pairs, store, batch_id=0, compact_every=99)
    # erase the canonical member of cluster {1,2,3}
    cluster_store_delete_batch(
        spark.createDataFrame([(1,)], "doc_id long"),
        store, batch_id=1, compact_every=99,
    )
    docs = spark.createDataFrame(
        [(2,), (3,), (7,), (8,), (42,)], "doc_id long"
    )
    # default rule: the orphaned cluster has NO keeper (documented gap)
    default = {r.doc_id: (r.cluster_id, r.keep) for r in
               dedup_verdicts_from_store(docs, store).collect()}
    assert default == {
        2: (1, False), 3: (1, False), 7: (7, True), 8: (7, False),
        42: (42, True),
    }
    # re-election: min surviving member (2) keeps; labels unchanged;
    # the untouched cluster {7,8} and the out-of-store singleton 42
    # answer exactly as the default rule
    relected = {r.doc_id: (r.cluster_id, r.keep) for r in
                dedup_verdicts_from_store(
                    docs, store, reelect_keepers=True).collect()}
    assert relected == {
        2: (1, True), 3: (1, False), 7: (7, True), 8: (7, False),
        42: (42, True),
    }
    # with the canonical still live, the flag changes nothing
    fresh = str(tmp_path_factory.mktemp("tomb")) + "/cc2"
    cluster_store_update_batch(pairs, fresh, batch_id=0, compact_every=99)
    a = {(r.doc_id, r.cluster_id, r.keep) for r in
         dedup_verdicts_from_store(docs, fresh).collect()}
    b = {(r.doc_id, r.cluster_id, r.keep) for r in
         dedup_verdicts_from_store(docs, fresh, reelect_keepers=True).collect()}
    assert a == b
