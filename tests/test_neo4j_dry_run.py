"""Executed round-trip tests for the Neo4j DRY-RUN sink — the
jar-free closure of the connector gap (r6 VERDICT task 6).

The dry-run emits the exact batched UNWIND/MERGE parameter payloads
the reference sends over bolt (loaders/neo4j_loader.py:80-162,
config/settings.py:59 BATCH_SIZE=100). These tests pin:
- batch boundaries (100-row batches, remainder last) against a pure
  Python re-enactment of the reference's `range(0, len, BATCH_SIZE)`
  slicing over the same deterministic order;
- per-(from_type, rel_type, to_type) grouping, key text
  `{from}_{type}_{to}` exactly as neo4j_loader.py:110 builds it;
- the email-matched MATCH branch selection (:126-128);
- the statement texts (node :92-97, standard edge :130-143, email
  edge :148-162);
- a full write → read-back → reconstruct round-trip through the JSON
  sink, proving no row is lost or duplicated.
"""

from __future__ import annotations

import json

import pytest

from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
    dry_run_edge_payloads,
    dry_run_node_payloads,
    edge_merge_cypher,
    node_upsert_cypher,
    write_dry_run,
)


def _node_rows(n):
    return [(i, f"user{i}@example.com", f"Name {i}") for i in range(n)]


def test_node_batching_matches_reference_slicing(spark):
    df = spark.createDataFrame(
        _node_rows(250), "hubspot_id int, email string, name string"
    )
    out = dry_run_node_payloads(df, "HUBSPOT_Contact").orderBy("batch_id").collect()
    # reference: range(0, 250, 100) -> batches of 100, 100, 50
    assert [r["n_nodes"] for r in out] == [100, 100, 50]
    assert [r["batch_id"] for r in out] == [0, 1, 2]
    for r in out:
        assert r["label"] == "HUBSPOT_Contact"
        assert r["cypher"] == (
            "UNWIND $nodes AS node "
            "MERGE (n:HUBSPOT_Contact {hubspot_id: node.hubspot_id}) "
            "SET n = node"
        )
    # batch membership is key order: batch 0 = ids 0..99, etc.
    parsed = [json.loads(r["params_json"]) for r in out]
    assert [n["hubspot_id"] for n in parsed[0]] == list(range(100))
    assert [n["hubspot_id"] for n in parsed[2]] == list(range(200, 250))
    # every input row appears exactly once across batches, fields intact
    flat = [n for batch in parsed for n in batch]
    assert len(flat) == 250
    assert flat[7] == {
        "hubspot_id": 7,
        "email": "user7@example.com",
        "name": "Name 7",
    }


def test_node_payloads_dedup_on_key_and_custom_labels(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "hubspot_id int, email string"
    )
    out = dry_run_node_payloads(
        df, "HUBSPOT_Company", custom_labels=("Acme", "Priority")
    ).collect()
    assert len(out) == 1 and out[0]["n_nodes"] == 2  # MERGE-idempotent input
    # custom label SET prefix, exactly the reference's layout (:85,96)
    assert out[0]["cypher"] == (
        "UNWIND $nodes AS node "
        "MERGE (n:HUBSPOT_Company {hubspot_id: node.hubspot_id}) "
        "SET n:Acme, n:Priority, n = node"
    )
    assert node_upsert_cypher("X", "url") == (
        "UNWIND $nodes AS node MERGE (n:X {url: node.url}) SET n = node"
    )


EDGE_SCHEMA = (
    "rel_type string, from_type string, to_type string, "
    "from_id string, from_email string, to_id string, "
    "properties map<string,string>"
)


def _edge_rows():
    rows = [
        # 120 standard WORKS_AT edges -> 2 batches in one group
        (
            "WORKS_AT",
            "HUBSPOT_Contact",
            "HUBSPOT_Company",
            f"c{i:03d}",
            None,
            f"co{i:03d}",
            {"since": str(2000 + i % 20)},
        )
        for i in range(120)
    ]
    # 5 email-matched PERFORMED edges (S14): no from_id, only from_email
    rows += [
        (
            "PERFORMED",
            "HUBSPOT_Contact",
            "HUBSPOT_EmailOpenEvent",
            None,
            f"user{i}@example.com",
            f"ev{i}",
            {},
        )
        for i in range(5)
    ]
    # 3 BELONGS_TO edges, a second standard group
    rows += [
        ("BELONGS_TO", "HUBSPOT_Deal", "HUBSPOT_Company", f"d{i}", None, f"co{i}", {})
        for i in range(3)
    ]
    return rows


def test_edge_grouping_batching_and_branch_selection(spark):
    df = spark.createDataFrame(_edge_rows(), EDGE_SCHEMA)
    out = dry_run_edge_payloads(df).orderBy("group_key", "batch_id").collect()

    # reference grouping key text (neo4j_loader.py:110)
    groups = {}
    for r in out:
        groups.setdefault(r["group_key"], []).append(r)
    assert set(groups) == {
        "HUBSPOT_Contact_WORKS_AT_HUBSPOT_Company",
        "HUBSPOT_Contact_PERFORMED_HUBSPOT_EmailOpenEvent",
        "HUBSPOT_Deal_BELONGS_TO_HUBSPOT_Company",
    }

    # batch slicing per group, as range(0, len, 100) would produce
    wa = groups["HUBSPOT_Contact_WORKS_AT_HUBSPOT_Company"]
    assert [r["n_rels"] for r in wa] == [100, 20]
    assert all(not r["email_matched"] for r in wa)
    assert wa[0]["cypher"] == edge_merge_cypher(
        "WORKS_AT", "HUBSPOT_Contact", "HUBSPOT_Company"
    )
    assert wa[0]["cypher"] == (
        "UNWIND $rels AS rel "
        "MATCH (a:HUBSPOT_Contact {hubspot_id: rel.from_id}) "
        "MATCH (b:HUBSPOT_Company {hubspot_id: rel.to_id}) "
        "MERGE (a)-[r:WORKS_AT]->(b) SET r = rel.properties"
    )

    # email group routes to the email-matched MATCH (:126-128,148-162)
    pf = groups["HUBSPOT_Contact_PERFORMED_HUBSPOT_EmailOpenEvent"]
    assert len(pf) == 1 and pf[0]["n_rels"] == 5 and pf[0]["email_matched"]
    assert pf[0]["cypher"] == edge_merge_cypher(
        "PERFORMED", "HUBSPOT_Contact", "HUBSPOT_EmailOpenEvent", email_matched=True
    )
    assert "MATCH (a:HUBSPOT_Contact {email: rel.from_email})" in pf[0]["cypher"]

    # payload dicts carry the reference's rel-dict fields
    rels = json.loads(pf[0]["params_json"])
    assert {r["from_email"] for r in rels} == {
        f"user{i}@example.com" for i in range(5)
    }
    assert all(r["type"] == "PERFORMED" and "from_id" not in r for r in rels)


def test_edge_payload_roundtrip_through_json_sink(spark, tmp_path):
    df = spark.createDataFrame(_edge_rows(), EDGE_SCHEMA)
    path = str(tmp_path / "dryrun")
    write_dry_run(dry_run_edge_payloads(df), path)
    back = spark.read.json(path)
    stmts = back.collect()
    assert len(stmts) == 4  # 2 + 1 + 1 batches
    # reconstruct every rel from the replayable payloads: nothing lost,
    # nothing duplicated, properties intact
    rebuilt = []
    for s in stmts:
        for rel in json.loads(s["params_json"]):
            rebuilt.append(
                (
                    rel["type"],
                    rel["from_type"],
                    rel["to_type"],
                    rel.get("from_id"),
                    rel.get("from_email"),
                    rel["to_id"],
                    rel.get("properties", {}),
                )
            )
    expect = {
        (rt, ft, tt, fi, fe, ti, tuple(sorted((p or {}).items())))
        for rt, ft, tt, fi, fe, ti, p in _edge_rows()
    }
    got = {
        (rt, ft, tt, fi, fe, ti, tuple(sorted((p or {}).items())))
        for rt, ft, tt, fi, fe, ti, p in rebuilt
    }
    assert got == expect and len(rebuilt) == 128


def test_edge_frame_requires_a_source_key(spark):
    df = spark.createDataFrame(
        [("X", "A", "B", "t1")], "rel_type string, from_type string, to_type string, to_id string"
    )
    with pytest.raises(ValueError, match="from_id or from_email"):
        dry_run_edge_payloads(df)


# ---------------------------------------------------------------------------
# r8: _with_batch_ids sub-key hardening (r7 VERDICT task 2 + ADVICE).
# The two-phase exact rank only parallelizes if the sub-key actually
# splits each group; a constant id prefix (every real HubSpot export:
# "contact_0000123") used to collapse everything into one sub-bucket.
# ---------------------------------------------------------------------------


def test_constant_prefix_ids_still_fan_out_and_batch_exactly(spark):
    """Ids f"contact_{i:07d}" share an 12-char constant prefix; the
    lcp strip must yield >1 sub-bucket (the rank stage's parallelism
    bound) while payload bytes stay identical to the reference's
    sorted range(0, n, 100) slicing."""
    from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import _subkeyed

    n = 500
    df = spark.createDataFrame(
        [(f"contact_{i:07d}", f"u{i}@example.com") for i in range(n)],
        "hubspot_id string, email string",
    )
    # parallelism: the sub-key is the rank window's partition key, so
    # distinct _pfx IS the task-count bound for the rank stage
    pfx = (
        _subkeyed(df, [], ["hubspot_id"], 100)
        .select("_pfx")
        .distinct()
        .count()
    )
    assert pfx > 1, "constant-prefix ids collapsed into one rank task"

    out = (
        dry_run_node_payloads(df, "HUBSPOT_Contact")
        .orderBy("batch_id")
        .collect()
    )
    assert [r["n_nodes"] for r in out] == [100, 100, 100, 100, 100]
    ids = sorted(f"contact_{i:07d}" for i in range(n))
    for b, r in enumerate(out):
        batch = json.loads(r["params_json"])
        assert [x["hubspot_id"] for x in batch] == ids[b * 100 : (b + 1) * 100]
        # byte-determinism: payload text equals the json built from the
        # sorted slice directly
        assert r["params_json"] == (
            "["
            + ",".join(
                json.dumps(
                    {
                        "hubspot_id": i,
                        "email": f"u{int(i[8:])}@example.com",
                    },
                    separators=(",", ":"),
                )
                for i in ids[b * 100 : (b + 1) * 100]
            )
            + "]"
        )


def test_null_order_key_rows_batch_first_instead_of_vanishing(spark):
    """A null to_id row used to get a null _pfx and fall out of the
    inner offsets equi-join; the null-safe join must keep it, batched
    ahead of everything (Spark NULLS FIRST)."""
    rows = [
        ("WORKS_AT", "HUBSPOT_Contact", "HUBSPOT_Company", f"c{i}", None, f"co{i:03d}", {})
        for i in range(150)
    ] + [("WORKS_AT", "HUBSPOT_Contact", "HUBSPOT_Company", "cX", None, None, {})]
    df = spark.createDataFrame(rows, EDGE_SCHEMA)
    out = dry_run_edge_payloads(df).orderBy("batch_id").collect()
    assert [r["n_rels"] for r in out] == [100, 51]
    assert sum(r["n_rels"] for r in out) == 151, "null-key row was dropped"
    first_batch = json.loads(out[0]["params_json"])
    assert first_batch[0]["from_id"] == "cX" and "to_id" not in first_batch[0]


def test_non_string_non_integer_batch_key_raises(spark):
    """Float/decimal keys cast to string order '9.5' after '10.5',
    silently corrupting batch boundaries — must raise instead."""
    df = spark.createDataFrame(
        [(1.5, "a"), (10.5, "b")], "hubspot_id double, email string"
    )
    with pytest.raises(ValueError, match="only integer, string, and date/timestamp"):
        dry_run_node_payloads(df, "X")


def test_duplicate_keys_with_conflicting_properties_pick_min_json(spark):
    """dropDuplicates' survivor is partition-order dependent; the sink
    must pick the min-serialization representative so payload bytes
    are a pure function of the data (ADVICE r7)."""
    rows = [(1, "zzz@example.com"), (1, "aaa@example.com"), (2, "b@example.com")]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, "hubspot_id int, email string").repartition(4)
        out = dry_run_node_payloads(df, "X").collect()
        assert len(out) == 1 and out[0]["n_nodes"] == 2
        batch = json.loads(out[0]["params_json"])
        assert [x["email"] for x in batch] == ["aaa@example.com", "b@example.com"]


def test_temporal_payloads_match_reference_statements(spark):
    """The r9 replay-gap closure: updated items emit the exact
    history-snapshot + node-update statement PAIR and deleted items
    the exact soft-delete statement of the reference temporal loader
    (loaders/temporal_loader.py:157-266), per-item params included,
    chunked like its tqdm loops (BATCH_SIZE items per chunk, key
    order)."""
    from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
        dry_run_temporal_payloads,
        temporal_delete_cypher,
        temporal_history_cypher,
        temporal_update_cypher,
    )

    incoming = spark.createDataFrame(
        [(i, f"c{i}", 10.0 * i) for i in range(1, 8)],
        "hubspot_id int, name string, amount double",
    )
    classified = spark.createDataFrame(
        [
            (1, "updated"), (2, "unchanged"), (3, "updated"), (4, "new"),
            (5, "updated"), (9, "deleted"), (10, "deleted"),
        ],
        "hubspot_id int, change_type string",
    )
    out = dry_run_temporal_payloads(
        incoming, classified, "HUBSPOT_Deal", valid_to="2024-06-01T00:00:00",
        batch_size=2,
    ).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    for k in by_kind:
        by_kind[k].sort(key=lambda r: (r["batch_id"], r["hubspot_id"]))

    # updated items 1,3,5 -> history + update each; batches of 2 items
    assert [r["hubspot_id"] for r in by_kind["history_snapshot"]] == ["1", "3", "5"]
    assert [r["batch_id"] for r in by_kind["history_snapshot"]] == [0, 0, 1]
    assert [r["hubspot_id"] for r in by_kind["update_node"]] == ["1", "3", "5"]
    assert [r["batch_id"] for r in by_kind["update_node"]] == [0, 0, 1]
    # deleted items 9,10 (absent from incoming by construction)
    assert [r["hubspot_id"] for r in by_kind["mark_deleted"]] == ["10", "9"]
    assert [r["batch_id"] for r in by_kind["mark_deleted"]] == [0, 0]
    assert set(by_kind) == {"history_snapshot", "update_node", "mark_deleted"}

    # exact statement texts (reference temporal_loader.py:170-182,
    # :192-216, :241-255)
    h = by_kind["history_snapshot"][0]
    assert h["cypher"] == temporal_history_cypher("HUBSPOT_Deal") == (
        "MATCH (n:HUBSPOT_Deal {hubspot_id: $hubspot_id}) "
        "CREATE (h:HUBSPOT_Deal_HISTORY) "
        "SET h = properties(n), h.valid_to = $valid_to "
        "WITH n, h CREATE (n)-[:HAS_HISTORY]->(h)"
    )
    assert json.loads(h["params_json"]) == {
        "hubspot_id": "1", "valid_to": "2024-06-01T00:00:00"
    }
    u = by_kind["update_node"][1]
    assert u["cypher"] == temporal_update_cypher("HUBSPOT_Deal") == (
        "MATCH (n:HUBSPOT_Deal {hubspot_id: $hubspot_id}) SET n = $new_data"
    )
    assert json.loads(u["params_json"]) == {
        "hubspot_id": "3",
        "new_data": {"hubspot_id": 3, "name": "c3", "amount": 30.0},
    }
    d = by_kind["mark_deleted"][1]
    assert d["cypher"] == temporal_delete_cypher("HUBSPOT_Deal") == (
        "MATCH (n:HUBSPOT_Deal {hubspot_id: $hubspot_id}) "
        "WHERE n.is_deleted IS NULL OR n.is_deleted = false "
        "CREATE (h:HUBSPOT_Deal_HISTORY) "
        "SET h = properties(n), h.valid_to = $valid_to "
        "WITH n, h CREATE (n)-[:HAS_HISTORY]->(h) "
        "WITH n SET n.is_deleted = true, n.valid_to = $valid_to, "
        "n.is_current = false"
    )
    assert json.loads(d["params_json"]) == {
        "hubspot_id": "9", "valid_to": "2024-06-01T00:00:00"
    }


def test_temporal_payloads_user_archived_branch(spark):
    """The User variant toggles :Archived from the $archived param
    (temporal_loader.py:196-209) — FOREACH add AND remove arms."""
    from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
        dry_run_temporal_payloads,
    )

    incoming = spark.createDataFrame(
        [(1, "u1", True), (2, "u2", False), (3, "u3", None)],
        "hubspot_id int, name string, archived boolean",
    )
    classified = spark.createDataFrame(
        [(1, "updated"), (2, "updated"), (3, "updated")],
        "hubspot_id int, change_type string",
    )
    upd = {
        r["hubspot_id"]: r
        for r in dry_run_temporal_payloads(
            incoming, classified, "HUBSPOT_User",
            valid_to="2024-06-01T00:00:00", archived_label=True,
        ).where("kind = 'update_node'").collect()
    }
    cy = upd["1"]["cypher"]
    assert "FOREACH (_ IN CASE WHEN $archived = true THEN [1] ELSE [] END | SET n:Archived)" in cy
    assert "FOREACH (_ IN CASE WHEN $archived = false THEN [1] ELSE [] END | REMOVE n:Archived)" in cy
    assert json.loads(upd["1"]["params_json"])["archived"] is True
    assert json.loads(upd["2"]["params_json"])["archived"] is False
    # NULL archived folds to false, matching dict.get('archived', False)
    assert json.loads(upd["3"]["params_json"])["archived"] is False


def test_temporal_and_null_group_batching_keys(spark):
    """r9 (r8 ADVICE): date/timestamp batching keys are accepted again
    (ISO text order == temporal order), and a NULL value in a GROUP
    column must not vanish through the lcp/offset joins — both now
    eqNullSafe."""
    import datetime as dt

    from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
        _with_batch_ids,
    )

    # timestamp key: 250 rows, batch=100 -> ranks follow time order
    ts = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),) for i in range(250)],
        "t timestamp",
    )
    out = _with_batch_ids(ts, [], ["t"], 100).groupBy("batch_id").count()
    assert {(r["batch_id"], r["count"]) for r in out.collect()} == {
        (0, 100), (1, 100), (2, 50)
    }
    # batch membership respects time order exactly
    b_of = {
        r["t"]: r["batch_id"]
        for r in _with_batch_ids(ts, [], ["t"], 100).collect()
    }
    for i, t in enumerate(sorted(b_of)):
        assert b_of[t] == i // 100

    # NULL group value: rows keep flowing and batch within their group
    g = spark.createDataFrame(
        [(None, f"k{i:03d}") for i in range(5)]
        + [("g1", f"k{i:03d}") for i in range(7)],
        "grp string, k string",
    )
    got = _with_batch_ids(g, ["grp"], ["k"], 3)
    assert got.count() == 12  # nothing vanished
    per = {
        (r["grp"], r["batch_id"]): r["count"]
        for r in got.groupBy("grp", "batch_id").count().collect()
    }
    assert per == {(None, 0): 3, (None, 1): 2, ("g1", 0): 3, ("g1", 1): 3, ("g1", 2): 1}


def test_relationship_change_payloads_match_reference_statements(spark):
    """The r10 closure of the LAST dry-run statement family
    (loaders/temporal_loader.py:401-462): added and removed changes
    each CREATE batched :HUBSPOT_RelationshipChange audit nodes, and
    every removed batch ALSO emits the edge UNWIND-DELETE sharing its
    batch_id — statement texts, params, chunk boundaries, and the
    $timestamp parameter all pinned."""
    from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
        dry_run_relationship_change_payloads,
        relationship_change_cypher,
        relationship_delete_cypher,
    )

    changelog = spark.createDataFrame(
        [
            ("added", "OWNS", "HUBSPOT_Contact", "c1", "HUBSPOT_Deal", "d1"),
            ("added", "OWNS", "HUBSPOT_Contact", "c2", "HUBSPOT_Deal", "d2"),
            ("added", "OWNS", "HUBSPOT_Contact", "c3", "HUBSPOT_Deal", "d3"),
            ("removed", "OWNS", "HUBSPOT_Contact", "c1", "HUBSPOT_Deal", "d9"),
            ("removed", "PLACED_BY", "HUBSPOT_Deal", "d4", "HUBSPOT_Contact", "c4"),
        ],
        "change_type string, rel_type string, from_type string, "
        "from_id string, to_type string, to_id string",
    )
    ts = "2024-06-01T00:00:00"
    out = dry_run_relationship_change_payloads(
        changelog, timestamp=ts, batch_size=2
    ).collect()
    by = {}
    for r in out:
        by.setdefault((r["change_type"], r["kind"]), []).append(r)
    for k in by:
        by[k].sort(key=lambda r: r["batch_id"])
    assert set(by) == {
        ("added", "change_create"),
        ("removed", "change_create"),
        ("removed", "edge_delete"),
    }

    # added: 3 changes in batches of 2 -> sizes [2, 1], create only
    adds = by[("added", "change_create")]
    assert [(r["batch_id"], r["n_changes"]) for r in adds] == [(0, 2), (1, 1)]
    assert all(r["cypher"] == relationship_change_cypher("added") for r in adds)
    assert all(r["timestamp"] == ts for r in adds)
    first = json.loads(adds[0]["params_json"])
    assert first == [
        {
            "from_type": "HUBSPOT_Contact", "from_id": "c1",
            "to_type": "HUBSPOT_Deal", "to_id": "d1",
            "type": "OWNS", "properties": {},
        },
        {
            "from_type": "HUBSPOT_Contact", "from_id": "c2",
            "to_type": "HUBSPOT_Deal", "to_id": "d2",
            "type": "OWNS", "properties": {},
        },
    ]

    # removed: ONE chunk of 2 -> audit CREATE + edge DELETE, same
    # batch_id and identical $changes payload (reference runs both
    # statements per batch, :422-433)
    rc = by[("removed", "change_create")]
    rd = by[("removed", "edge_delete")]
    assert len(rc) == 1 and len(rd) == 1
    assert rc[0]["batch_id"] == rd[0]["batch_id"] == 0
    assert rc[0]["params_json"] == rd[0]["params_json"]
    assert rc[0]["timestamp"] == ts and rd[0]["timestamp"] is None
    # deterministic chunk order is (rel_type, from_id, to_id)
    assert [c["type"] for c in json.loads(rc[0]["params_json"])] == [
        "OWNS", "PLACED_BY"
    ]

    # exact statement texts (temporal_loader.py:408-419, :422-429,
    # :437-456 — change_type inlined as a literal there too)
    assert rc[0]["cypher"] == relationship_change_cypher("removed") == (
        "UNWIND $changes AS change "
        "CREATE (rc:HUBSPOT_RelationshipChange {change_type: 'removed', "
        "from_entity_type: change.from_type, "
        "from_entity_id: change.from_id, "
        "to_entity_type: change.to_type, "
        "to_entity_id: change.to_id, "
        "relationship_type: change.type, "
        "relationship_properties: change.properties, "
        "changed_at: $timestamp})"
    )
    assert adds[0]["cypher"].replace("'added'", "'removed'") == rc[0]["cypher"]
    assert rd[0]["cypher"] == relationship_delete_cypher() == (
        "UNWIND $changes AS change "
        "MATCH (a {hubspot_id: change.from_id})-[r]->"
        "(b {hubspot_id: change.to_id}) "
        "WHERE type(r) = change.type DELETE r"
    )

    # a changelog without endpoint types / properties still emits
    # (NULL entity types, empty property map), and a bad change_type
    # in the cypher builder raises
    bare = dry_run_relationship_change_payloads(
        changelog.select("change_type", "rel_type", "from_id", "to_id"),
        timestamp=ts,
    ).collect()
    row = json.loads(
        [r for r in bare if r["change_type"] == "added"][0]["params_json"]
    )[0]
    assert row["properties"] == {} and "from_type" not in row  # NULL omitted
    with pytest.raises(ValueError):
        relationship_change_cypher("mutated")
    with pytest.raises(ValueError):
        dry_run_relationship_change_payloads(
            changelog.drop("to_id"), timestamp=ts
        )
