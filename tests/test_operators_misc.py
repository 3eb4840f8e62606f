"""Sinks, entity matching, multimodal plumbing, introspection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.entity_match import (
    MatchStage,
    match_users_to_persons,
    staged_match,
)
from hubspot_neo4j_pipeline_spark.operators.introspect import describe_tables
from hubspot_neo4j_pipeline_spark.operators.multimodal import (
    decode_payload,
    extract_features,
)
from hubspot_neo4j_pipeline_spark.operators.sinks import (
    to_table_string,
    upsert_nodes,
    write_csv,
    write_json,
)


def test_staged_match_guard(spark):
    """Email fallback only fires for users the linkedin stage missed
    (entity_matcher.py:54-84 anti-join guard)."""
    users = spark.createDataFrame(
        [
            ("u1", "li/alice", "alice@x.com"),
            ("u2", "", "bob@x.com"),
            ("u3", "li/unknown", "carol@x.com"),
            ("u4", "", "nomatch@x.com"),
        ],
        ["hubspot_id", "linkedin_url", "email"],
    )
    persons = spark.createDataFrame(
        [
            ("p1", "li/alice", "alice-other@x.com"),
            ("p2", "", "bob@x.com"),
            ("p3", "", "carol@x.com"),
            ("p4", "li/alice", "alice@x.com"),  # would also match u1 by email
        ],
        ["person_id", "linkedin_url", "email"],
    )
    out = {r["hubspot_id"]: r for r in match_users_to_persons(users, persons).collect()}
    assert out["u1"]["match_type"] == "linkedin_url" and out["u1"]["person_id"] == "p1"
    assert out["u2"]["match_type"] == "email" and out["u2"]["person_id"] == "p2"
    assert out["u3"]["match_type"] == "email" and out["u3"]["person_id"] == "p3"
    assert "u4" not in out


def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    write_csv(df, str(tmp_path / "csv"))
    write_json(df, str(tmp_path / "json"))
    back_csv = spark.read.option("header", "true").csv(str(tmp_path / "csv"))
    back_json = spark.read.json(str(tmp_path / "json"))
    assert back_csv.count() == 2 and back_json.count() == 2
    assert set(back_json.columns) == {"k", "v"}


def test_upsert_nodes_dedups_on_key(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["hubspot_id", "x"]
    )
    upsert_nodes(df, str(tmp_path / "nodes"))
    back = spark.read.parquet(str(tmp_path / "nodes"))
    assert back.count() == 2  # MERGE idempotency (D3)


def test_table_formatter_truncates(spark):
    df = spark.createDataFrame([("x" * 100,)], ["long_col"])
    s = to_table_string(df, max_width=20)
    assert "..." in s and "x" * 30 not in s


def test_multimodal_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(docs)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = {x["doc_id"]: x for x in rows}
    docs_pd = {x["doc_id"]: x for x in docs.collect()}
    some = list(r)[0]
    assert r[some]["n_bytes"] == len(docs_pd[some]["text"].encode())
    assert r[some]["mime"] == "text/plain"
    assert len(r[some]["content_digest"]) == 16
    # deterministic across runs
    rows2 = {x["doc_id"]: x["checksum"] for x in extract_features(docs).collect()}
    assert all(rows2[k] == v["checksum"] for k, v in r.items())


def test_decode_payload_codec_gated():
    """Formats needing external codec libs stay honestly gated; text
    passes through as a real byte-level decode."""
    with pytest.raises(NotImplementedError):
        decode_payload(b"bytes", "image/png")
    d = decode_payload(b"abc", "text/plain")
    assert d["n_units"] == 3 and d["unit_sum"] == ord("a") + ord("b") + ord("c")


def test_describe_tables(spark):
    t = {"t1": spark.createDataFrame([(1,)], ["a"])}
    out = describe_tables(spark, t).collect()
    assert out[0]["table_name"] == "t1"
    assert out[0]["n_columns"] == 1 and out[0]["n_rows"] == 1


def test_edit_distance_pairs_equals_naive_join(spark):
    """Deletion-neighborhood candidates are a provably-exact superset:
    the verified output must be BIT-IDENTICAL to the naive within-block
    all-pairs join (the contract that lets fuzzy_name_pairs keep its
    plain-SQL oracle while scaling linearly). sf0.01 explicitly — the
    sf0.001 supplier table has no lev<=2 pairs to compare."""
    from hubspot_neo4j_pipeline_spark.operators.entity_match import (
        edit_distance_pairs,
    )

    sup = spark.read.parquet("/root/testdata/sf0.01/supplier.parquet").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    a, b = sup.alias("a"), sup.alias("b")
    dist = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
    naive = {
        (r.id_a, r.id_b, r.d)
        for r in a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .where(dist <= 2)
        .select(
            F.col("a.s_suppkey").alias("id_a"),
            F.col("b.s_suppkey").alias("id_b"),
            dist.alias("d"),
        )
        .collect()
    }
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(
            sup, "s_suppkey", "s_name", block_col="s_nationkey"
        ).collect()
    }
    assert got == naive and naive


def test_edit_distance_pairs_indel_and_unblocked(spark):
    """Insert/delete pairs (not just substitutions) are found, and the
    blockless path works: lev('abcdef','abdef')=1 (delete),
    lev('abcdef','xbcdefy')=2 (two inserts), lev('abcdef','abcxyz')=3
    (excluded at max_distance=2)."""
    from hubspot_neo4j_pipeline_spark.operators.entity_match import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abdef"), (3, "xbcdefy"), (4, "abcxyz")],
        "id long, name string",
    )
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, "id", "name").collect()
    }
    assert (1, 2, 1) in got
    assert (1, 3, 2) in got
    assert all(4 not in (p[0], p[1]) for p in got)
