"""Property-based tests (hypothesis) for the invariants the golden
tests check pointwise:

- SCD2 merge: changelog partitions the key space correctly, re-run is
  always a fixed point, live-row count equals the incoming snapshot
  size, history rows always close with valid_to = now.
- MinHash-verified Jaccard always equals exact shingle Jaccard.
- Edge diff: added ∪ removed is consistent with set difference and a
  re-diff of the result is empty.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hubspot_neo4j_pipeline_spark.operators.dedup import shingle_set
from hubspot_neo4j_pipeline_spark.operators.scd2 import (
    diff_edges,
    scd2_merge,
    with_temporal_fields,
)

T0, T1 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"

# entity snapshots: key → (name, stage) over a small closed key space
snapshot = st.dictionaries(
    st.sampled_from([f"k{i}" for i in range(8)]),
    st.tuples(st.sampled_from(["a", "b", "c"]), st.sampled_from(["x", "y"])),
    max_size=8,
)

prop_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, snap: dict):
    rows = [(k, v[0], v[1]) for k, v in sorted(snap.items())]
    return spark.createDataFrame(rows, "hubspot_id string, name string, stage string")


@prop_settings
@given(old=snapshot, new=snapshot)
def test_scd2_merge_invariants(spark, old, new):
    current = with_temporal_fields(_df(spark, old), T0)
    res = scd2_merge(current, _df(spark, new), key="hubspot_id", now=T1)

    log = {r["hubspot_id"]: r["change_type"] for r in res.changelog.collect()}
    expected = {}
    for k in set(old) | set(new):
        if k not in old:
            expected[k] = "new"
        elif k not in new:
            expected[k] = "deleted"
        elif old[k] != new[k]:
            expected[k] = "updated"
    assert log == expected

    cur = res.current.collect()
    live = [r for r in cur if r["is_current"] and not r["is_deleted"]]
    assert {r["hubspot_id"] for r in live} == set(new)
    assert all(str(r["valid_to"]).startswith("2024-02-01") for r in res.history.collect())

    # fixed point: merging the same snapshot again changes nothing
    rerun = scd2_merge(res.current, _df(spark, new), key="hubspot_id", now="2024-03-01 00:00:00")
    assert rerun.changelog.count() == 0
    assert rerun.history.count() == 0


edge_set = st.sets(
    st.tuples(st.sampled_from(["OWNED_BY", "WORKS_AT"]), st.sampled_from("abcd"), st.sampled_from("uvw")),
    max_size=10,
)


@prop_settings
@given(old=edge_set, new=edge_set)
def test_edge_diff_invariants(spark, old, new):
    schema = "rel_type string, from_id string, to_id string"
    old_df = spark.createDataFrame(sorted(old) or [("OWNED_BY", "_", "_")], schema)
    new_df = spark.createDataFrame(sorted(new) or [("OWNED_BY", "_", "_")], schema)
    old_set = old or {("OWNED_BY", "_", "_")}
    new_set = new or {("OWNED_BY", "_", "_")}

    res = diff_edges(old_df, new_df, now=T1)
    log = {
        (r["rel_type"], r["from_id"], r["to_id"]): r["change_type"]
        for r in res.changelog.collect()
    }
    assert {k for k, v in log.items() if v == "added"} == new_set - old_set
    assert {k for k, v in log.items() if v == "removed"} == old_set - new_set
    # re-diff of the produced state against itself is empty
    assert diff_edges(res.edges, new_df, now=T1).changelog.count() == 0


words = st.lists(st.sampled_from("the quick brown fox dog cat runs fast slow".split()), min_size=6, max_size=30)


names = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=0,
    max_size=40,
)


@prop_settings
@given(batch=st.lists(names, min_size=1, max_size=8))
def test_mask_name_never_leaks_past_the_kept_prefix(spark, batch):
    """For ANY name length: output length == input length, long names
    keep only first-9 + last-4, short names keep AT MOST the first 4
    chars — everything else must be '*' (ADVICE r3: no unmasked tails)."""
    from hubspot_neo4j_pipeline_spark.plans.curation_queries import mask_name

    df = spark.createDataFrame([(n,) for n in batch], "c_name string")
    out = {r["c_name"]: r["m"] for r in df.select("c_name", mask_name("c_name").alias("m")).collect()}
    for name in batch:
        masked = out[name]
        assert len(masked) == len(name)
        if len(name) >= 13:
            assert masked == name[:9] + "*" * (len(name) - 13) + name[-4:]
        else:
            keep = min(4, len(name))
            assert masked == name[:keep] + "*" * (len(name) - keep)


huge = st.integers(min_value=1, max_value=10**14)  # char masses past 2^31
buckets = st.integers(min_value=0, max_value=2**32 - 1)


@prop_settings
@given(rows=st.lists(st.tuples(buckets, huge, huge), min_size=1, max_size=12))
def test_mixture_keep_is_exact_past_int64(spark, rows):
    """keep ⇔ bucket*total < target*2^32 in TRUE integer arithmetic,
    even when the products exceed int64 (sources > 2^31 chars — the
    regime where the old BIGINT predicate silently wrapped)."""
    from hubspot_neo4j_pipeline_spark.plans.curation_queries import mixture_keep

    df = spark.createDataFrame(
        [(i, b, t, g) for i, (b, t, g) in enumerate(rows)],
        "id long, bucket long, total_chars long, target_chars long",
    )
    import pyspark.sql.functions as F

    got = {
        r["id"]: r["keep"]
        for r in df.select(
            "id",
            mixture_keep(
                F.col("bucket"), F.col("total_chars"), F.col("target_chars")
            ).alias("keep"),
        ).collect()
    }
    for i, (b, t, g) in enumerate(rows):
        assert got[i] == (b * t < g * 2**32), (b, t, g)


@prop_settings
@given(a=words, b=words)
def test_minhash_verified_jaccard_is_exact(spark, a, b):
    from hubspot_neo4j_pipeline_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame([(0, " ".join(a)), (1, " ".join(b))], ["doc_id", "text"])
    sh = {
        r["doc_id"]: set(r["s"])
        for r in docs.select("doc_id", shingle_set("text").alias("s")).collect()
    }
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.0).collect()
    if pairs:
        exact = len(sh[0] & sh[1]) / len(sh[0] | sh[1])
        assert abs(pairs[0]["jaccard"] - exact) < 1e-12


@prop_settings
@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=8)
)
def test_chunk_split_tiles_any_length(spark, n_tokens):
    """doc_chunk_split's PRODUCTION window expression (CHUNK_EXPR_SQL —
    the exact string the registered query parses) vs a Python reference
    for arbitrary token counts: window count, starts, lengths, and full
    coverage of the final token, compared per document."""
    from hubspot_neo4j_pipeline_spark.plans.curation_queries import (
        CHUNK_EXPR_SQL,
        CHUNK_STRIDE as S,
        CHUNK_TOKENS as C,
    )
    import pyspark.sql.functions as F

    rows = [(i, " ".join("t%d" % j for j in range(n))) for i, n in enumerate(n_tokens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["ch"]["chunk_idx"], r["ch"]["chunk_start"], r["ch"]["chunk_len"])
        for r in docs.select("doc_id", F.expr(CHUNK_EXPR_SQL).alias("ch")).collect()
    }
    expect = set()
    for d, n in enumerate(n_tokens):
        n_extra = (max(0, n - C) + S - 1) // S
        for i in range(n_extra + 1):
            expect.add((d, i, i * S + 1, min(C, n - i * S)))
    assert got == expect
    # every chunk length positive and the last chunk reaches token n
    for n in n_tokens:
        n_extra = (max(0, n - C) + S - 1) // S
        last_start, last_len = n_extra * S + 1, min(C, n - n_extra * S)
        assert last_len >= 1 and last_start + last_len - 1 == n


# --- deletion-neighborhood edit-distance join: randomized exactness ----

# short alphanumeric-ish strings over a tiny alphabet so collisions and
# near-matches (subs, indels, repeats) are dense
name_strings = st.lists(
    st.text(alphabet="ab1", min_size=0, max_size=6),
    min_size=2,
    max_size=10,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=name_strings, max_d=st.sampled_from([1, 2]))
def test_edit_distance_pairs_matches_naive_on_random_strings(
    spark, names, max_d
):
    """For ANY string set and distance bound, the deletion-neighborhood
    join must equal the naive all-pairs join exactly — the superset +
    verify contract, exercised over dense random repeats/indels rather
    than just the supplier-name shape."""
    from pyspark.sql import functions as F

    from hubspot_neo4j_pipeline_spark.operators.entity_match import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame(list(enumerate(names)), "id long, s string")
    a, b = df.alias("a"), df.alias("b")
    dist = F.levenshtein(F.col("a.s"), F.col("b.s"))
    naive = {
        (r.id_a, r.id_b, r.d)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .where(dist <= max_d)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), dist.alias("d")
        )
        .collect()
    }
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, "id", "s", max_distance=max_d).collect()
    }
    assert got == naive
