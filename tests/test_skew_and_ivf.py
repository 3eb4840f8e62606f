"""Salted-join / two-phase-distinct equivalence and IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_seeds,
    ivf_topk,
)
from hubspot_neo4j_pipeline_spark.operators.skew import (
    salted_join,
    two_phase_count_distinct,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows hit key 0 (hot), the rest spread over 1..9
    rows = [(i % 10 if i % 10 > 0 and i % 3 == 0 else 0, i) for i in range(3000)]
    fact = spark.createDataFrame(rows, ["k", "payload"])
    dim = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], ["k", "name"])
    return fact, dim


def test_salted_join_equals_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").groupBy("k", "name").agg(F.count("*").alias("n"))
    salted = salted_join(fact, dim, "k").groupBy("k", "name").agg(F.count("*").alias("n"))
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_outer(skewed):
    fact, dim = skewed
    dim_partial = dim.where("k < 5")
    plain = fact.join(dim_partial, "k", "left").where("name IS NULL").count()
    salted = salted_join(fact, dim_partial, "k", how="left").where("name IS NULL").count()
    assert plain == salted


def test_two_phase_count_distinct(skewed):
    fact, _ = skewed
    df = fact.withColumn("v", F.col("payload") % 50)
    expect = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {r["k"]: r["n_distinct"] for r in two_phase_count_distinct(df, "k", "v").collect()}
    assert got == expect


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_assignment_covers_corpus(emb):
    seeds = ivf_seeds(emb)
    assert seeds.count() == 10  # one per label
    assigned = ivf_assign(emb, seeds, n_probe=1)
    assert assigned.count() == emb.count()
    assert assigned.select("cell").distinct().count() <= 10


def test_ivf_recall_vs_brute_force(emb):
    k = 10
    q = emb.where("vec_id < 20").select(F.col("vec_id").alias("query_id"), "embedding")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=k).collect()
    }
    approx = ivf_topk(emb, k=k, n_probe=3, n_queries=20).collect()
    pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & pairs) / len(truth)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    for qid in {r["query_id"] for r in approx}:
        ranks = sorted(r["rank"] for r in approx if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_kmeans_seeds_at_least_match_minid_recall(emb):
    """Trained centroids (Lloyd's, 2 rounds) must not lose recall vs
    the min-id demo seeds — the documented production path for IVF."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import kmeans_seeds

    k = 10
    q = emb.where("vec_id < 20").select(F.col("vec_id").alias("query_id"), "embedding")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=k).collect()
    }

    def recall(seeds):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, k=k, n_probe=3, n_queries=20, seeds=seeds).collect()
        }
        return len(truth & got) / len(truth)

    trained = kmeans_seeds(emb, iters=2)
    assert trained.count() == 10  # k preserved (empty cells keep old centroid)
    base_recall = recall(None)
    trained_recall = recall(trained)
    assert trained_recall >= base_recall, (trained_recall, base_recall)


def test_kmeans_round_is_one_corpus_pass(spark, emb, monkeypatch):
    """r4 VERDICT: each Lloyd's round must materialize exactly ONE
    distributed lineage (the means collect) — centroids ride between
    rounds as plain Python, so no second collect re-executes the prior
    round's lineage. Init (min-id seeds) is one additional collect.
    (Raw Spark job counts don't work as the metric: AQE runs one job
    per shuffle stage, so a single action is several jobs.)"""
    try:  # pyspark 4: the concrete class overrides the abstract base
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    from hubspot_neo4j_pipeline_spark.operators.similarity import kmeans_seeds

    calls = []
    orig = DataFrame.collect

    def counted(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counted)
    kmeans_seeds(emb, iters=3)
    # 1 init + 3 rounds; a 4th-round-style double collect would give 7
    assert len(calls) == 4, f"expected 4 collects for 3 rounds, got {len(calls)}"


def test_embedding_near_dup_pairs(emb):
    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    pairs = embedding_near_dup_pairs(emb, threshold=0.4).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert all(r["cosine"] >= 0.4 for r in pairs)
    # symmetric determinism: re-run produces the identical pair set
    again = embedding_near_dup_pairs(emb, threshold=0.4).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {
        (r["id_a"], r["id_b"]) for r in again
    }


def test_near_dup_in_bucket_verify_bit_equals_reattach_path(emb):
    """The r9 in-bucket cosine verify (capped path: vectors ride the
    bucket groupBy, passing pairs only leave the bucket) must be
    BIT-identical — ids and cosine doubles — to the r8 id-only +
    re-attach path (uncapped), on a corpus where the cap never binds
    so both paths see the same candidate set."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    def rows(max_bucket_df):
        return sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_dup_pairs(
                emb, threshold=0.4, max_bucket_df=max_bucket_df
            ).collect()
        )

    capped = rows(4096)  # in-bucket scored expansion
    uncapped = rows(None)  # bucket_self_pairs + re-attach joins
    assert capped == uncapped and capped  # exact doubles, not approx


def test_arrow_cosine_kernel_bit_equals_expression_kernel(emb):
    """The r11 Arrow-vectorized in-bucket verify (numpy accumulation,
    vectorized across pairs but SEQUENTIAL across dims — the exact op
    tree of the SQL fold) must be BIT-identical — ids and cosine
    doubles — to the r9 in-expression kernel on the same capped path,
    including the deterministic 1/8 bucket slice."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    def rows(use_arrow, bucket_slice=None):
        return sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_dup_pairs(
                emb,
                threshold=0.4,
                max_bucket_df=1024,
                bucket_slice=bucket_slice,
                use_arrow=use_arrow,
            ).collect()
        )

    assert rows(True) == rows(False) and rows(True)
    assert rows(True, (8, 0)) == rows(False, (8, 0))


def test_arrow_lsh_bucket_build_bit_equals_expression_build(emb):
    """The r11 Arrow bucket build (numpy sign-bit folds, sequential
    across dims) must assign every vector the IDENTICAL (table_id,
    bucket) set as the in-expression broadcast projection — a single
    borderline sign flip would change a bucket and the candidate set.
    n_vectors is pinned above the size gate so the Arrow path runs;
    planes_per_table is explicit so the gate value cannot change the
    plane count."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        ARROW_BUILD_MIN_VECTORS,
        lsh_buckets,
    )

    def rows(use_arrow):
        return sorted(
            (r["vec_id"], r["table_id"], r["bucket"])
            for r in lsh_buckets(
                emb,
                "vec_id",
                "embedding",
                n_tables=8,
                planes_per_table=4,
                n_vectors=ARROW_BUILD_MIN_VECTORS,  # force the Arrow path
                use_arrow=use_arrow,
            ).collect()
        )

    a, b = rows(True), rows(False)
    assert a == b and a


def test_kmeans_seeds_quantized_matches_pure_python_reenactment(emb):
    """The fixed-point one-round trainer (the oracle-exact path behind
    ann_ivf_topk_trained) is deterministic integer arithmetic, so a
    pure-Python re-enactment of the algorithm — quantize by
    floor(x*2^20), integer-L2 assign to min-id seeds (ties → lowest
    cell), per-cell sums, floor-division mean — must reproduce every
    centroid EXACTLY. Also pins the recall floor: trained centroids
    (cast back to double) must not lose IVF recall vs min-id seeds."""
    import math

    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        QUANT_OFF,
        QUANT_SCALE,
        kmeans_seeds_quantized,
    )

    rows = emb.select("vec_id", "label", "embedding").collect()
    xi = {
        r["vec_id"]: [int(math.floor(float(x) * QUANT_SCALE)) for x in r["embedding"]]
        for r in rows
    }
    label = {r["vec_id"]: r["label"] for r in rows}
    cells = sorted({r["label"] for r in rows})
    seed_id = {c: min(v for v in xi if label[v] == c) for c in cells}
    si = {c: xi[seed_id[c]] for c in cells}

    def d2(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    members: dict[int, list[int]] = {c: [] for c in cells}
    for v, vec in xi.items():
        best = min(cells, key=lambda c: (d2(vec, si[c]), c))
        members[best].append(v)
    expect = {}
    for c in cells:
        if not members[c]:
            expect[c] = si[c]  # empty cell keeps its seed
            continue
        n = len(members[c])
        expect[c] = [
            (sum(xi[v][j] for v in members[c]) + n * QUANT_OFF) // n - QUANT_OFF
            for j in range(len(si[c]))
        ]

    got = {r["cell"]: list(r["ci"]) for r in kmeans_seeds_quantized(emb).collect()}
    assert got == expect

    # recall: trained fixed-point centroids (cast back to double) must
    # not lose recall vs the min-id seeds
    k = 10
    q = emb.where("vec_id < 20").select(F.col("vec_id").alias("query_id"), "embedding")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=k).collect()
    }
    seeds_q = kmeans_seeds_quantized(emb).select(
        "cell", F.expr(f"transform(ci, x -> cast(x as double) / {QUANT_SCALE})").alias("se")
    )

    def recall(seeds):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, k=k, n_probe=3, n_queries=20, seeds=seeds).collect()
        }
        return len(truth & got) / len(truth)

    assert recall(seeds_q) >= recall(None)


def test_packed_self_pairs_equals_two_column_kernel(spark):
    """r10 packed pair kernel: packed_self_pairs + unpack_pair must
    emit EXACTLY bucket_self_pairs' (a, b) set — both expansion and
    cap-fallback branches — and the decode must be pure bit ops (ids
    round-trip exactly at the 2^31-1 edge)."""
    import random

    from hubspot_neo4j_pipeline_spark.operators.skew import (
        bucket_self_pairs,
        packed_self_pairs,
        unpack_pair,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(20), rng.randrange(500)) for _ in range(3000)]
    rows += [(99, 2**31 - 1), (99, 0), (99, 2**31 - 2)]  # edge ids
    df = spark.createDataFrame(rows, "bucket int, id long").dropDuplicates()
    for cap in (4096, 8, None):  # 8 forces the fallback branch
        want = sorted(
            (r["a"], r["b"])
            for r in bucket_self_pairs(
                df, ["bucket"], "id", expand_cap=cap, no_cache=True
            ).collect()
        )
        a, b = unpack_pair("pk")
        got = sorted(
            (r["a"], r["b"])
            for r in packed_self_pairs(
                df, ["bucket"], "id", expand_cap=cap, no_cache=True
            )
            .select(a.alias("a"), b.alias("b"))
            .collect()
        )
        assert got == want and got, f"cap={cap}"
    assert (2**31 - 2, 2**31 - 1) in [
        (x, y) for x, y in got if x >= 2**31 - 2
    ]


def test_packed_self_pairs_range_guard_raises(spark):
    """Out-of-range ids (negative or >= 2^31) must raise loudly — a
    silent wrap would corrupt the pair set."""
    from hubspot_neo4j_pipeline_spark.operators.skew import packed_self_pairs

    for bad in (-1, 2**31):
        df = spark.createDataFrame(
            [(1, 5), (1, bad)], "bucket int, id long"
        )
        with pytest.raises(Exception, match="ids must be in"):
            packed_self_pairs(df, ["bucket"], "id", no_cache=True).collect()


def test_semantic_dedup_arrow_kernel_bit_equals_join_path(spark, monkeypatch):
    """The r11 Arrow in-cell cosine for semantic_dedup must produce the
    IDENTICAL (vec_id, cell, dup_of) verdicts as the two-sided
    self-join it replaces (gate forced open so the Arrow path runs at
    fixture scale)."""
    from hubspot_neo4j_pipeline_spark.operators import similarity
    from hubspot_neo4j_pipeline_spark.plans.vector_queries import (
        _semantic_dedup_frame,
    )

    monkeypatch.setattr(similarity, "ARROW_BUILD_MIN_VECTORS", 0)
    sf = "/root/testdata/sf0.01"
    a = sorted(
        tuple(r) for r in _semantic_dedup_frame(spark, sf, use_arrow=True).collect()
    )
    b = sorted(
        tuple(r) for r in _semantic_dedup_frame(spark, sf, use_arrow=False).collect()
    )
    assert a == b and a
    # and on the 1/8 sub-slice
    a = sorted(
        tuple(r)
        for r in _semantic_dedup_frame(
            spark, sf, sub_slice=(8, 0), use_arrow=True
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in _semantic_dedup_frame(
            spark, sf, sub_slice=(8, 0), use_arrow=False
        ).collect()
    )
    assert a == b
