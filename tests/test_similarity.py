"""ANN operator tests: LSH recall vs brute force, IVF partition
sanity, norm correctness."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_buckets,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_topk_shape(emb):
    q = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, q, k=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2}
    for rows in per_q.values():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
        sims = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert all(sims[i] >= sims[i + 1] - 1e-12 for i in range(len(sims) - 1))
        assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_lsh_buckets_cover_all_vectors(emb):
    b = lsh_buckets(emb, n_tables=8, planes_per_table=4)
    assert b.count() == emb.count() * 8  # one row per vector per table
    assert b.select("vec_id").distinct().count() == emb.count()
    n_buckets = b.select("table_id", "bucket").distinct().count()
    assert 8 <= n_buckets <= 8 * 16  # 4 planes/table → ≤ 2^4 buckets each


def test_lsh_recall_vs_brute_force(emb):
    """LSH top-k must recover a reasonable fraction of true neighbors
    (8 hyperplanes on 500 random vectors — recall won't be perfect,
    but same-bucket neighbors must be genuinely similar)."""
    k = 10
    q = emb.where("vec_id < 20").select(F.col("vec_id").alias("query_id"), "embedding")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=k).collect()
    }
    approx = lsh_topk(emb, k=k, n_queries=20).collect()
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & approx_pairs) / len(truth)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"
    # and every returned neighbor shares the query's bucket by construction;
    # ranks are contiguous from 1
    for qid in {r["query_id"] for r in approx}:
        ranks = sorted(r["rank"] for r in approx if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_lsh_bucket_determinism(emb):
    b1 = {(r["vec_id"], r["bucket"]) for r in lsh_buckets(emb).collect()}
    b2 = {(r["vec_id"], r["bucket"]) for r in lsh_buckets(emb).collect()}
    assert b1 == b2


def test_semantic_dedup_drops_planted_duplicate(spark):
    """A vector that is an exact copy of a smaller-id cluster-mate must
    be dropped with dup_of = that mate; well-separated vectors
    survive (semantic_dedup's smaller-id-wins contract). A chain
    0~1~2 with 0~2 below threshold drops BOTH 1 and 2, and 2's
    dup_of is the (itself dropped) 1 — the documented greedy
    contract, transitive remapping being doc_dedup_keeplist's job."""
    from hubspot_neo4j_pipeline_spark.plans.vector_queries import semantic_dedup

    import tempfile

    base = [1.0] + [0.0] * 63
    far = [0.0] * 63 + [1.0]
    rows = [
        (0, base, 0),          # cluster 0 seed (min id per label)
        (1, far, 1),           # cluster 1 seed
        (2, base, 0),          # exact dup of vec 0 → dropped, dup_of=0
        (3, [0.0, 1.0] + [0.0] * 62, 1),  # orthogonal to both seeds → survives
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = {r["vec_id"]: r for r in semantic_dedup(spark, d).collect()}
    assert set(out) == {2}
    assert out[2]["dup_of"] == 0

    # chain case: 10 ~ 11 ~ 12 but 10 !~ 12 (cos(10,12) < 0.35)
    import math
    a1, a2 = 0.0, math.acos(0.34) / 2  # pair-cos = cos(a2) ≈ 0.7 ≥ τ; end-cos = 0.34 < τ
    chain = [
        (10, [math.cos(0.0), math.sin(0.0)] + [0.0] * 62, 5),
        (11, [math.cos(a2), math.sin(a2)] + [0.0] * 62, 5),
        (12, [math.cos(2 * a2), math.sin(2 * a2)] + [0.0] * 62, 5),
    ]
    cdf = spark.createDataFrame(chain, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        cdf.write.parquet(f"{d}/embeddings.parquet")
        out = {r["vec_id"]: r["dup_of"] for r in semantic_dedup(spark, d).collect()}
    assert out == {11: 10, 12: 11}  # 12's dup_of is the dropped 11 (greedy)


def test_ivf_assign_map_equals_window_form(spark):
    """The map-only literal-centroid argmin must reproduce
    ivf_assign(n_probe=1) exactly, including the (d2, cell) tie-break."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_map,
        ivf_seeds,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = ivf_seeds(emb)
    win = {(r["vec_id"], r["cell"]) for r in ivf_assign(emb, seeds).collect()}
    mp = {(r["vec_id"], r["cell"]) for r in ivf_assign_map(emb, seeds).collect()}
    assert win == mp

    # explicit tie: equidistant from both seeds → lowest cell must win
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 1),
        (2, [0.5, 0.5], 7),  # d2 to both seeds identical
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    tie_seeds = ivf_seeds(df.where("vec_id < 2"))
    out = {r["vec_id"]: r["cell"] for r in ivf_assign_map(df, tie_seeds).collect()}
    assert out[2] == 0

    # degenerate rows must also match the window form: NaN component
    # (all d2 NaN -> tie -> lowest cell) and null embedding (all d2
    # null -> sorts first -> lowest cell)
    deg = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 1),
            (2, [float("nan"), 0.5], 3),
            (3, None, 4),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    dseeds = ivf_seeds(deg.where("vec_id < 2"))
    dwin = {(r["vec_id"], r["cell"]) for r in ivf_assign(deg, dseeds).collect()}
    dmap = {(r["vec_id"], r["cell"]) for r in ivf_assign_map(deg, dseeds).collect()}
    assert dwin == dmap


def test_precomputed_norm_cosine_is_bit_identical(emb, spark):
    """r8: the pair verifies divide dot by PRECOMPUTED per-vector
    norms instead of calling cosine() per pair. Same double-op tree on
    the same values — the two forms must agree to the last bit, or
    the oracle hash would drift."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import (
        as_double,
        cosine,
        dot,
        l2_norm,
    )

    v = emb.limit(40).select("vec_id", as_double("embedding").alias("e"))
    a = v.select(F.col("vec_id").alias("ia"), F.col("e").alias("ea")).withColumn(
        "na", l2_norm("ea")
    )
    b = v.select(F.col("vec_id").alias("ib"), F.col("e").alias("eb")).withColumn(
        "nb", l2_norm("eb")
    )
    both = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            cosine("ea", "eb").alias("per_pair"),
            (dot("ea", "eb") / (F.col("na") * F.col("nb"))).alias("precomp"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert r.per_pair == r.precomp, (r.ia, r.ib)
