"""Skew stress for the shuffle-heavy families (r4 VERDICT task 2).

The plan-audit gate proves the dedup/ANN candidate generators are
bucket equi-joins, but bucket joins die differently: a HOT BUCKET (one
band/shingle/cell holding a large fraction of the corpus) turns one
reducer quadratic. These tests build zipfian fixtures — 90 % of docs
in one source, a boilerplate template dominating the corpus, a 90 %
hot join key — and assert the mitigations hold:

- map-side partial aggregation absorbs hot GROUP BY keys (exact dedup
  on 90 %-identical content: bounded wall-clock factor vs uniform);
- candidate caps (max_band_df / max_shingle_df) bound hot-bucket
  fan-out, with the candidate-count blowup DEMONSTRATED uncapped and
  the cold-pair recall preserved capped;
- the two-phase distinct + salted join shapes stay within a bounded
  factor of their uniform-key time.

Timing bounds are deliberately generous (5x with an 8 s floor) — they
catch quadratic behavior (which shows up as 20-100x+ at these sizes),
not scheduler noise; the floor absorbs a GC pause landing inside the
uniform baseline on shared hardware. Candidate-count and plan-shape
assertions are the primary signal throughout; the timings are a
secondary tripwire.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from hubspot_neo4j_pipeline_spark.operators.skew import (
    salted_join,
    two_phase_count_distinct,
)

VOCAB = [f"w{i}" for i in range(400)]


def _text(doc_id: int, n_words: int = 50) -> str:
    # deterministic LCG word stream, unique-ish per doc
    x = doc_id * 2654435761 % 2**31
    words = []
    for _ in range(n_words):
        x = (1103515245 * x + 12345) % 2**31
        words.append(VOCAB[x % len(VOCAB)])
    return " ".join(words)


def _docs(spark, n, hot_frac=0.0, hot_text=None):
    """n docs; the first hot_frac*n share hot_text (default: doc 0's
    text) — content-level skew. Source is zipfian when hot_frac>0."""
    hot_n = int(n * hot_frac)
    base = hot_text or _text(0)
    rows = [
        (
            i,
            base if i < hot_n else _text(i),
            "hot" if i < hot_n else f"src{i % 20}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def test_exact_dedup_hot_content_bounded(spark):
    """90% identical content = one giant sha bucket. Partial (map-side)
    aggregation collapses it before the shuffle, so the skewed corpus
    must run within a small factor of the uniform one — and the hot
    group must still resolve to the min doc_id."""
    uniform = _docs(spark, 6000)
    skewed = _docs(spark, 6000, hot_frac=0.9)
    _, warm = _timed(lambda: exact_dedup(uniform, "doc_id", "text").count())
    kept, t_skew = _timed(
        lambda: exact_dedup(skewed, "doc_id", "text")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("m"))
        .collect()
    )
    assert kept[0]["n"] == 6000 - 5400 + 1  # one survivor for the hot group
    assert t_skew <= max(5 * warm, 8.0), (t_skew, warm)


def test_minhash_hot_band_cap_bounds_candidates(spark):
    """A template text shared by 90% of docs makes every one of its
    bands a k=1800-doc bucket -> 1.6M candidate pairs per band
    uncapped. max_band_df drops those buckets; pairs among the COLD
    docs are unaffected (their buckets are untouched)."""
    n = 2000
    skewed = _docs(spark, n, hot_frac=0.9)
    capped, t_capped = _timed(
        lambda: minhash_lsh_pairs(
            skewed, "doc_id", "text", threshold=0.5, max_band_df=64
        ).count()
    )
    # hot-template pairs are gone (1800 copies -> 0 intra-template
    # candidates), so the capped run returns only cold-structure pairs
    assert capped < 1800 * 1799 / 2
    # cold-pair recall: run on the cold subset alone and require every
    # cold pair found there to also be found in the capped skewed run
    cold = skewed.where(F.col("source") != "hot")
    cold_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(cold, "doc_id", "text", threshold=0.5).collect()
    }
    capped_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            skewed, "doc_id", "text", threshold=0.5, max_band_df=64
        ).collect()
    }
    assert cold_pairs <= capped_pairs
    # uniform-corpus reference: capped-skewed must stay within a small
    # factor (uncapped-skewed is the quadratic path we're avoiding)
    uniform = _docs(spark, n)
    _, t_uniform = _timed(
        lambda: minhash_lsh_pairs(uniform, "doc_id", "text", threshold=0.5).count()
    )
    assert t_capped <= max(5 * t_uniform, 8.0), (t_capped, t_uniform)


def test_ngram_cap_same_contract(spark):
    """The inverted-index sibling: a stop-shingle shared corpus-wide is
    dropped by max_shingle_df, keeping candidate volume linear."""
    n = 1500
    boiler = " ".join(f"b{i}" for i in range(6))  # one shared 6-word phrase
    rows = [(i, _text(i, 40) + " " + boiler) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, "doc_id", "text", max_shingle_df=64)
    # every doc shares the boilerplate shingles with every other doc:
    # min_shared=3 uncapped would emit ~n^2/2 pairs; capped must not
    assert capped.count() < n * (n - 1) / 4


def test_two_phase_distinct_hot_key(spark):
    """90% of rows carry one key: two_phase_count_distinct must agree
    with count(DISTINCT) exactly and stay within a bounded factor of
    the uniform-key run (the hot key's values spread across the first
    shuffle instead of funneling through one reducer)."""
    n = 400_000
    mk = lambda hot: spark.range(n).select(  # noqa: E731
        (F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
         if hot else F.col("id") % 997).alias("k"),
        (F.col("id") % 5000).alias("v"),
    )
    _, t_uniform = _timed(
        lambda: two_phase_count_distinct(mk(False), "k", "v").count()
    )
    got, t_hot = _timed(
        lambda: two_phase_count_distinct(mk(True), "k", "v").collect()
    )
    truth = {
        r.k: r.n
        for r in mk(True).groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert {r.k: r.n_distinct for r in got} == truth
    assert t_hot <= max(5 * t_uniform, 8.0), (t_hot, t_uniform)


def test_salted_join_hot_key_bounded(spark):
    """90%-hot-key fact joined to a 5k-row dim (too big to prove tiny,
    representative of a forced-shuffle join): the salted join must
    produce exactly the plain join's row count within a bounded factor
    of the uniform-key run."""
    n = 300_000
    dim = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("d"))
    mk = lambda hot: spark.range(n).select(  # noqa: E731
        (F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 5000)
         if hot else F.col("id") % 5000).alias("k"),
        F.col("id").alias("payload"),
    )
    _, t_uniform = _timed(lambda: salted_join(mk(False), dim, "k").count())
    cnt, t_hot = _timed(lambda: salted_join(mk(True), dim, "k").count())
    assert cnt == mk(True).join(dim, "k").count() == n
    assert t_hot <= max(5 * t_uniform, 8.0), (t_hot, t_uniform)


# ---------------------------------------------------------------------------
# Vector family (r5 VERDICT task 5): the two components that actually
# blew up at sf1.0 — LSH bucket self-join and IVF fat-cell all-pairs —
# under a zipfian embedding fixture (one dominant direction). Primary
# assertions are CANDIDATE-COUNT / group-size based (plan-shape signal,
# immune to scheduler noise); no wall-clock compares here.
# ---------------------------------------------------------------------------

from hubspot_neo4j_pipeline_spark.operators.similarity import (  # noqa: E402
    auto_planes_per_table,
    cosine,
    embedding_near_dup_pairs,
    lsh_buckets,
)
from hubspot_neo4j_pipeline_spark.operators.skew import hash_subsplit  # noqa: E402

DIM = 16


def _lcg_vec(seed: int, scale: float = 1.0) -> list:
    x = seed * 2654435761 % 2**31
    out = []
    for _ in range(DIM):
        x = (1103515245 * x + 12345) % 2**31
        out.append(scale * ((x % 2001) - 1000) / 1000.0)
    return out


_HOT_DIR = _lcg_vec(999_983)


def _skewed_vecs(spark, n, n_cold, n_planted_pairs=20):
    """Embedding corpus with a dominant direction: ids < n_cold are
    COLD (distinct pseudo-random directions; the first 2*n_planted_pairs
    of them form planted near-dup pairs (2i, 2i+1) at cosine ≈ 1), ids
    >= n_cold are HOT — tiny perturbations of one shared direction, so
    they funnel into one LSH bucket per table / one IVF cell. Cold ids
    come FIRST so the data-derived hyperplanes stay informative (an
    all-hot plane set is the degenerate case lsh_buckets' bucket-0
    guard already covers)."""
    rows = []
    for i in range(n):
        if i < n_cold:
            if i < 2 * n_planted_pairs:
                base = _lcg_vec(500_000 + i // 2)
                vec = [b + 1e-5 * p for b, p in zip(base, _lcg_vec(i))]
            else:
                vec = _lcg_vec(i)
        else:
            vec = [b + 1e-4 * p for b, p in zip(_HOT_DIR, _lcg_vec(i))]
        rows.append((i, [float(v) for v in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_auto_planes_per_table_scaling():
    """Integer-exact p = ceil(log2(N/64)) clamped to [4, 20]: the
    expected bucket population 2^-p * N never exceeds 64 (above the
    clamp floor), and p is minimal for that property."""
    assert auto_planes_per_table(500) == 4
    assert auto_planes_per_table(2000) == 5
    assert auto_planes_per_table(20000) == 9
    assert auto_planes_per_table(1) == 4
    for n in (100, 1024 * 64, 1024 * 64 + 1, 10**7):
        p = auto_planes_per_table(n)
        assert (1 << p) * 64 >= n or p == 20
        if p > 4:
            assert (1 << (p - 1)) * 64 < n  # minimality


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """90 % of vectors share one direction -> one ~2700-vector bucket
    per table -> ~29 M uncapped candidate pairs. max_bucket_df drops
    those buckets BEFORE the self-join; surviving candidate volume must
    collapse by >100x, computed from bucket populations (plan-level
    signal, no timing)."""
    n, n_cold = 3000, 300
    vecs = _skewed_vecs(spark, n, n_cold)
    sizes = (
        lsh_buckets(vecs, planes_per_table=None)
        .groupBy("table_id", "bucket")
        .agg(F.count("*").alias("c"))
        .select(
            (F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
            F.col("c"),
        )
    )
    uncapped = sizes.agg(F.sum("pairs")).collect()[0][0]
    capped = (
        sizes.where(F.col("c") <= 64).agg(F.sum("pairs")).collect()[0][0]
    )
    hot = n - n_cold
    assert uncapped >= hot * (hot - 1) / 2  # blowup demonstrated
    assert capped <= uncapped / 100, (capped, uncapped)


def test_lsh_cap_preserves_cold_pair_recall(spark):
    """Planted cold near-dup pairs (cosine ≈ 1, isolated directions)
    must survive the hot-bucket cap: identical sign bits put both ids
    of a pair in the same bucket in EVERY table, and at least one of
    those buckets is cold (OR-construction). The hot mass (always the
    same all-agree bucket) is dropped entirely, so no output pair may
    touch a hot id."""
    n, n_cold, planted = 3000, 300, 20
    vecs = _skewed_vecs(spark, n, n_cold, n_planted_pairs=planted)
    got = embedding_near_dup_pairs(
        vecs, threshold=0.99, max_bucket_df=64
    ).collect()
    got_pairs = {(r.id_a, r.id_b) for r in got}
    for i in range(planted):
        assert (2 * i, 2 * i + 1) in got_pairs, f"planted pair {i} lost"
    assert all(a < n_cold and b < n_cold for a, b in got_pairs)


def test_hash_subsplit_bounds_groups_and_keeps_recall(spark):
    """One 2700-vector IVF cell: hash_subsplit must (a) yield exactly
    ceil(2700/128) = 22 sub-groups for the fat cell with no group far
    above the 128 target, (b) be the identity for small cells, and
    (c) preserve within-sub-group dedup recall — every hot vector
    except each sub-group's min id is still dropped by the
    semantic-dedup pair rule."""
    n, n_cold = 3000, 300
    vecs = _skewed_vecs(spark, n, n_cold, n_planted_pairs=0)
    assigned = vecs.select(
        "vec_id",
        F.when(F.col("vec_id") < n_cold, F.col("vec_id") % 9 + 1)
        .otherwise(F.lit(0))
        .alias("cell"),
        F.col("embedding").alias("e"),
    )
    subbed = hash_subsplit(assigned, "cell", "vec_id", 128).cache()
    stats = (
        subbed.groupBy("cell", "sub")
        .agg(F.count("*").alias("c"))
        .groupBy("cell")
        .agg(F.countDistinct("sub").alias("n_sub"), F.max("c").alias("mx"))
        .collect()
    )
    by_cell = {r.cell: r for r in stats}
    assert by_cell[0].n_sub == -(-2700 // 128)  # 22 sub-groups
    assert by_cell[0].mx <= 2 * 128  # hash variance headroom, not 2700
    for c in range(1, 10):
        assert by_cell[c].n_sub == 1  # identity for small cells
    a = subbed.select(
        F.col("vec_id").alias("kept_cand"), "cell", "sub", F.col("e").alias("e_a")
    )
    b = subbed.select("vec_id", "cell", "sub", F.col("e").alias("e_b"))
    dropped = (
        a.join(b, ["cell", "sub"])
        .where(F.col("kept_cand") < F.col("vec_id"))
        .where(cosine("e_a", "e_b") >= 0.99)
        .select("vec_id")
        .distinct()
        .count()
    )
    # all hot vectors minus one survivor per sub-group
    assert dropped == 2700 - by_cell[0].n_sub


def test_duplicated_spans_boilerplate_is_linear_no_pairs(spark):
    """r8: the exact-substring span operator must stay LINEAR when one
    boilerplate template dominates — the scenario where every
    pair-based dedup goes quadratic (k hot docs -> k^2 pairs). Here a
    gram shared by k docs contributes exactly k position rows, so the
    post-join row count equals the duplicated-position count, never a
    pair product. Also pins correctness under skew: every boilerplate
    copy reports the full text as ONE maximal span."""
    from hubspot_neo4j_pipeline_spark.operators.dedup import (
        DEFAULT_SHINGLE,
        duplicated_spans,
    )

    n, hot_frac, n_words = 2000, 0.5, 50
    docs = _docs(spark, n, hot_frac=hot_frac)
    out = duplicated_spans(docs, "doc_id", "text").collect()
    by_id = {r.doc_id: r for r in out}
    hot_n = int(n * hot_frac)
    for i in (0, 1, hot_n - 1):
        r = by_id[i]
        assert (r.n_dup_spans, r.dup_tokens, r.n_tokens) == (1, n_words, n_words), (
            f"boilerplate doc {i} not one full-text span: {r}"
        )
    # linearity evidence from the plan's own arithmetic: duplicated
    # positions are bounded by total gram count (one row per position,
    # never per pair) — k hot docs contribute k*(n_words-k+1) rows,
    # NOT k^2 of anything.
    n_positions = n * (n_words - DEFAULT_SHINGLE + 1)
    dup_tokens_total = sum(r.dup_tokens for r in out)
    assert dup_tokens_total <= n * n_words
    assert n_positions == 2000 * 46
