"""Mergeable-sketch operators: cardinality estimation a 100 TB corpus
can afford.

Counting DISTINCT 5-gram shingles exactly at corpus scale costs a full
shuffle of every shingle. A KMV (k-minimum-values) sketch answers the
same question with bounded state: keep the k smallest hash values of
the distinct set; the k-th minimum estimates the cardinality as
``(k-1) / F(h_k)`` where ``F`` maps the hash to [0, 1). Two properties
make it the right sketch here:

- **Deterministic and cross-engine exact.** Unlike HyperLogLog
  (engine-specific register layouts — Spark's and DuckDB's
  approx_count_distinct never agree), KMV is pure order statistics over
  a shared hash: both engines compute the identical md5-derived 60-bit
  value per shingle, so the k-th minimum — and therefore the estimate —
  is bit-identical. The estimate is a REAL estimate (not a cheat): its
  error vs the exact count is ~1/sqrt(k), pytest-asserted.
- **Mergeable.** The global k smallest distinct hashes are a subset of
  the union of per-source k smallest (any global k-min is also a k-min
  within its own source), so per-source sketches union + re-min into
  the corpus sketch without touching the data again — the map-side-
  combinable shape that scales: per-partition top-k, then a k·n_sources
  row merge instead of a corpus-wide distinct.

The hash VALUE matters here (order statistics over it), so this is an
md5 site, not an xxhash64 site — see the hash-choice rule in
plans/text_queries.py.

Reference parity: the reference has no sketch layer (its scale story is
record-at-a-time ingestion, README.md:19-33); this module is part of
the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.caching import tracked_cache
from ..sources.tpch import load_table
from .registry import register

# Sketch state/hash definitions are shared with the streaming
# maintainer (streaming/sketches.py) via operators/sketches.py.
# Hash domain: 15 hex digits of md5 → [0, 2^60). 2^60 as a double is
# exact (power of two), as is (k-1)*anything with few significant bits.
# The 60-bit shingle hash is the same expression family as the MinHash
# base (operators/dedup.py): computable in DuckDB as
# ('0x' || substr(md5(s), 1, 15))::BIGINT.
from ..operators.sketches import (  # noqa: E402
    KMV_HASH_DOMAIN as HASH_DOMAIN,
    KMV_K,
    SHINGLE_HASH_SPARK as _SHINGLE_HASH_SPARK,
)

_SHINGLE_HASH_DUCK = """
        SELECT source, unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 4),
                   i -> CAST(('0x' || substr(md5(
                       array_to_string(string_split(text, ' ')[i:i+4], ' ')
                   ), 1, 15)) AS BIGINT)
               ))) AS h
        FROM documents
"""


def _kmv_estimate(n_hashes, kth_min) -> F.Column:
    """(k-1) * (domain / h_k), floored to BIGINT; exact count when the
    sketch holds the whole distinct set (n < k). Single multiply +
    divide in a fixed order — both engines produce the identical
    double, hence the identical floor."""
    return F.when(n_hashes < KMV_K, n_hashes.cast("long")).otherwise(
        F.floor(
            F.lit(float(KMV_K - 1)) * (F.lit(HASH_DOMAIN) / kth_min.cast("double"))
        )
    )


@register(
    "corpus_kmv_sketch",
    oracle=f"""
        WITH sh AS ({_SHINGLE_HASH_DUCK}),
        dist AS (SELECT DISTINCT source, h FROM sh),
        ranked AS (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM dist
        ),
        kmin AS (SELECT source, h FROM ranked WHERE rn <= {KMV_K}),
        per_kth AS (
            SELECT source, max(h) AS kth_min, count(*) AS n_hashes
            FROM kmin GROUP BY source
        ),
        per_exact AS (
            SELECT source, count(*) AS exact_distinct FROM dist GROUP BY source
        ),
        gmin AS (
            SELECT h FROM (SELECT DISTINCT h FROM kmin) ORDER BY h LIMIT {KMV_K}
        ),
        g_kth AS (SELECT max(h) AS kth_min, count(*) AS n_hashes FROM gmin),
        g_exact AS (SELECT count(DISTINCT h) AS exact_distinct FROM dist)
        SELECT source, exact_distinct, kth_min,
               CASE WHEN n_hashes < {KMV_K} THEN n_hashes
                    ELSE CAST(floor({float(KMV_K - 1)} *
                         ({HASH_DOMAIN} / CAST(kth_min AS DOUBLE))) AS BIGINT)
               END AS kmv_estimate
        FROM per_exact JOIN per_kth USING (source)
        UNION ALL
        SELECT '__all__', exact_distinct, kth_min,
               CASE WHEN n_hashes < {KMV_K} THEN n_hashes
                    ELSE CAST(floor({float(KMV_K - 1)} *
                         ({HASH_DOMAIN} / CAST(kth_min AS DOUBLE))) AS BIGINT)
               END AS kmv_estimate
        FROM g_exact CROSS JOIN g_kth
    """,
    covers=("A2", "W2", "U1"),
    doc=(
        "KMV (k-minimum-values) distinct-shingle cardinality sketch, "
        "k=64: per source plus the merged corpus row ('__all__'), with "
        "the exact distinct count alongside for audit. The corpus sketch "
        "is built by MERGING the per-source sketches (union + re-min), "
        "not by re-scanning — the mergeability that makes sketches the "
        "scale path for vocabulary/cardinality tracking at 100 TB. "
        "Cross-engine exact because the estimate is order statistics "
        "over a shared md5-derived hash, not an engine-private HLL. "
        "Scale: per-source top-k is a WindowGroupLimit (rank filter "
        "pushed map-side); the merge touches k rows per source."
    ),
)
def corpus_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # cache: the distinct (source, hash) relation feeds THREE branches
    # (per-source k-min window, per-source exact count, global exact
    # count) — without it the shingle explode + md5 + distinct shuffle
    # runs once per branch. At 100 TB the exact-count branches are the
    # audit luxury you'd drop first; the sketch itself reads `dist`
    # once.
    dist = (
        docs.select("source", F.expr(_SHINGLE_HASH_SPARK).alias("h"))
        .distinct()
        .transform(tracked_cache)
    )
    w = Window.partitionBy("source").orderBy("h")
    kmin = (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .select("source", "h")
    )
    per_kth = kmin.groupBy("source").agg(
        F.max("h").alias("kth_min"), F.count("*").alias("n_hashes")
    )
    per_exact = dist.groupBy("source").agg(F.count("*").alias("exact_distinct"))
    per_source = per_exact.join(per_kth, "source").select(
        "source",
        "exact_distinct",
        "kth_min",
        _kmv_estimate(F.col("n_hashes"), F.col("kth_min")).alias("kmv_estimate"),
    )
    # Merge step: the corpus sketch comes from the per-source sketches
    # alone (k rows per source), never from re-scanning `dist`.
    gmin = kmin.select("h").distinct().orderBy("h").limit(KMV_K)
    g_kth = gmin.agg(F.max("h").alias("kth_min"), F.count("*").alias("n_hashes"))
    g_exact = dist.select("h").distinct().agg(
        F.count("*").alias("exact_distinct")
    )
    g_row = g_exact.join(F.broadcast(g_kth)).select(
        F.lit("__all__").alias("source"),
        "exact_distinct",
        "kth_min",
        _kmv_estimate(F.col("n_hashes"), F.col("kth_min")).alias("kmv_estimate"),
    )
    return per_source.unionByName(g_row)


# CMS machinery is shared with the streaming maintainer
# (streaming/sketches.py): one grid definition, two execution modes.
from ..operators.sketches import (  # noqa: E402
    CMS_COEFFS,
    CMS_WIDTH,
    MERSENNE,
    MOD31,
    hashed_terms,
    term_probes,
)

_CMS_VALUES_SQL = ",".join(f"({j},{a},{b})" for j, (a, b) in enumerate(CMS_COEFFS))
_TERM_HASH_DUCK = (
    f"CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % {MOD31}"
)


@register(
    "term_cms_sketch",
    oracle=f"""
        WITH t3 AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ), terms AS (
            SELECT term, {_TERM_HASH_DUCK} AS h
            FROM t3 WHERE length(term) >= 3
        ), counters AS (
            SELECT c.j, ((h * c.a + c.b) % {MERSENNE}) % {CMS_WIDTH} AS bucket,
                   count(*) AS cnt
            FROM terms CROSS JOIN (VALUES {_CMS_VALUES_SQL}) AS c(j, a, b)
            GROUP BY 1, 2
        ), top10 AS (
            SELECT term, count(*) AS exact_freq, min(h) AS h
            FROM terms GROUP BY term
            ORDER BY exact_freq DESC, term LIMIT 10
        ), probes AS (
            SELECT t.term, t.exact_freq, cnt.cnt
            FROM top10 t
            CROSS JOIN (VALUES {_CMS_VALUES_SQL}) AS c(j, a, b)
            JOIN counters cnt
              ON cnt.j = c.j
             AND cnt.bucket = ((t.h * c.a + c.b) % {MERSENNE}) % {CMS_WIDTH}
        )
        SELECT term, exact_freq, min(cnt) AS cms_estimate,
               CAST(min(cnt) - exact_freq AS BIGINT) AS overcount
        FROM probes GROUP BY term, exact_freq
    """,
    covers=("A1", "W2", "J1"),
    doc=(
        "Count-min sketch over corpus term frequencies (4 rows x 1024 "
        "buckets, md5-derived universal-hash family shared with the "
        "MinHash layer), probed at the exact top-10 terms so the "
        "overcount is auditable. CMS is the mergeable frequency "
        "counterpart of the KMV cardinality sketch: counters are plain "
        "sums, so per-partition sketches combine map-side and the "
        "4x1024 integer grid is the ONLY state that leaves the "
        "executors — at 100 TB that is a fixed few KB regardless of "
        "vocabulary size, vs an unbounded term->count map. Like KMV it "
        "is deterministic order statistics/counting over a shared hash, "
        "so both engines produce the identical estimate, and the "
        "estimate is never below the true count (pytest-asserted)."
    ),
)
def term_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # cache: the hashed term explode feeds BOTH the counter grid and
    # the exact top-10 branch — same multi-consumer discipline as
    # corpus_kmv_sketch's dist cache (per-run scratch; at 100 TB use a
    # disk-spilling persist or accept the recompute).
    terms = tracked_cache(hashed_terms(docs))
    counters = (
        term_probes(terms).groupBy("j", "bucket").agg(F.count("*").alias("cnt"))
    )
    top10 = (
        terms.groupBy("term")
        .agg(F.count("*").alias("exact_freq"), F.min("h").alias("h"))
        .orderBy(F.desc("exact_freq"), F.asc("term"))
        .limit(10)
    )
    probed = term_probes(top10, "term", "exact_freq").join(
        F.broadcast(counters), ["j", "bucket"]
    )
    return probed.groupBy("term", "exact_freq").agg(
        F.min("cnt").alias("cms_estimate"),
        (F.min("cnt") - F.col("exact_freq")).alias("overcount"),
    )
