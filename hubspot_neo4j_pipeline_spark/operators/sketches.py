"""Shared count-min-sketch machinery: one definition of the counter
grid used by the batch query (plans/sketch_queries.term_cms_sketch)
and the streaming maintainer (streaming/sketches.py).

The CMS grid is (j, bucket, cnt) rows over a DEPTH x WIDTH counter
matrix. Counters are plain sums, which is the whole point: partial
grids from any split of the data — partitions, micro-batches, days —
merge by unionByName + sum into exactly the grid a single pass would
have built. That additivity is what the streaming test asserts.

Hash family: md5-derived 31-bit base through the same (a*h+b) mod p
universal family as MinHash (operators/dedup.py) — the values must be
reproducible in DuckDB for the batch oracle, so this is an md5 site,
not an xxhash64 site (hash-choice rule in plans/text_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024
MOD31 = 2147483648  # 2^31 — md5-derived base-hash range (as dedup.py)
MERSENNE = 2147483647  # 2^31 - 1 — universal-hash modulus
# (a, b) per CMS row — same family as operators/dedup.py _perm_coeffs
CMS_COEFFS = [(2 * i + 1, (i * 40503) % MERSENNE + 7) for i in range(CMS_DEPTH)]

TERM_HASH_SPARK = (
    f"cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint) % {MOD31}L"
)

_BUCKET_STRUCTS = ",".join(
    f"struct({j} as j, ((h * {a}L + {b}L) % {MERSENNE}L) % {CMS_WIDTH}L as bucket)"
    for j, (a, b) in enumerate(CMS_COEFFS)
)


def term_probes(df_with_h: DataFrame, *keep_cols: str) -> DataFrame:
    """Explode each hashed term into its DEPTH (j, bucket) probe cells."""
    return df_with_h.select(
        *keep_cols, F.expr(f"explode(array({_BUCKET_STRUCTS}))").alias("p")
    ).select(*keep_cols, "p.j", "p.bucket")


def hashed_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, h) rows: whitespace terms of length >= 3 with the shared
    md5-derived 31-bit hash."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("term"))
        .where(F.length("term") >= 3)
        .select("term", F.expr(TERM_HASH_SPARK).alias("h"))
    )


def cms_grid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the (j, bucket, cnt) counter grid for a document set."""
    return (
        term_probes(hashed_terms(docs, text_col))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge partial grids by cell-wise sum — the additivity that makes
    the sketch partition-, batch-, and stream-friendly."""
    it = iter(grids)
    out = next(it)
    for g in it:
        out = out.unionByName(g)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


# --- KMV (k-minimum-values) cardinality sketch -------------------------
# Same 60-bit md5-derived shingle hash as plans/sketch_queries.py; the
# sketch state is the k smallest DISTINCT hash values. Merge = union +
# re-min, because any global k-minimum is a k-minimum of whichever part
# contributed it — so per-batch sketches fold into the corpus sketch
# without revisiting data.

KMV_K = 64
KMV_HASH_DOMAIN = float(1 << 60)

# 60-bit md5-derived shingle hash (DuckDB twin:
# ('0x' || substr(md5(s), 1, 15))::BIGINT) — passed as the {gram}
# template to the shared guarded shingle builder.
MD5_60BIT_HASH_SQL = "cast(conv(substring(md5({gram}), 1, 15), 16, 10) as bigint)"


def shingle_hash_sql(text_col: str = "text") -> str:
    """Exploded guarded 5-gram md5-hash expression for `text_col`.

    Short docs (< 5 words) contribute zero rows — the guard that keeps
    one short doc in a streaming micro-batch from killing the query
    (sequence(1, negative) would step through index 0 and crash slice;
    see operators/dedup.py:hashed_shingle_sql). The column name is a
    formatting parameter, not a str.replace target.
    """
    from .dedup import hashed_shingle_sql

    return f"explode({hashed_shingle_sql(text_col, 5, MD5_60BIT_HASH_SQL)})"


# Legacy constant form (the default text column) — kept for callers
# that embed the expression in a larger SQL string.
SHINGLE_HASH_SPARK = shingle_hash_sql("text")


def kmv_kmin(docs: DataFrame, k: int = KMV_K, text_col: str = "text") -> DataFrame:
    """The k smallest distinct shingle hashes of a document set —
    the KMV sketch state, as a (h) DataFrame of <= k rows."""
    hashes = docs.select(F.expr(shingle_hash_sql(text_col)).alias("h")).distinct()
    return hashes.orderBy("h").limit(k)


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Union partial k-min sets, dedupe, keep the k smallest."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate_value(kth_min: int, n_hashes: int, k: int = KMV_K) -> float:
    """Driver-side estimate from a materialized sketch (exact when the
    sketch holds the whole distinct set). Column-expression twin:
    plans/sketch_queries._kmv_estimate — keep the two formulas in
    lockstep (the streaming test pins this one against a batch-built
    sketch)."""
    if n_hashes < k:
        return float(n_hashes)
    return float(int((k - 1) * (KMV_HASH_DOMAIN / float(kth_min))))
