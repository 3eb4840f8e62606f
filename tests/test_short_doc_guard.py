"""Regression tests for the short-document n-gram guard (ADVICE r4).

Unguarded `sequence(1, size(words) - (k-1))` on a doc with fewer than
k words produces a NEGATIVE span; Spark's sequence then steps -1 down
through index 0 and `slice(words, 0, k)` raises
INVALID_PARAMETER_VALUE.START at runtime. The DuckDB oracles'
generate_series(1, n-k+1) simply yields no rows for n < k, so the
correct Spark behavior is zero shingles for short docs — which is what
`operators/dedup.py:hashed_shingle_sql` now guarantees at every
n-gram site (5-gram shingles, 8-gram decontamination, KMV sketch,
streaming KMV maintainer).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.dedup import hashed_shingle_sql
from hubspot_neo4j_pipeline_spark.operators.sketches import (
    cms_grid,
    kmv_kmin,
    shingle_hash_sql,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


SHORTS = ["one", "two words", "a b c d", ""]  # all < 5 tokens
LONG5 = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> 2 shingles


def test_short_docs_yield_zero_5grams(spark):
    docs = _docs(spark, SHORTS)
    out = docs.select(
        F.expr(f"explode({hashed_shingle_sql('text')})").alias("h")
    ).collect()
    assert out == []


def test_exactly_k_words_yield_one_shingle(spark):
    docs = _docs(spark, ["a b c d e"])
    out = docs.select(
        F.expr(f"explode({hashed_shingle_sql('text')})").alias("h")
    ).collect()
    assert len(out) == 1


def test_mixed_corpus_5gram_counts(spark):
    docs = _docs(spark, SHORTS + [LONG5])
    out = docs.select(
        "doc_id", F.expr(f"explode({hashed_shingle_sql('text')})").alias("h")
    ).collect()
    assert {r.doc_id for r in out} == {len(SHORTS)}
    assert len(out) == 2  # 6 tokens, k=5 -> 2 distinct shingles


def test_short_docs_yield_zero_8grams(spark):
    docs = _docs(spark, ["one two three four five six seven"])  # 7 < 8
    out = docs.select(
        F.expr(f"explode({hashed_shingle_sql('text', 8)})").alias("h")
    ).collect()
    assert out == []


def test_kmv_kmin_survives_short_docs(spark):
    """One short doc in a batch must not kill the sketch build — the
    streaming KMV maintainer feeds arbitrary micro-batches through
    this exact path."""
    docs = _docs(spark, SHORTS + [LONG5])
    rows = kmv_kmin(docs).collect()
    assert len(rows) == 2  # only the long doc contributes shingles


def test_kmv_kmin_all_short_is_empty_not_error(spark):
    rows = kmv_kmin(_docs(spark, SHORTS)).collect()
    assert rows == []


def test_shingle_hash_sql_column_name_is_quoted_param(spark):
    """The column is a formatting parameter, not str.replace — a column
    named `text_body` (containing the token 'text') must work."""
    docs = _docs(spark, [LONG5]).withColumnRenamed("text", "text_body")
    out = docs.select(F.expr(shingle_hash_sql("text_body")).alias("h")).collect()
    assert len(out) == 2


def test_cms_grid_survives_short_terms(spark):
    # cms terms are single whitespace tokens (length filter only) —
    # no n-gram crash path, but pin empty-text behavior anyway.
    grid = cms_grid(_docs(spark, ["", "abc defg", "ab"])).collect()
    assert sum(r.cnt for r in grid) == 2 * 4  # 2 terms >= 3 chars x depth


def test_lsh_buckets_degenerate_corpus_omits_underpopulated_tables(spark):
    """ADVICE r4: with fewer vectors than planes, missing planes must
    drop their tables entirely — NOT fold every sign bit to 0 and send
    all vectors to bucket 0 of every table (all-pairs blowup)."""
    from hubspot_neo4j_pipeline_spark.operators.similarity import lsh_buckets

    vecs = spark.createDataFrame(
        [(i, [float(i + 1), float(2 * i - 3)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    # 6 vectors, 4 planes/table -> exactly 1 fully-populated table
    out = lsh_buckets(vecs, n_tables=8, planes_per_table=4).collect()
    assert {r.table_id for r in out} == {0}
    assert len(out) == 6  # one bucket row per vector for the one table

    # fewer vectors than one table's planes -> no buckets at all
    tiny = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    assert lsh_buckets(tiny, n_tables=8, planes_per_table=4).collect() == []
