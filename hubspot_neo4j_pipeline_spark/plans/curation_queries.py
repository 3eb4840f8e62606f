"""Training-data curation operators: quota packing, multi-rule quality
filtering, benchmark decontamination, and PII redaction/generalization.

These extend the text-analysis library (plans/text_queries.py) with the
remaining curation primitives a 100 TB pretraining pipeline needs:

- shard packing by cumulative token budget (per-source prefix sums —
  a bounded-partition window, never a global single-partition sort);
- Gopher-style multi-rule quality gates (all JVM-side array exprs);
- eval-set decontamination via n-gram semi-join (bucket join on the
  shingle hash — the same never-crossJoin discipline as dedup);
- PII-style masking + k-anonymity generalization (pure string/number
  exprs, reversible-audit-friendly: the key column is kept).

Cross-engine determinism follows plans/core_queries.py rules: ratios
are floor-quantized, orderings carry unique tie-breakers, doubles are
never cast to scaled decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import register


def _rate4(col):
    """Deterministic 4-decimal truncation (identical in Spark & DuckDB)."""
    return F.floor(col * 10000) / 10000


SHARD_CHAR_BUDGET = 4000  # chars per training shard within a source


@register(
    "doc_shard_packing",
    oracle=f"""
        SELECT doc_id, source, n_chars,
               sum(n_chars) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_chars,
               CAST(floor((sum(n_chars) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_chars) / {SHARD_CHAR_BUDGET}) AS BIGINT) AS shard_id
        FROM documents
    """,
    covers=("W1", "A3"),
    doc=(
        "Sequence/shard packing: assign each document to a fixed-char-budget "
        "training shard via a per-source prefix sum in deterministic md5 "
        "order. Scale: the window partitions by source (bounded groups), "
        "never a global single-partition sort; shard files then write out "
        "with partitionBy(source, shard_id)."
    ),
)
def doc_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chars").over(w)
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        cum.alias("cum_chars"),
        F.floor((cum - F.col("n_chars")) / SHARD_CHAR_BUDGET)
        .cast("long")
        .alias("shard_id"),
    )


@register(
    "doc_gopher_filter",
    oracle="""
        WITH toks AS (
            SELECT doc_id, n_chars, string_split(text, ' ') AS words
            FROM documents
        ), scored AS (
            SELECT doc_id,
                   len(words) AS n_words,
                   CAST(n_chars - (len(words) - 1) AS DOUBLE) / len(words)
                       AS mean_word_len,
                   floor(CAST(len(list_filter(words,
                             w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
                         / len(words) * 10000) / 10000 AS alpha_ratio,
                   len(list_filter(words,
                       w -> w = 'the' OR w = 'a' OR w = 'of')) > 0
                       AS has_stopword
            FROM toks
        )
        SELECT doc_id, n_words, mean_word_len, alpha_ratio, has_stopword,
               (n_words >= 20 AND n_words <= 5000) AS len_ok,
               (mean_word_len >= 2 AND mean_word_len <= 12) AS word_len_ok,
               (alpha_ratio >= 0.6) AS alpha_ok,
               (n_words >= 20 AND n_words <= 5000
                AND mean_word_len >= 2 AND mean_word_len <= 12
                AND alpha_ratio >= 0.6 AND has_stopword) AS keep
        FROM scored
    """,
    covers=("A8", "P5"),
    doc=(
        "Gopher-style multi-rule quality gate: word-count bounds, mean word "
        "length bounds, alphabetic-token ratio, stopword presence — each "
        "rule surfaced as a flag plus the conjunction verdict. All rules are "
        "JVM array expressions over one scan (no Python, no shuffle)."
    ),
)
def doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    # text is single-space joined, so chars minus separators = letter mass
    mean_len = (F.col("n_chars") - (n - 1)).cast("double") / n
    alpha = _rate4(
        F.size(F.filter(words, lambda w: w.rlike("^[a-z]+$"))).cast("double") / n
    )
    has_stop = (
        F.size(F.filter(words, lambda w: (w == "the") | (w == "a") | (w == "of")))
        > 0
    )
    scored = docs.select(
        "doc_id",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha.alias("alpha_ratio"),
        has_stop.alias("has_stopword"),
    )
    len_ok = (F.col("n_words") >= 20) & (F.col("n_words") <= 5000)
    wlen_ok = (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12)
    alpha_ok = F.col("alpha_ratio") >= 0.6
    return scored.select(
        "*",
        len_ok.alias("len_ok"),
        wlen_ok.alias("word_len_ok"),
        alpha_ok.alias("alpha_ok"),
        (len_ok & wlen_ok & alpha_ok & F.col("has_stopword")).alias("keep"),
    )


@register(
    "doc_decontaminate",
    oracle="""
        WITH grams AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 7),
                       i -> md5(array_to_string(string_split(text, ' ')[i:i+7], ' '))
                   ))) AS gram
            FROM documents
        ), eval_grams AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 29 = 0
        )
        SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
        FROM grams g JOIN eval_grams e ON g.gram = e.gram
        WHERE g.doc_id % 29 <> 0
        GROUP BY g.doc_id
    """,
    covers=("J12", "D1"),
    doc=(
        "Benchmark decontamination: flag training documents sharing any "
        "8-gram with the held-out eval split (doc_id % 29 = 0 here; a real "
        "pipeline joins against the benchmark corpus). Scale: equi-join on "
        "the md5 gram hash (uniform shuffle key), eval grams distinct-ed "
        "first and broadcastable — never an all-pairs compare."
    ),
)
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - 7),
                    lambda i: F.md5(F.array_join(F.slice(words, i, 8), " ")),
                )
            )
        ).alias("gram"),
    )
    eval_grams = (
        grams.where(F.col("doc_id") % 29 == 0).select("gram").distinct()
    )
    return (
        grams.where(F.col("doc_id") % 29 != 0)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
    )


@register(
    "pii_redaction",
    oracle="""
        WITH masked AS (
            SELECT c_custkey,
                   concat(substr(c_name, 1, 9),
                          repeat('*', length(c_name) - 13),
                          substr(c_name, length(c_name) - 3, 4)) AS masked_name,
                   c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) * 1000 AS bal_bucket
            FROM customer
        )
        SELECT c_custkey, masked_name, c_mktsegment, bal_bucket,
               count(*) OVER (PARTITION BY c_mktsegment, bal_bucket)
                   AS k_group_size
        FROM masked
    """,
    covers=("F8", "A9"),
    doc=(
        "PII-style masking + k-anonymity generalization: identifier digits "
        "masked to the last 4, numeric balance generalized to 1000-unit "
        "buckets, and the k-anonymity group size (how many records share "
        "the generalized quasi-identifier) computed per record. Scale: one "
        "scan + one window keyed on the generalized columns."
    ),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    name_len = F.length("c_name")
    masked = cust.select(
        "c_custkey",
        F.concat(
            F.substring("c_name", 1, 9),
            F.repeat(F.lit("*"), (name_len - 13).cast("int")),
            F.substring(F.col("c_name"), -4, 4),
        ).alias("masked_name"),
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000).cast("long") * 1000).alias(
            "bal_bucket"
        ),
    )
    w = Window.partitionBy("c_mktsegment", "bal_bucket")
    return masked.select("*", F.count("*").over(w).alias("k_group_size"))
