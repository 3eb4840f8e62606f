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

from ..operators.dedup import hashed_shingle_sql
from ..sources.tpch import load_table
from .registry import register


def _rate4(col):
    """Deterministic 4-decimal truncation (identical in Spark & DuckDB)."""
    return F.floor(col * 10000) / 10000


def mask_name(col) -> "F.Column":
    """PII name mask, total-length preserving.

    - length >= 13: keep the 9-char prefix and the last 4 chars, star
      the middle (classic show-first/last masking);
    - length < 13: keep at most the FIRST 4 chars and star everything
      after them — never emit an unmasked tail and never a negative
      ``repeat`` count (hardened r4; ADVICE round 3).
    """
    col = F.col(col) if isinstance(col, str) else col
    n = F.length(col)
    return F.when(
        n >= 13,
        F.concat(
            F.substring(col, 1, 9),
            F.repeat(F.lit("*"), (n - 13).cast("int")),
            F.substring(col, -4, 4),
        ),
    ).otherwise(
        F.concat(
            F.substring(col, 1, 4),
            F.repeat(F.lit("*"), F.greatest(n - 4, F.lit(0)).cast("int")),
        )
    )


def mixture_keep(bucket, total_chars, target_chars) -> "F.Column":
    """Exact keep predicate for hash-threshold downsampling.

    keep ⇔ bucket * total_chars < target_chars * 2^32, evaluated in
    DECIMAL so it stays EXACT past int64: ``bucket`` spans [0, 2^32),
    so a BIGINT product silently wraps (non-ANSI Spark) once a source
    exceeds ~2^31 chars — i.e. at precisely the scale this targets.
    DECIMAL(10,0) × DECIMAL(19,0) → DECIMAL(30,0): exact for any
    BIGINT ``total_chars``/``target_chars``. The DuckDB oracle mirrors
    this with HUGEINT (int128) arithmetic.
    """
    return (
        bucket.cast("decimal(10,0)") * total_chars.cast("decimal(19,0)")
        < target_chars.cast("decimal(19,0)") * F.lit(4294967296).cast("decimal(10,0)")
    )


SHARD_CHAR_BUDGET = 4000  # chars per training shard within a source


@register(
    "doc_shard_packing",
    oracle=f"""
        SELECT doc_id, source, n_chars,
               CAST(sum(n_chars) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_chars,
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
    docs = load_table(spark, sf_dir, "documents", spread=False)
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
        "the xxhash64 gram hash (uniform shuffle key), eval grams "
        "distinct-ed first; AQE size-gates broadcast vs shuffle — never "
        "an all-pairs compare, never a forced unbounded broadcast."
    ),
)
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # xxhash64 gram key: equality-only use (the hash never reaches the
    # output), so it matches the oracle's md5-equality at a fraction of
    # the hashing cost and shuffle width. Short docs (< 8 words) emit
    # zero grams — guard in hashed_shingle_sql.
    grams = docs.select(
        "doc_id",
        F.expr(f"explode({hashed_shingle_sql('text', 8)})").alias("gram"),
    )
    eval_grams = (
        grams.where(F.col("doc_id") % 29 == 0).select("gram").distinct()
    )
    # No broadcast hint: the eval-gram set grows with the eval corpus
    # (unbounded at 100 TB), so a forced broadcast is an OOM waiting to
    # happen. AQE's size-gated strategy picks broadcast when it actually
    # fits and a shuffle hash join when it doesn't.
    return (
        grams.where(F.col("doc_id") % 29 != 0)
        .join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
    )


@register(
    "pii_redaction",
    oracle="""
        WITH masked AS (
            SELECT c_custkey,
                   CASE WHEN length(c_name) >= 13
                        THEN concat(substr(c_name, 1, 9),
                                    repeat('*', length(c_name) - 13),
                                    substr(c_name, length(c_name) - 3, 4))
                        ELSE concat(substr(c_name, 1, 4),
                                    repeat('*', greatest(length(c_name) - 4, 0)))
                   END AS masked_name,
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
    masked = cust.select(
        "c_custkey",
        mask_name("c_name").alias("masked_name"),
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000).cast("long") * 1000).alias(
            "bal_bucket"
        ),
    )
    w = Window.partitionBy("c_mktsegment", "bal_bucket")
    return masked.select("*", F.count("*").over(w).alias("k_group_size"))


@register(
    "doc_repetition_filter",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ), bigrams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(words) - 1),
                       i -> words[i] || ' ' || words[i+1]
                   )) AS bigram,
                   len(words) AS n_words
            FROM toks
        ), counted AS (
            SELECT doc_id, n_words, bigram, count(*) AS cnt
            FROM bigrams GROUP BY doc_id, n_words, bigram
        ), top AS (
            SELECT doc_id, n_words, bigram AS top_bigram,
                   cnt AS top_bigram_count,
                   sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                       OVER (PARTITION BY doc_id) AS repeated_bigram_tokens,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY cnt DESC, bigram DESC
                   ) AS rn
            FROM counted
            QUALIFY rn = 1
        )
        SELECT doc_id, n_words, top_bigram, top_bigram_count,
               floor(CAST(top_bigram_count AS DOUBLE) / (n_words - 1)
                     * 10000) / 10000 AS top_bigram_frac,
               floor(CAST(repeated_bigram_tokens AS DOUBLE) / (n_words - 1)
                     * 10000) / 10000 AS repeated_frac,
               (CAST(top_bigram_count AS DOUBLE) / (n_words - 1) <= 0.18
                AND CAST(repeated_bigram_tokens AS DOUBLE) / (n_words - 1) <= 0.9)
                   AS keep
        FROM top WHERE n_words >= 2
    """,
    covers=("A8", "A9", "D1"),
    doc=(
        "Gopher-style repetition rules: most-frequent-bigram fraction and "
        "fraction of bigram slots inside repeated bigrams, with keep "
        "thresholds — catches boilerplate/looping text that length rules "
        "miss. Scale: explode → two-level groupBy on (doc_id, bigram) — "
        "shuffle key is the doc, uniform; the top-1 window runs over "
        "per-doc bigram COUNTS, not raw tokens. Ties on the top bigram "
        "break by descending lexicographic order in both engines."
    ),
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    bigrams = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            )
        ).alias("bigram"),
    ).where(F.col("n_words") >= 2)
    counted = bigrams.groupBy("doc_id", "n_words", "bigram").agg(
        F.count("*").alias("cnt")
    )
    # top-1 + conditional sum as ONE hash aggregation instead of a
    # sort-window: max(struct(cnt, bigram)) orders by cnt then bigram,
    # exactly the (cnt DESC, bigram DESC) rn=1 row — no per-doc sort,
    # partial aggregation map-side (r3 rewrite, ~2x faster at sf0.1)
    peak = F.max(F.struct(F.col("cnt"), F.col("bigram")))
    top = counted.groupBy("doc_id", "n_words").agg(
        peak.getField("bigram").alias("top_bigram"),
        peak.getField("cnt").alias("top_bigram_count"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "repeated_bigram_tokens"
        ),
    )
    top_frac = F.col("top_bigram_count").cast("double") / (F.col("n_words") - 1)
    rep_frac = (
        F.col("repeated_bigram_tokens").cast("double") / (F.col("n_words") - 1)
    )
    return top.select(
        "doc_id",
        "n_words",
        "top_bigram",
        "top_bigram_count",
        (F.floor(top_frac * 10000) / 10000).alias("top_bigram_frac"),
        (F.floor(rep_frac * 10000) / 10000).alias("repeated_frac"),
        ((top_frac <= 0.18) & (rep_frac <= 0.9)).alias("keep"),
    )


@register(
    "doc_tfidf_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks WHERE length(term) >= 3
            GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT count(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term,
                   floor(tf * ln(CAST(n_docs AS DOUBLE) / df) * 10000) / 10000
                       AS tfidf
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf FROM (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY tfidf DESC, term
                   ) AS rk
            FROM scored)
        WHERE rk <= 3
    """,
    covers=("A2", "W1", "J1"),
    doc=(
        "TF-IDF: per-doc term frequency ⋈ corpus document frequency "
        "(broadcast — vocabulary ≪ corpus) ⋈ 1-row doc count, top-3 terms "
        "per doc by a floor-quantized score (ln is IEEE-identical in both "
        "engines for identical double inputs). Scale: tf shuffles on "
        "(doc, term); df is a second small aggregate of tf, not a rescan; "
        "the per-doc window never sees raw tokens."
    ),
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.length("term") >= 3)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.floor(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * 10000
                )
                / 10000
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "dataset_split_assignment",
    oracle="""
        WITH buckets AS (
            SELECT doc_id, source, n_chars,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        )
        SELECT doc_id, source, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(sum(n_chars) OVER (
                   PARTITION BY source,
                                CASE WHEN bucket < 80 THEN 'train'
                                     WHEN bucket < 90 THEN 'val'
                                     ELSE 'test' END
               ) AS BIGINT) AS split_source_chars
        FROM buckets
    """,
    covers=("F9", "A9"),
    doc=(
        "Deterministic train/val/test split: each document hashes to a "
        "stable bucket (md5 of its id — reproducible across runs, engines, "
        "and cluster sizes; no RNG, no seed coordination), 80/10/10 by "
        "bucket range, with per-(source, split) char mass attached so mix "
        "ratios are auditable. Scale: pure map work plus one bounded-key "
        "window; the assignment column is what a 100 TB run would "
        "partitionBy on write."
    ),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=False)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
    )
    w = Window.partitionBy("source", "split")
    return (
        docs.select("doc_id", "source", "n_chars", bucket.alias("bucket"))
        .withColumn("split", split)
        .select(
            "doc_id",
            "source",
            "bucket",
            "split",
            F.sum("n_chars").over(w).alias("split_source_chars"),
        )
    )


@register(
    "source_mixture_sample",
    oracle="""
        WITH totals AS (
            SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY source
        ), target AS (
            SELECT min(total_chars) AS target_chars FROM totals
        ), scored AS (
            SELECT d.doc_id, d.source, d.n_chars, t.total_chars,
                   tg.target_chars,
                   CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS bucket
            FROM documents d
            JOIN totals t ON d.source = t.source
            CROSS JOIN target tg
        )
        SELECT doc_id, source, n_chars,
               floor(CAST(target_chars AS DOUBLE) / total_chars * 10000)
                   / 10000 AS keep_rate,
               CAST(bucket AS HUGEINT) * total_chars
                   < CAST(target_chars AS HUGEINT) * 4294967296 AS keep
        FROM scored
    """,
    covers=("A3", "F9", "J1"),
    doc=(
        "Source-mixture balancing: downsample every source to the char "
        "mass of the smallest one. Per-doc keep decision is a hash-bucket "
        "threshold compared in EXACT 128-bit integer arithmetic "
        "(bucket * total < target * 2^32 as DECIMAL(38,0) in Spark / "
        "HUGEINT in DuckDB — no float boundary ambiguity between engines "
        "and no int64 wraparound: bucket is up to 2^32-1, so the product "
        "overflows BIGINT once a source exceeds ~2^31 chars, i.e. at "
        "exactly the 100 TB scale this targets). Reproducible on any "
        "engine or cluster size, stable across reruns (no RNG state). "
        "Scale: one per-source aggregate (broadcastable), one broadcast "
        "of the 1-row global min, pure map work after — the same shape "
        "at 100 TB."
    ),
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    totals = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("total_chars")
    )
    target = totals.agg(F.min("total_chars").alias("target_chars"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    return (
        docs.join(F.broadcast(totals), "source")
        .join(F.broadcast(target))
        .select(
            "doc_id",
            "source",
            "n_chars",
            (
                F.floor(
                    F.col("target_chars").cast("double")
                    / F.col("total_chars")
                    * 10000
                )
                / 10000
            ).alias("keep_rate"),
            mixture_keep(
                bucket, F.col("total_chars"), F.col("target_chars")
            ).alias("keep"),
        )
    )


CHUNK_TOKENS = 64  # training-sequence window size (tokens)
CHUNK_STRIDE = 32  # window stride — 50% overlap

# The chunk-window expression is a module constant so the production
# query and the hypothesis property test exercise the SAME expression
# (tests/test_properties.py) — a private copy in the test could drift.
CHUNK_EXPR_SQL = (
    f"explode(transform("
    f"sequence(cast(0 as bigint), cast(floor("
    f"(greatest(0, size(split(text, ' ')) - {CHUNK_TOKENS}) + {CHUNK_STRIDE - 1})"
    f" / {CHUNK_STRIDE}"
    f") as bigint)), "
    f"i -> struct("
    f"i as chunk_idx, "
    f"i * {CHUNK_STRIDE} + 1 as chunk_start, "
    f"cast(least({CHUNK_TOKENS}, size(split(text, ' ')) - i * {CHUNK_STRIDE}) as bigint)"
    f" as chunk_len, "
    f"md5(array_join(slice(split(text, ' '), cast(i * {CHUNK_STRIDE} + 1 as int),"
    f" {CHUNK_TOKENS}), ' ')) as chunk_hash"
    f")))"
)


@register(
    "doc_chunk_split",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   unnest(generate_series(0, CAST(floor(
                       (greatest(0, len(string_split(text, ' '))
                                    - {CHUNK_TOKENS}) + {CHUNK_STRIDE - 1})
                       / {CHUNK_STRIDE}) AS BIGINT))) AS i
            FROM documents
        )
        SELECT doc_id,
               i AS chunk_idx,
               i * {CHUNK_STRIDE} + 1 AS chunk_start,
               least({CHUNK_TOKENS}, len(toks) - i * {CHUNK_STRIDE})
                   AS chunk_len,
               md5(array_to_string(
                   toks[i * {CHUNK_STRIDE} + 1
                        : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
                   AS chunk_hash
        FROM base
    """,
    covers=("S9", "F9"),
    doc=(
        "Training-sequence chunking: every document fans out into "
        "overlapping fixed-width token windows (64 tokens, stride 32 — "
        "the standard context-window prep for LM training), each chunk "
        "carrying its token offset, length, and content hash so the "
        "chunk store can be deduped and joined back to its document. "
        "The window count is exact integer arithmetic (last window "
        "always reaches the final token; short docs yield one chunk). "
        "Scale: pure map-side fan-out — no shuffle at all; at 100 TB "
        "the output partitioning is inherited from the input and the "
        "chunk hash is the downstream dedup/bucket key."
    ),
)
def doc_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Single SQL parse; struct-per-chunk then explode, so every chunk
    # column is computed in one pass over the token array.
    chunk = F.expr(CHUNK_EXPR_SQL)
    return docs.select("doc_id", chunk.alias("ch")).select(
        "doc_id", "ch.chunk_idx", "ch.chunk_start", "ch.chunk_len", "ch.chunk_hash"
    )


@register(
    "source_temperature_weights",
    oracle="""
        WITH totals AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY source
        ), mx AS (SELECT max(total_chars) AS max_chars FROM totals)
        SELECT source, n_docs, total_chars,
               floor(CAST(total_chars AS DOUBLE) / CAST(max_chars AS DOUBLE)
                     * 10000) / 10000 AS rel_mass,
               floor(sqrt(CAST(total_chars AS DOUBLE)
                          / CAST(max_chars AS DOUBLE)) * 10000) / 10000
                   AS rel_weight,
               floor(sqrt(CAST(total_chars AS DOUBLE)
                          / CAST(max_chars AS DOUBLE))
                     / (CAST(total_chars AS DOUBLE)
                        / CAST(max_chars AS DOUBLE)) * 10000) / 10000
                   AS boost
        FROM totals CROSS JOIN mx
    """,
    covers=("A3", "A8"),
    doc=(
        "Temperature-smoothed mixture weights (alpha = 0.5, the "
        "multilingual-training up-weighting of small sources): each "
        "source's sampling weight relative to the largest source is "
        "sqrt(char_mass / max_char_mass), and `boost` is how much the "
        "temperature lifts it over proportional sampling. alpha = 0.5 "
        "is deliberate: sqrt is correctly rounded in IEEE-754, so the "
        "weights are bit-identical across engines — a pow(x, alpha) "
        "for arbitrary alpha is libm-dependent and would not be. "
        "Normalizing against the max (not the sum) keeps every output "
        "a single division/sqrt chain with no cross-row float "
        "accumulation order to pin down. Scale: one per-source "
        "aggregate plus a 1-row broadcast — the same plan at 100 TB."
    ),
)
def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=False)
    totals = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    mx = totals.agg(F.max("total_chars").alias("max_chars"))
    p_rel = F.col("total_chars").cast("double") / F.col("max_chars").cast("double")
    w_rel = F.sqrt(p_rel)
    return totals.join(F.broadcast(mx)).select(
        "source",
        "n_docs",
        "total_chars",
        (F.floor(p_rel * 10000) / 10000).alias("rel_mass"),
        (F.floor(w_rel * 10000) / 10000).alias("rel_weight"),
        (F.floor(w_rel / p_rel * 10000) / 10000).alias("boost"),
    )


@register(
    "curation_funnel",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source, n_chars, text,
                   string_split(text, ' ') AS words
            FROM documents
        ), flags AS (
            SELECT doc_id, source, n_chars, text,
                   (len(words) >= 20 AND len(words) <= 5000
                    AND CAST(n_chars - (len(words) - 1) AS DOUBLE) / len(words)
                        BETWEEN 2 AND 12
                    AND floor(CAST(len(list_filter(words,
                              w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
                          / len(words) * 10000) / 10000 >= 0.6
                    AND len(list_filter(words,
                        w -> w = 'the' OR w = 'a' OR w = 'of')) > 0)
                       AS keep_quality
            FROM toks
        ), dedup AS (
            SELECT doc_id,
                   doc_id = min(doc_id) OVER (PARTITION BY sha256(text))
                       AS keep_dedup
            FROM flags
        ), grams AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 7),
                       i -> md5(array_to_string(
                           string_split(text, ' ')[i:i+7], ' '))
                   ))) AS gram
            FROM documents
        ), eval_grams AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 29 = 0
        ), contaminated AS (
            SELECT DISTINCT g.doc_id FROM grams g
            JOIN eval_grams e ON g.gram = e.gram
            WHERE g.doc_id % 29 <> 0
        ), scored AS (
            SELECT f.source, f.n_chars, f.keep_quality, d.keep_dedup,
                   (f.doc_id % 29 <> 0 AND c.doc_id IS NULL) AS keep_decontam
            FROM flags f
            JOIN dedup d ON f.doc_id = d.doc_id
            LEFT JOIN contaminated c ON f.doc_id = c.doc_id
        )
        SELECT source,
               count(*) AS n_raw,
               CAST(sum(CASE WHEN keep_quality THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality,
               CAST(sum(CASE WHEN keep_quality AND keep_dedup
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
               CAST(sum(CASE WHEN keep_quality AND keep_dedup
                              AND keep_decontam
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
               CAST(sum(CASE WHEN keep_quality AND keep_dedup
                              AND keep_decontam
                             THEN n_chars ELSE 0 END) AS BIGINT)
                   AS final_chars,
               floor(CAST(sum(CASE WHEN keep_quality AND keep_dedup
                                    AND keep_decontam
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 10000) / 10000 AS survival_rate
        FROM scored GROUP BY source
    """,
    covers=("A8", "A9", "D1", "J12"),
    doc=(
        "The end-to-end curation funnel: per source, how many documents "
        "survive quality gate -> exact dedup -> decontamination, plus "
        "surviving char mass and survival rate — the single report a "
        "pipeline owner reads before a training run. Composes the "
        "registry's own stage definitions verbatim (doc_gopher_filter's "
        "keep, exact-dedup canonical-min, doc_decontaminate's 8-gram "
        "rule), so each stage's standalone query is the audit drill-down "
        "for this roll-up. Scale: one window on the content hash, one "
        "gram equi-join (eval side distinct + broadcastable), everything "
        "else map-side; conditional aggregation keeps it one pass."
    ),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    mean_len = (F.col("n_chars") - (n - 1)).cast("double") / n
    alpha = _rate4(
        F.size(F.filter(words, lambda w: w.rlike("^[a-z]+$"))).cast("double") / n
    )
    has_stop = (
        F.size(F.filter(words, lambda w: (w == "the") | (w == "a") | (w == "of")))
        > 0
    )
    keep_quality = (
        (n >= 20)
        & (n <= 5000)
        & (mean_len >= 2)
        & (mean_len <= 12)
        & (alpha >= 0.6)
        & has_stop
    )
    w_hash = Window.partitionBy(F.sha2("text", 256))
    flags = docs.select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        keep_quality.alias("keep_quality"),
        (F.col("doc_id") == F.min("doc_id").over(w_hash)).alias("keep_dedup"),
    )
    grams = docs.select(
        "doc_id",
        F.expr(f"explode({hashed_shingle_sql('text', 8)})").alias("gram"),
    )
    eval_grams = grams.where(F.col("doc_id") % 29 == 0).select("gram").distinct()
    # Unhinted join (see doc_decontaminate): eval grams are unbounded
    # at corpus scale, so AQE decides broadcast-vs-shuffle by size.
    contaminated = (
        grams.where(F.col("doc_id") % 29 != 0)
        .join(eval_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_dirty", F.lit(True))
    )
    keep_d = (F.col("doc_id") % 29 != 0) & F.col("_dirty").isNull()
    scored = flags.join(contaminated, "doc_id", "left").select(
        "source",
        "n_chars",
        "keep_quality",
        "keep_dedup",
        keep_d.alias("keep_decontam"),
    )
    kept = F.col("keep_quality") & F.col("keep_dedup") & F.col("keep_decontam")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return scored.groupBy("source").agg(
        F.count("*").alias("n_raw"),
        one_if(F.col("keep_quality")).alias("n_quality"),
        one_if(F.col("keep_quality") & F.col("keep_dedup")).alias("n_dedup"),
        one_if(kept).alias("n_final"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("final_chars"),
        (F.floor(one_if(kept).cast("double") / F.count("*") * 10000) / 10000).alias(
            "survival_rate"
        ),
    )


@register(
    "fuzzy_name_pairs",
    oracle="""
        SELECT a.s_nationkey AS nationkey,
               CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS distance,
               count(*) AS n_pairs
        FROM supplier a
        JOIN supplier b
          ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        WHERE levenshtein(a.s_name, b.s_name) <= 2
        GROUP BY 1, 2
    """,
    covers=("J6", "A9", "D1"),
    doc=(
        "Blocked fuzzy entity matching: supplier-name pairs within edit "
        "distance 2, blocked by nation, rolled up to (nation, distance) "
        "counts — the typo/near-duplicate audit an entity-resolution "
        "pass runs before canonicalizing a dimension. levenshtein is "
        "bit-identical in Spark and DuckDB, so the whole pipeline is "
        "oracle-exact. Scale (r6): candidates come from "
        "operators/entity_match.edit_distance_pairs — an exact "
        "deletion-neighborhood join — NOT a within-block all-pairs "
        "join. Blocking by nation alone is a FIXED block count, so "
        "block population grows with N and the r6 scale probe measured "
        "35x wall at 10x data; the deletion-neighborhood candidates "
        "are provably a superset of all lev<=2 pairs with tiny "
        "per-variant buckets, so the verified OUTPUT is bit-identical "
        "to the naive join (equality asserted in "
        "tests/test_operators_misc.py) and the oracle stays the plain "
        "blocked self-join SQL."
    ),
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.entity_match import edit_distance_pairs

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    pairs = edit_distance_pairs(
        sup, "s_suppkey", "s_name", block_col="s_nationkey", max_distance=2
    )
    return (
        pairs.select(F.col("s_nationkey").alias("nationkey"), "distance")
        .groupBy("nationkey", "distance")
        .agg(F.count("*").alias("n_pairs"))
    )


FRAME_RATE = 24  # synthetic frames-per-"second" for the video stand-in
FRAME_STRIDE = 8  # sample every 8th frame


@register(
    "frame_sample_plan",
    oracle=f"""
        WITH meta AS (
            SELECT doc_id,
                   n_chars % 240 + {FRAME_RATE} AS n_frames
            FROM documents
        ), frames AS (
            SELECT doc_id, n_frames,
                   unnest(generate_series(0, n_frames - 1, {FRAME_STRIDE})) AS frame_idx
            FROM meta
        )
        SELECT doc_id,
               max(n_frames) AS n_frames,
               count(*) AS n_sampled,
               min(frame_idx) AS first_frame,
               max(frame_idx) AS last_frame,
               floor(CAST(count(*) AS DOUBLE) / max(n_frames) * 10000) / 10000
                   AS sample_rate
        FROM frames GROUP BY doc_id
    """,
    covers=("S9", "P6"),
    doc=(
        "Multimodal frame-sampling PLAN: from per-asset metadata "
        "(synthetic n_frames derived deterministically from n_chars — "
        "standing in for container-header probe results), schedule "
        "every 8th frame and report per-asset sampling stats. This is "
        "the metadata half of video ingestion a 100 TB pipeline runs "
        "FIRST: the schedule is pure map-side arithmetic over tiny "
        "metadata rows, and only the scheduled (asset, frame_idx) list "
        "fans out to the Arrow-batched decode workers "
        "(operators/multimodal.py — decode itself stays honestly "
        "stubbed; the scheduling, fan-out shape, and batch accounting "
        "are real and oracle-exact)."
    ),
)
def frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=False)
    meta = docs.select(
        "doc_id",
        (F.col("n_chars") % 240 + FRAME_RATE).alias("n_frames"),
    )
    frames = meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("n_frames") - 1).cast("long"),
                F.lit(FRAME_STRIDE).cast("long"),
            )
        ).alias("frame_idx"),
    )
    return frames.groupBy("doc_id").agg(
        F.max("n_frames").alias("n_frames"),
        F.count("*").alias("n_sampled"),
        F.min("frame_idx").alias("first_frame"),
        F.max("frame_idx").alias("last_frame"),
        (
            F.floor(F.count("*").cast("double") / F.max("n_frames") * 10000) / 10000
        ).alias("sample_rate"),
    )


@register(
    "source_length_drift",
    oracle="""
        WITH b AS (
            SELECT source, n_chars // 64 AS bkt FROM documents
        ), per_sb AS (
            SELECT source, bkt, count(*) AS c FROM b GROUP BY source, bkt
        ), per_s AS (
            SELECT source, count(*) AS n_docs FROM b GROUP BY source
        ), per_b AS (
            SELECT bkt, count(*) AS d FROM b GROUP BY bkt
        ), tot AS (
            SELECT count(*) AS m FROM b
        ), terms AS (
            SELECT g.source, g.n_docs,
                   abs(CAST(COALESCE(sb.c, 0) AS DECIMAL(16,0))
                           * CAST(t.m AS DECIMAL(19,0))
                       - CAST(g.d AS DECIMAL(16,0))
                           * CAST(g.n_docs AS DECIMAL(19,0))) AS term,
                   CAST(2 * g.n_docs AS DECIMAL(19,0))
                       * CAST(t.m AS DECIMAL(19,0)) AS denom
            FROM (SELECT s.source, s.n_docs, p.bkt, p.d
                  FROM per_s s CROSS JOIN per_b p) g
            CROSS JOIN tot t
            LEFT JOIN per_sb sb ON g.source = sb.source AND g.bkt = sb.bkt
        )
        SELECT source, any_value(n_docs) AS n_docs,
               CAST(sum(term) AS DECIMAL(38,0)) AS tv_num,
               CAST(any_value(denom) AS DECIMAL(38,0)) AS tv_denom
        FROM terms GROUP BY source
    """,
    covers=("A1", "A9", "J4", "U3"),
    doc=(
        "Per-source length-distribution drift vs the whole corpus, as "
        "an EXACT total-variation distance: TV(s) = tv_num / tv_denom "
        "where tv_num = sum_b |c_sb*M - d_b*N_s| and tv_denom = "
        "2*N_s*M, kept as a rational pair in DECIMAL so the result is "
        "bit-identical cross-engine AND overflow-safe at corpus sizes "
        "where a BIGINT product (c*M ~ 1e12*1e13) would wrap — the same "
        "exactness discipline as mixture_keep. Width budget: counts "
        "carry DECIMAL(16,0) (exact to 1e16 docs per bucket — even a "
        "fully-skewed 1e13-doc corpus fits), totals DECIMAL(19,0), so "
        "products stay within DECIMAL(38,0) in both engines without "
        "silent null-on-overflow. The bucket grid is the "
        "cross product of two tiny aggregates (sources x 64-char "
        "length buckets), so missing (source,bucket) cells count as "
        "c=0 rather than silently dropping mass — the usual "
        "inner-join drift bug. Scale: three map-side-combinable "
        "count aggregates + a bounded-frame broadcast cross join; "
        "the per-document pass is pure map work. The monitoring "
        "counterpart of source_temperature_weights: run per ingest "
        "batch and alert when a source's length profile shifts."
    ),
)
def source_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=False).select(
        "source", F.expr("n_chars DIV 64").alias("bkt")
    )
    per_sb = docs.groupBy("source", "bkt").agg(F.count("*").alias("c"))
    per_s = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    per_b = docs.groupBy("bkt").agg(F.count("*").alias("d"))
    tot = docs.agg(F.count("*").alias("m"))
    grid = per_s.crossJoin(F.broadcast(per_b)).join(F.broadcast(tot))
    terms = grid.join(per_sb, ["source", "bkt"], "left").select(
        "source",
        "n_docs",
        F.abs(
            F.coalesce(F.col("c"), F.lit(0)).cast("decimal(16,0)")
            * F.col("m").cast("decimal(19,0)")
            - F.col("d").cast("decimal(16,0)")
            * F.col("n_docs").cast("decimal(19,0)")
        ).alias("term"),
        (
            (F.lit(2) * F.col("n_docs")).cast("decimal(19,0)")
            * F.col("m").cast("decimal(19,0)")
        ).alias("denom"),
    )
    return terms.groupBy("source").agg(
        F.any_value("n_docs").alias("n_docs"),
        F.sum("term").cast("decimal(38,0)").alias("tv_num"),
        F.any_value("denom").cast("decimal(38,0)").alias("tv_denom"),
    )
