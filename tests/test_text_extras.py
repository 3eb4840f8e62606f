"""Pointwise fixtures for the round-4 text/vector queries.

The DuckDB oracles MIRROR the query logic, so a shared logic bug
would pass the oracle gate; these tests pin the intended behavior on
hand-built corpora where the right answer is computed by eye.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_passage_dedup_flags_cross_doc_blocks(spark, tmp_path):
    """Docs 0 and 1 share their FIRST 10-word block exactly; doc 2 is
    disjoint. The shared block must count as a dup passage for both
    docs and only them; within-doc repetition alone must NOT."""
    from hubspot_neo4j_pipeline_spark.plans.text_queries import doc_passage_dedup

    shared = "a b c d e f g h i j"  # one exact 10-word passage
    texts = [
        shared + " k l m n o p q r s t",  # doc 0: shared + unique block
        shared + " u v w x y z aa bb cc dd",  # doc 1: shared + unique block
        "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10",
        # doc 2: repeats ITS OWN block twice — cross-doc distinct count
        # stays 1, so nothing in doc 2 may be flagged
    ]
    path = str(tmp_path / "documents.parquet")
    _docs(spark, texts).coalesce(1).write.parquet(path)
    out = {
        r["doc_id"]: r
        for r in doc_passage_dedup(spark, str(tmp_path)).collect()
    }
    assert out[0]["n_passages"] == 2 and out[0]["n_dup_passages"] == 1
    assert out[1]["n_passages"] == 2 and out[1]["n_dup_passages"] == 1
    assert out[2]["n_passages"] == 2 and out[2]["n_dup_passages"] == 0
    assert out[0]["dup_frac"] == 0.5 and out[2]["dup_frac"] == 0.0
    assert not out[0]["keep"] and out[2]["keep"]  # 0.5 > 0.3 threshold


def test_vocab_oov_counts_against_topk(spark, tmp_path):
    """VOCAB_K=100: fill the vocabulary with 100 terms of frequency 2,
    then a doc of frequency-1 singletons — every singleton loses the
    tf tie-break against the fillers and must count as OOV."""
    from hubspot_neo4j_pipeline_spark.plans.text_queries import doc_vocab_oov

    common = " ".join(f"t{i:03d}" for i in range(100))
    texts = [
        common,  # doc 0: each t-term, tf contribution 1
        common,  # doc 1: second copy -> every t-term has tf=2
        "zz1 zz2 zz3 zz4 t000",  # doc 2: 4 rare singletons + 1 in-vocab
    ]
    path = str(tmp_path / "documents.parquet")
    _docs(spark, texts).coalesce(1).write.parquet(path)
    out = {r["doc_id"]: r for r in doc_vocab_oov(spark, str(tmp_path)).collect()}
    assert out[0]["n_tokens"] == 100 and out[0]["n_oov"] == 0
    assert out[2]["n_tokens"] == 5 and out[2]["n_oov"] == 4
    assert out[2]["oov_rate"] == 0.8


def test_incremental_dedup_verdicts(spark, tmp_path):
    """doc 0 and 7 (batch: id % 7 == 0) — 7's text matches corpus doc
    1 twice over; 0's text is novel."""
    from hubspot_neo4j_pipeline_spark.plans.text_queries import (
        doc_incremental_dedup,
    )

    texts = [
        "novel text never seen",  # doc 0 -> batch, unseen
        "dup dup dup",  # doc 1 -> corpus
        "dup dup dup",  # doc 2 -> corpus (2nd copy)
        "other corpus doc",  # doc 3
        "filler a", "filler b", "filler c",  # docs 4-6
        "dup dup dup",  # doc 7 -> batch, seen twice in corpus
    ]
    path = str(tmp_path / "documents.parquet")
    _docs(spark, texts).coalesce(1).write.parquet(path)
    out = {
        r["doc_id"]: r
        for r in doc_incremental_dedup(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 7}
    assert not out[0]["seen_before"] and out[0]["n_existing_copies"] == 0
    assert out[7]["seen_before"] and out[7]["n_existing_copies"] == 2


def test_hard_negatives_exclude_same_label(spark, sf_dir):
    from hubspot_neo4j_pipeline_spark.plans.vector_queries import (
        ann_hard_negatives,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = ann_hard_negatives(spark, sf_dir).collect()
    assert rows, "no hard negatives mined"
    for r in rows:
        assert labels[r["query_id"]] != r["neighbor_label"]
        assert labels[r["neighbor_id"]] == r["neighbor_label"]
    for qid in {r["query_id"] for r in rows}:
        ranks = sorted(r["rank"] for r in rows if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_source_length_drift_zero_for_identical_distribution(spark):
    """Two sources with identical length histograms must both get the
    exact tv_num a hand computation gives — and 0 when every source
    matches the corpus distribution exactly."""
    import tempfile

    from hubspot_neo4j_pipeline_spark.plans.curation_queries import (
        source_length_drift,
    )

    rows = [
        (i, "t", "en", src, n)
        for i, (src, n) in enumerate(
            [("a", 10), ("a", 100), ("b", 10), ("b", 100)]
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in source_length_drift(spark, d).collect()}
    # both sources mirror the corpus 50/50 split across buckets 0 and 1
    assert out["a"]["tv_num"] == 0 and out["b"]["tv_num"] == 0
    assert out["a"]["tv_denom"] == 2 * 2 * 4
