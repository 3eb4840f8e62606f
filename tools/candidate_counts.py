"""Candidate-pair accounting for the LSH dedup families at two SFs
(r5 VERDICT task 6: quantify whether the 6-7x wall-time growth of
doc_minhash_lsh_pairs / doc_shingle_candidates at 10x data is
pair-count-driven or a hidden quadratic).

For each SF this prints, per family:
  n_docs          corpus size
  bucket_pairs    sum over buckets of c*(c-1)/2 — rows the bucket
                  self-join emits BEFORE pair dedup (the quantity a
                  hot bucket turns quadratic)
  distinct_cands  candidate pairs after dedup (what gets verified)
  out_pairs       pairs surviving the exact-similarity threshold

A healthy scale story: bucket_pairs/doc grows ~with true duplication
(the generator plants ~proportional dup groups), NOT with corpus
size. If bucket_pairs grows ≫ out_pairs growth, the band/shingle df
caps need tightening.

Usage: python tools/candidate_counts.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from hubspot_neo4j_pipeline_spark.operators.dedup import (
        hashed_shingle_sql,
        minhash_bands,
        minhash_lsh_pairs,
        minhash_signature,
        ngram_jaccard_pairs,
    )
    from hubspot_neo4j_pipeline_spark.session import get_spark

    spark = get_spark(app_name="candidate_counts")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/localdata/sf1.0"]
    for sf_dir in dirs:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()

        def bucket_stats(keyed, key_cols):
            sizes = keyed.groupBy(*key_cols).agg(F.count("*").alias("c"))
            row = sizes.agg(
                F.sum(F.expr("c * (c - 1) / 2")).alias("bp"),
                F.max("c").alias("mx"),
            ).collect()[0]
            return int(row.bp or 0), int(row.mx or 0)

        sigs = minhash_signature(docs, "doc_id", "text").cache()
        bands = minhash_bands(sigs, "doc_id")
        mh_bp, mh_mx = bucket_stats(bands, ["band_id", "band_hash"])
        a = bands.select(F.col("doc_id").alias("id_a"), "band_id", "band_hash")
        b = bands.select(F.col("doc_id").alias("id_b"), "band_id", "band_hash")
        mh_cands = (
            a.join(b, ["band_id", "band_hash"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        mh_out = minhash_lsh_pairs(docs, "doc_id", "text").count()
        spark.catalog.clearCache()

        shingles = docs.select(
            "doc_id", F.expr(f"explode({hashed_shingle_sql('text')})").alias("shingle")
        )
        sh_bp, sh_mx = bucket_stats(shingles, ["shingle"])
        sh_out = ngram_jaccard_pairs(docs, "doc_id", "text").count()
        spark.catalog.clearCache()

        print(
            f"{sf_dir}: n_docs={n_docs}\n"
            f"  minhash  bucket_pairs={mh_bp} max_bucket={mh_mx} "
            f"distinct_cands={mh_cands} out_pairs={mh_out}\n"
            f"  shingle  bucket_pairs={sh_bp} max_bucket={sh_mx} "
            f"out_pairs={sh_out}"
        )


if __name__ == "__main__":
    main()
