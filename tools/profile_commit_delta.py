"""Phase-level breakdown of segments.commit_delta across the
incremental store round-trip queries (r14 round-2 candidate #1):
how much of each delta commit is the Spark write job vs the manifest
read vs the rename, and how much commit_delta contributes to each
query end-to-end.

Monkey-patches an instrumented clone of segments.commit_delta (same
semantics), runs the selected registered queries unchanged with the
noop sink, prints one JSON line per query plus a global phase rollup.

Usage: python tools/profile_commit_delta.py [sf_dir] [q1,q2,...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = (
    "incremental_hash_dedup_verdicts,incremental_gram_spans,"
    "incremental_scd2_roundtrip,incremental_ann_topk,"
    "incremental_window_counts,incremental_tfidf_topk,"
    "incremental_neardup_pairs,incremental_decontam_flags"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_QUERIES).split(",")

    from hubspot_neo4j_pipeline_spark.session import get_spark
    from hubspot_neo4j_pipeline_spark.streaming import segments

    spark = get_spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    phases: dict[str, float] = {}
    ncalls = [0]
    delta_bytes = [0]

    def instrumented_commit_delta(df, store_path, batch_id, bucket_col=None):
        t0 = time.perf_counter()
        os.makedirs(os.path.join(store_path, segments.DELTAS), exist_ok=True)
        tmp = os.path.join(store_path, f"_tmp-b{batch_id}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t1 = time.perf_counter()
        df.write.mode("overwrite").parquet(tmp)
        t2 = time.perf_counter()
        if bucket_col is not None:
            touched, rows = segments._manifest_counts(df, tmp, bucket_col)
            with open(os.path.join(tmp, segments.MANIFEST), "w") as fh:
                json.dump(
                    {"bucket_col": bucket_col, "touched": touched, "rows": rows},
                    fh,
                )
        t3 = time.perf_counter()
        os.rename(tmp, os.path.join(store_path, segments.DELTAS, f"b{batch_id}"))
        t4 = time.perf_counter()
        dest = os.path.join(store_path, segments.DELTAS, f"b{batch_id}")
        for root, _d, files in os.walk(dest):
            for f in files:
                if f.endswith(".parquet"):
                    delta_bytes[0] += os.path.getsize(os.path.join(root, f))
        phases["prep"] = phases.get("prep", 0.0) + (t1 - t0)
        phases["spark_write"] = phases.get("spark_write", 0.0) + (t2 - t1)
        phases["manifest"] = phases.get("manifest", 0.0) + (t3 - t2)
        phases["rename"] = phases.get("rename", 0.0) + (t4 - t3)
        ncalls[0] += 1

    segments.commit_delta = instrumented_commit_delta
    # stores that imported the symbol directly
    from hubspot_neo4j_pipeline_spark.streaming import gram_store

    gram_store._commit_delta = instrumented_commit_delta

    from hubspot_neo4j_pipeline_spark.plans import get_queries

    queries = get_queries()
    for name in names:
        fn = queries[name]
        # warm rep first (page cache, codegen), then measured rep
        for rep in range(2):
            for k in list(phases):
                del phases[k]
            ncalls[0] = 0
            delta_bytes[0] = 0
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            total = time.perf_counter() - t0
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "query": name,
                    "total_sec": round(total, 3),
                    "commit_delta_calls": ncalls[0],
                    "delta_bytes": delta_bytes[0],
                    "phases_sec": {k: round(v, 3) for k, v in phases.items()},
                    "commit_delta_total": round(sum(phases.values()), 3),
                }
            )
        )

    from tools.calibrate import calibration_sec

    print(json.dumps({"calibration_sec": calibration_sec(spark)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
