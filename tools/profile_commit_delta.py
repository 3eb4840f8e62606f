"""Per-call commit_delta attribution across the incremental store
round-trip queries: wraps the REAL segments.commit_delta (no cloned
logic — r14 round 2 added a driver-side Arrow fast path, and a clone
would silently measure the wrong code), records wall per call, which
path each commit took (driver single-file vs distributed write), and
committed bytes; then runs the selected registered queries unchanged
with the noop sink. One JSON line per query.

Usage: python tools/profile_commit_delta.py [sf_dir] [q1,q2,...]
"""
from __future__ import annotations

import json
import os
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

    stats = {"sec": 0.0, "calls": 0, "driver_path": 0, "bytes": 0}
    real = segments.commit_delta

    def wrapped(df, store_path, batch_id, bucket_col=None, **kw):
        t0 = time.perf_counter()
        try:
            return real(df, store_path, batch_id, bucket_col=bucket_col, **kw)
        finally:
            stats["sec"] += time.perf_counter() - t0
            stats["calls"] += 1
            dest = os.path.join(store_path, segments.DELTAS, f"b{batch_id}")
            for root, _d, files in os.walk(dest):
                for f in files:
                    if f.endswith(".parquet"):
                        stats["bytes"] += os.path.getsize(os.path.join(root, f))
                    if f == "part-00000-driver.parquet":
                        stats["driver_path"] += 1

    segments.commit_delta = wrapped
    from hubspot_neo4j_pipeline_spark.streaming import gram_store

    gram_store._commit_delta = wrapped

    from hubspot_neo4j_pipeline_spark.plans import get_queries

    queries = get_queries()
    for name in names:
        fn = queries[name]
        for _rep in range(2):  # warm rep first, report the second
            for k in stats:
                stats[k] = 0 if isinstance(stats[k], int) else 0.0
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
                    "commit_delta_calls": stats["calls"],
                    "commit_delta_sec": round(stats["sec"], 3),
                    "driver_path_commits": stats["driver_path"],
                    "delta_bytes": stats["bytes"],
                }
            )
        )

    from tools.calibrate import calibration_sec

    print(json.dumps({"calibration_sec": calibration_sec(spark)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
