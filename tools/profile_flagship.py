"""Per-stage wall-clock breakdown of the flagship pair
(incremental_dup_clusters + slice twin) at sf0.1 — the receipt
instrument for the r13→r14 flagship ratchet (r13 VERDICT task 7).

Monkey-patches timing wrappers around the four store operations the
harness executes per micro-batch (signature build, pair scoring,
cluster fold, LSH ingest) plus the final verdict read, then runs the
registered query unchanged. Prints one JSON line per query with the
stage totals and the end-to-end time, plus the calibration yardstick
so breakdowns are comparable across boxes.

Usage: python tools/profile_flagship.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from hubspot_neo4j_pipeline_spark.session import get_spark
    from hubspot_neo4j_pipeline_spark.streaming import cluster_store, lsh_store

    spark = get_spark()

    stages: dict[str, float] = {}
    calls: dict[str, int] = {}

    def timed(mod, name, label):
        orig = getattr(mod, name)

        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(*a, **kw)
            finally:
                dt = time.perf_counter() - t0
                stages[label] = stages.get(label, 0.0) + dt
                calls[label] = calls.get(label, 0) + 1

        setattr(mod, name, wrap)
        return orig

    # the registered queries import these at call time via
    # `from ..streaming.lsh_store import ...` INSIDE the function, so
    # patching the module attributes is enough
    origs = [
        (lsh_store, "_doc_rows", timed(lsh_store, "_doc_rows", "sig_build")),
        (
            lsh_store,
            "neardup_pairs_against_store",
            timed(lsh_store, "neardup_pairs_against_store", "pair_score"),
        ),
        (
            cluster_store,
            "cluster_store_update_batch",
            timed(cluster_store, "cluster_store_update_batch", "cluster_fold"),
        ),
        # r15 condense-then-fork split: the harness calls the two
        # phases directly (fold_commit runs CONCURRENTLY with
        # lsh_ingest, so stage sums may exceed wall time — that
        # overlap is the point)
        (
            cluster_store,
            "cluster_store_condense_batch",
            timed(
                cluster_store, "cluster_store_condense_batch", "fold_condense"
            ),
        ),
        (
            cluster_store,
            "cluster_store_commit_condensed",
            timed(
                cluster_store,
                "cluster_store_commit_condensed",
                "fold_commit",
            ),
        ),
        (
            lsh_store,
            "lsh_store_update_batch",
            timed(lsh_store, "lsh_store_update_batch", "lsh_ingest"),
        ),
        (
            cluster_store,
            "dedup_verdicts_from_store",
            timed(
                cluster_store, "dedup_verdicts_from_store", "verdict_read"
            ),
        ),
    ]
    try:
        from hubspot_neo4j_pipeline_spark.plans import get_queries

        qs = get_queries()
        out = {}
        for qname in (
            "incremental_dup_clusters",
            "incremental_dup_clusters_slice",
        ):
            best = None
            for _ in range(reps):
                stages.clear()
                calls.clear()
                t0 = time.perf_counter()
                qs[qname](spark, sf_dir).collect()
                total = time.perf_counter() - t0
                spark.catalog.clearCache()
                snap = {
                    "total_sec": round(total, 3),
                    "stages": {
                        k: round(v, 3) for k, v in sorted(stages.items())
                    },
                    "calls": dict(sorted(calls.items())),
                    "unattributed_sec": round(
                        total - sum(stages.values()), 3
                    ),
                }
                if best is None or snap["total_sec"] < best["total_sec"]:
                    best = snap
            out[qname] = best
    finally:
        for mod_name_orig in origs:
            mod, name, orig = mod_name_orig
            setattr(mod, name, orig)

    from tools.calibrate import calibration_sec

    out["calibration_sec"] = calibration_sec(spark)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
