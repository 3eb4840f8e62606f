"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver-side collect). First a tiny warmup query amortizes JVM/codegen
startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from hubspot_neo4j_pipeline_spark.plans import get_queries
    from hubspot_neo4j_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    timings: dict[str, float] = {}
    for name, fn in sorted(get_queries().items()):
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench error {name}: {exc}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    ok = [v for v in timings.values() if v >= 0]
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": round(sum(ok), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "n_failed": len(timings) - len(ok),
            }
        )
    )


if __name__ == "__main__":
    main()
