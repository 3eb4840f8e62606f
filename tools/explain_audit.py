"""Print a physical-plan summary for every registered query.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

Shows the operator tree plus scan details (PushedFilters/ReadSchema)
so pushdown and join-strategy regressions are visible at a glance.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from hubspot_neo4j_pipeline_spark.plans import get_queries
    from hubspot_neo4j_pipeline_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in sorted(get_queries().items()):
        if only and name not in only:
            continue
        print(f"\n======== {name}")
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            print(f"  ERROR: {exc}")
            continue
        for line in plan.splitlines():
            s = line.strip()
            if s.startswith(("*", "+-", ":-")) or (
                s and line.startswith(("+", ":")) and "(" in s
            ):
                print(line)
            elif "PushedFilters" in s or "ReadSchema" in s:
                print("    " + s[:160])


if __name__ == "__main__":
    main()
