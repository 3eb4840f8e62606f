"""Reporting CLI — parity with the reference's `report.py` entry point
(report.py:90-292): pick a report, an owner pattern, a window, and an
output format, against a graph store produced by `pipeline.py`.

    python report.py --store /path/to/store --type contacts --owner Smith
    python report.py --store ... --type owner-summary --format csv --output out/
    python report.py --store ... --type funnel --days 30 --format json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPORT_TYPES = (
    "contacts",
    "companies",
    "deals",
    "owner-summary",
    "all-owners",
    "lifecycle",
    "industry",
    "recent-activity",
    "engaged",
    "no-company",
    "funnel",
    "campaigns",
    "combined",
)


def load_graph(spark, store: str):
    from hubspot_neo4j_pipeline_spark.plans.reporting import GraphTables

    nodes_root = os.path.join(store, "nodes")
    nodes = {
        label: spark.read.parquet(os.path.join(nodes_root, label))
        for label in os.listdir(nodes_root)
    }
    edges = spark.read.parquet(os.path.join(store, "edges"))
    immutable_path = os.path.join(store, "edges_immutable")
    if os.path.exists(immutable_path):
        edges = edges.unionByName(spark.read.parquet(immutable_path))
    return GraphTables(nodes=nodes, edges=edges)


def build_report(g, args):
    from hubspot_neo4j_pipeline_spark.plans import reporting as R

    t = args.type
    if t == "contacts":
        return R.contacts_by_owner(g, args.owner or "")
    if t == "companies":
        return R.companies_by_owner(g, args.owner or "")
    if t == "deals":
        return R.deals_by_owner(g, args.owner or "")
    if t == "owner-summary":
        return R.owner_summary(g, args.owner or "")
    if t == "all-owners":
        return R.all_owners_summary(g)
    if t == "lifecycle":
        return R.contacts_by_lifecycle_stage(g)
    if t == "industry":
        return R.companies_by_industry(g)
    if t == "recent-activity":
        return R.contacts_with_recent_activity(g, args.owner or "", days=args.days)
    if t == "engaged":
        return R.engaged_contacts(g)
    if t == "no-company":
        return R.contacts_without_company(g)
    if t == "funnel":
        return R.conversion_funnel(g, days=args.days)
    if t == "campaigns":
        return R.campaign_performance(g)
    if t == "combined":
        return R.contacts_companies_by_owner_combined(g, args.owner or "")
    raise SystemExit(f"unknown report type: {t}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", required=True, help="graph store written by pipeline.py")
    p.add_argument("--type", required=True, choices=REPORT_TYPES)
    p.add_argument("--owner", default=None, help="owner name pattern (CONTAINS)")
    p.add_argument("--days", type=int, default=30)
    p.add_argument("--format", default="table", choices=("table", "csv", "json"))
    p.add_argument("--output", default=None, help="output dir for csv/json")
    p.add_argument("--limit", type=int, default=100)
    args = p.parse_args()

    from hubspot_neo4j_pipeline_spark.operators import sinks
    from hubspot_neo4j_pipeline_spark.session import get_spark

    spark = get_spark(app_name="report")
    df = build_report(load_graph(spark, args.store), args)
    if args.format == "table":
        sinks.print_table(df, limit=args.limit)
    elif args.format == "csv":
        sinks.write_csv(df, args.output or "report_csv")
    else:
        sinks.write_json(df, args.output or "report_json")


if __name__ == "__main__":
    main()
