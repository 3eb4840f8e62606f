"""report.py CLI (via its functions) + Neo4j sink capability gate."""

from __future__ import annotations

import argparse

import pytest

from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
    connector_available,
    edge_write_options,
    node_write_options,
    write_nodes,
)
from hubspot_neo4j_pipeline_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def store(spark, crm_feeds, tmp_path_factory):
    s = str(tmp_path_factory.mktemp("cli_store"))
    run_pipeline(spark, crm_feeds, s, now="2024-03-01 00:00:00")
    return s


def _args(**kw):
    defaults = dict(owner=None, days=30, format="table", output=None, limit=100)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_cli_reports_run_on_store(spark, store):
    import report

    g = report.load_graph(spark, store)
    for t, owner in [
        ("contacts", "Owner"),
        ("all-owners", None),
        ("lifecycle", None),
        ("funnel", None),
        ("campaigns", None),
        ("engaged", None),
    ]:
        df = report.build_report(g, _args(type=t, owner=owner))
        assert df.columns
        df.limit(5).collect()


def test_cli_table_output(spark, store, capsys):
    import report
    from hubspot_neo4j_pipeline_spark.operators import sinks

    g = report.load_graph(spark, store)
    df = report.build_report(g, _args(type="lifecycle"))
    sinks.print_table(df)
    out = capsys.readouterr().out
    assert "lifecycle_stage" in out and "customer" in out


def test_neo4j_sink_gate(spark):
    assert connector_available(spark) is False  # no jar in this env
    df = spark.createDataFrame([("a",)], ["hubspot_id"])
    with pytest.raises(RuntimeError, match="connector not on classpath"):
        write_nodes(df, "neo4j://localhost", "HUBSPOT_Contact")


def test_neo4j_option_construction():
    n = node_write_options("HUBSPOT_Contact")
    assert n["labels"] == ":HUBSPOT_Contact" and n["node.keys"] == "hubspot_id"
    e = edge_write_options("OWNED_BY", "HUBSPOT_Contact", "HUBSPOT_User")
    assert e["relationship"] == "OWNED_BY"
    assert e["relationship.source.node.keys"] == "from_id:hubspot_id"
