"""Golden-file enumeration of the Neo4j writer configs for every
relationship type the reference loads (SURVEY.md §1.5; reference
DATA_MODEL.md:245-374, config/neo4j_schema.py:2-22) — the connector
write itself stays behind the classpath gate, but the full edge-type
option surface is pinned here.
"""

from __future__ import annotations

from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
    EDGE_CATALOG,
    edge_catalog_options,
    node_write_options,
)

REL_TYPES = {
    "WORKS_AT",
    "ASSOCIATED_WITH",
    "BELONGS_TO",
    "OWNED_BY",
    "INVOLVES",
    "RELATED_TO",
    "PERFORMED",
    "FOR_CAMPAIGN",
    "CLICKED_URL",
    "SUBMITTED_BY",
    "ON_PAGE",
    "VISITED",
    "SAME_AS",
    "HAS_HISTORY",
}


def test_catalog_covers_all_14_rel_types():
    assert {e[0] for e in EDGE_CATALOG} == REL_TYPES
    assert len(REL_TYPES) == 14


def test_catalog_expands_multi_endpoint_types():
    by_type: dict[str, int] = {}
    for rel_type, *_ in EDGE_CATALOG:
        by_type[rel_type] = by_type.get(rel_type, 0) + 1
    assert by_type["OWNED_BY"] == 3  # Contact/Company/Deal -> User
    assert by_type["INVOLVES"] == 2  # Activity -> Contact/Company
    assert by_type["PERFORMED"] == 2  # Contact -> open/click event
    assert by_type["FOR_CAMPAIGN"] == 2
    assert by_type["HAS_HISTORY"] == 5  # one per versioned label
    assert len(EDGE_CATALOG) == 23


def test_webpage_edges_match_on_url():
    """WebPage nodes are keyed by url, not hubspot_id (neo4j_schema.py:10)."""
    opts = edge_catalog_options()
    for triple in (
        ("CLICKED_URL", "HUBSPOT_EmailClickEvent", "HUBSPOT_WebPage"),
        ("ON_PAGE", "HUBSPOT_FormSubmission", "HUBSPOT_WebPage"),
        ("VISITED", "HUBSPOT_Contact", "HUBSPOT_WebPage"),
    ):
        assert opts[triple]["relationship.target.node.keys"] == "to_id:url"


def test_every_config_is_endpoint_matched_merge():
    for (rel_type, from_label, to_label), opts in edge_catalog_options().items():
        assert opts["relationship"] == rel_type
        assert opts["relationship.save.strategy"] == "keys"
        assert opts["relationship.source.labels"] == f":{from_label}"
        assert opts["relationship.target.labels"] == f":{to_label}"
        # endpoints are matched, never created by the edge write
        assert opts["relationship.source.save.mode"] == "Match"
        assert opts["relationship.target.save.mode"] == "Match"


def test_catalog_options_roundtrip_connector_validation(spark):
    """Contract check against the REAL connector, classpath-gated.

    When org.neo4j:neo4j-connector-apache-spark is on the session
    classpath, every EDGE_CATALOG option dict (plus a node config) is
    fed to the connector's own option parser
    (org.neo4j.spark.util.Neo4jOptions — its constructor eagerly
    materializes the node/relationship metadata from the raw map, so
    constructing it IS the validation round-trip). Where the jar is
    absent this SKIPS with a visible reason — never silently passes —
    so a CI environment that provides the jar exercises the real
    surface with zero code change.
    """
    import pytest

    from hubspot_neo4j_pipeline_spark.operators.neo4j_sink import (
        connector_available,
    )

    if not connector_available(spark):
        pytest.skip(
            "Neo4j Spark connector not on classpath; add "
            "org.neo4j:neo4j-connector-apache-spark to spark.jars.packages "
            "to run the connector-side option validation"
        )
    jvm = spark._jvm

    def to_jmap(opts: dict) -> object:
        jmap = jvm.java.util.HashMap()
        for k, v in opts.items():
            jmap.put(k, v)
        return jmap

    for triple, opts in edge_catalog_options().items():
        full = {**opts, "url": "neo4j://localhost:7687"}
        jopts = jvm.org.neo4j.spark.util.Neo4jOptions(to_jmap(full))
        assert jopts is not None, f"connector rejected options for {triple}"
    node = {**node_write_options("HUBSPOT_Contact"), "url": "neo4j://localhost:7687"}
    assert jvm.org.neo4j.spark.util.Neo4jOptions(to_jmap(node)) is not None


def test_node_options_merge_on_key():
    opts = node_write_options("HUBSPOT_Contact")
    assert opts == {
        "labels": ":HUBSPOT_Contact",
        "node.keys": "hubspot_id",
        "save.mode": "Overwrite",
    }
    assert node_write_options("HUBSPOT_WebPage", key="url")["node.keys"] == "url"
