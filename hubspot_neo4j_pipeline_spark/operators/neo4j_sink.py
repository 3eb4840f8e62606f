"""Optional Neo4j Spark-connector sink (S12-S14) — the reference's
load target, behind a capability gate so nothing here requires the
connector jar or a server (tests exercise the gate and the option
construction, not a live write).

With the official connector (`org.neo4j.spark.DataSource`, public
Maven artifact org.neo4j:neo4j-connector-apache-spark) on the
classpath, `write_nodes` issues the same MERGE-on-key upsert the
reference batches by hand (loaders/neo4j_loader.py:80-102), and
`write_edges` the endpoint-matched relationship MERGE (:104-143).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

NEO4J_FORMAT = "org.neo4j.spark.DataSource"


def connector_available(spark) -> bool:
    """True if the Neo4j Spark connector is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.neo4j.spark.DataSource")
        return True
    except Exception:
        return False


def node_write_options(label: str, key: str = "hubspot_id") -> dict[str, str]:
    """Connector options for a MERGE-on-key node upsert (S12)."""
    return {
        "labels": f":{label}",
        "node.keys": key,
        "save.mode": "Overwrite",  # connector-level MERGE semantics
    }


def edge_write_options(
    rel_type: str,
    from_label: str,
    to_label: str,
    key: str = "hubspot_id",
) -> dict[str, str]:
    """Connector options for endpoint-matched edge MERGE (S13)."""
    return {
        "relationship": rel_type,
        "relationship.save.strategy": "keys",
        "relationship.source.labels": f":{from_label}",
        "relationship.source.save.mode": "Match",
        "relationship.source.node.keys": f"from_id:{key}",
        "relationship.target.labels": f":{to_label}",
        "relationship.target.save.mode": "Match",
        "relationship.target.node.keys": f"to_id:{key}",
    }


# ---------------------------------------------------------------------------
# Full edge catalog: every (from_label, rel_type, to_label) triple the
# reference materializes (SURVEY.md §1.5; reference DATA_MODEL.md:245-374,
# config/neo4j_schema.py:2-22, graph_transformer.py:128-180,212-286,
# 334-368,410-475,544-574, loaders/entity_matcher.py:54-84,
# loaders/temporal_loader.py:176-183). 14 relationship types; types with
# several endpoint combinations expand to one writer config each.
# `key` is the node match property ("hubspot_id" except WebPage, which is
# keyed by url — neo4j_schema.py:10).
# ---------------------------------------------------------------------------

_C, _CO, _D, _A, _U = (
    "HUBSPOT_Contact",
    "HUBSPOT_Company",
    "HUBSPOT_Deal",
    "HUBSPOT_Activity",
    "HUBSPOT_User",
)
_WP, _OE, _CE, _FS, _EC = (
    "HUBSPOT_WebPage",
    "HUBSPOT_EmailOpenEvent",
    "HUBSPOT_EmailClickEvent",
    "HUBSPOT_FormSubmission",
    "HUBSPOT_EmailCampaign",
)

# (rel_type, from_label, to_label, from_key, to_key)
EDGE_CATALOG: tuple[tuple[str, str, str, str, str], ...] = (
    ("WORKS_AT", _C, _CO, "hubspot_id", "hubspot_id"),
    ("ASSOCIATED_WITH", _C, _D, "hubspot_id", "hubspot_id"),
    ("BELONGS_TO", _D, _CO, "hubspot_id", "hubspot_id"),
    ("OWNED_BY", _C, _U, "hubspot_id", "hubspot_id"),
    ("OWNED_BY", _CO, _U, "hubspot_id", "hubspot_id"),
    ("OWNED_BY", _D, _U, "hubspot_id", "hubspot_id"),
    ("INVOLVES", _A, _C, "hubspot_id", "hubspot_id"),
    ("INVOLVES", _A, _CO, "hubspot_id", "hubspot_id"),
    ("RELATED_TO", _A, _D, "hubspot_id", "hubspot_id"),
    ("PERFORMED", _C, _OE, "hubspot_id", "hubspot_id"),
    ("PERFORMED", _C, _CE, "hubspot_id", "hubspot_id"),
    ("FOR_CAMPAIGN", _OE, _EC, "hubspot_id", "hubspot_id"),
    ("FOR_CAMPAIGN", _CE, _EC, "hubspot_id", "hubspot_id"),
    ("CLICKED_URL", _CE, _WP, "hubspot_id", "url"),
    ("SUBMITTED_BY", _FS, _C, "hubspot_id", "hubspot_id"),
    ("ON_PAGE", _FS, _WP, "hubspot_id", "url"),
    ("VISITED", _C, _WP, "hubspot_id", "url"),
    ("SAME_AS", _U, "Person", "hubspot_id", "hubspot_id"),
    # SCD2 history link, one per versioned label (temporal_loader.py:176-183)
    ("HAS_HISTORY", _C, f"{_C}_HISTORY", "hubspot_id", "hubspot_id"),
    ("HAS_HISTORY", _CO, f"{_CO}_HISTORY", "hubspot_id", "hubspot_id"),
    ("HAS_HISTORY", _D, f"{_D}_HISTORY", "hubspot_id", "hubspot_id"),
    ("HAS_HISTORY", _A, f"{_A}_HISTORY", "hubspot_id", "hubspot_id"),
    ("HAS_HISTORY", _U, f"{_U}_HISTORY", "hubspot_id", "hubspot_id"),
)


def edge_catalog_options() -> dict[tuple[str, str, str], dict[str, str]]:
    """Writer options for EVERY edge triple the reference loads —
    (rel_type, from_label, to_label) → connector option dict. The
    golden-file test (tests/test_neo4j_sink.py) pins all 14 rel types
    and their endpoint expansions against this catalog."""
    out: dict[tuple[str, str, str], dict[str, str]] = {}
    for rel_type, from_label, to_label, from_key, to_key in EDGE_CATALOG:
        opts = edge_write_options(rel_type, from_label, to_label)
        opts["relationship.source.node.keys"] = f"from_id:{from_key}"
        opts["relationship.target.node.keys"] = f"to_id:{to_key}"
        out[(rel_type, from_label, to_label)] = opts
    return out


def write_nodes(
    nodes: DataFrame, url: str, label: str, key: str = "hubspot_id"
) -> None:
    if not connector_available(nodes.sparkSession):
        raise RuntimeError(
            "Neo4j Spark connector not on classpath; add "
            "org.neo4j:neo4j-connector-apache-spark to spark.jars.packages"
        )
    w = nodes.dropDuplicates([key]).write.format(NEO4J_FORMAT).option("url", url)
    for k, v in node_write_options(label, key).items():
        w = w.option(k, v)
    w.mode("overwrite").save()


def write_edges(
    edges: DataFrame,
    url: str,
    rel_type: str,
    from_label: str,
    to_label: str,
) -> None:
    if not connector_available(edges.sparkSession):
        raise RuntimeError(
            "Neo4j Spark connector not on classpath; add "
            "org.neo4j:neo4j-connector-apache-spark to spark.jars.packages"
        )
    w = (
        edges.where(edges.rel_type == rel_type)
        .write.format(NEO4J_FORMAT)
        .option("url", url)
    )
    for k, v in edge_write_options(rel_type, from_label, to_label).items():
        w = w.option(k, v)
    w.mode("append").save()
