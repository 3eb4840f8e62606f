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
