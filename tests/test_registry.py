"""Registry contract: imports cleanly, every query runs on sf0.001,
every oracle parses in DuckDB, and the driver entry points delegate."""

from __future__ import annotations

import duckdb
import pytest

from hubspot_neo4j_pipeline_spark.plans import QUERIES, get_oracles, get_queries


def test_registry_nonempty():
    assert len(QUERIES) >= 50


def test_oracles_subset_of_queries():
    assert set(get_oracles()) <= set(get_queries())


def test_every_query_documents_coverage():
    for name, q in QUERIES.items():
        assert q.covers, f"{name} has no SURVEY §2 coverage tags"
        assert q.doc, f"{name} has no doc"


@pytest.mark.parametrize("name", sorted(get_oracles()))
def test_oracle_parses_in_duckdb(name, sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    con.execute(f"EXPLAIN {get_oracles()[name]}")


def test_spark_entry_delegates(spark):
    import __spark_entry__ as e

    assert set(e.queries()) == set(get_queries())
    assert set(e.oracle_sql()) == set(get_oracles())
    rows = e.entry(spark).collect()
    assert len(rows) > 0


@pytest.mark.parametrize("name", sorted(get_queries()))
def test_query_runs_on_sf0001(name, spark, sf_dir):
    df = get_queries()[name](spark, sf_dir)
    assert df.columns  # stable schema
    df.limit(5).collect()
