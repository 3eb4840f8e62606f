"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the query registry in
``hubspot_neo4j_pipeline_spark.plans`` — every registered query has a
Spark implementation and (where SQL-expressible) a DuckDB oracle; the
driver compares them at sf=0.01 (rows + schema + value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hubspot_neo4j_pipeline_spark.plans import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (deals-by-company roll-up: scan → join → agg →
    top-k; reference main.py:170-172) on sf0.001."""
    from hubspot_neo4j_pipeline_spark.plans.core_queries import deals_by_company

    return deals_by_company(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query."""
    return get_oracles()
