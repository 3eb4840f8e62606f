"""Query registry: every judged query is registered here with its
Spark implementation and (when SQL-expressible) a DuckDB oracle.

The driver contract (__spark_entry__.py) simply re-exports this
registry. Each query documents which SURVEY.md §2 operator IDs it
covers and the reference file:line it derives from, so parity can be
checked line-by-line.

Determinism rules every query follows (see plans/core_queries.py
helpers):
- money/double sums go through DECIMAL(18,2) in BOTH engines so the
  result is exact and identical regardless of partition/summation
  order;
- any LIMIT/top-k has a unique tie-breaker in the ORDER BY;
- time "now" anchors are derived from the data (max timestamp), never
  the wall clock.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    doc: str = ""
    covers: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 op ids


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    covers: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), covers=covers)
        return fn

    return deco


def get_queries() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
