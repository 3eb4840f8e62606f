"""Skew-mitigation operators for hot keys (owner_id, email domains,
campaign ids — the reference's distributions are skewed, SURVEY.md §4).

AQE's skew-join splitting covers sort-merge joins; these cover the two
cases it doesn't:

- `salted_join`: broadcast-ineligible dim join where one fact key
  dominates — salt the fact side deterministically, replicate the dim
  side per salt, join on (key, salt). N-way fan-out of the dim is the
  price for an even shuffle.
- `two_phase_count_distinct`: exact count(DISTINCT v) per key without
  funneling a hot key's values through one reducer — shuffle 1 spreads
  by (key, value), shuffle 2 counts per key (both map-side
  combinable).

Salts are content-derived (xxhash64 of the row), never rand(): results
must be reproducible across retries and AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on `key`, with the fact side salted into n_salts
    sub-keys and the dim side replicated once per salt. Result equals
    the plain join (modulo row order)."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")


def two_phase_count_distinct(
    df: DataFrame, key: str, value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count in two balanced shuffles."""
    return (
        df.select(key, value)
        .distinct()  # shuffle on (key, value) — hot key spreads out
        .groupBy(key)
        .agg(F.count("*").alias(alias))
    )
