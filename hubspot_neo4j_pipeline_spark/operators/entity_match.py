"""Staged entity matching with anti-join guard (SURVEY.md §2.3 J6).

Reference (loaders/entity_matcher.py:54-84): link User→Person first on
linkedin_url, then — only for still-unmatched users — on email. The
Cypher `NOT EXISTS SAME_AS` guard becomes a left-anti join between
stages; each stage is a broadcastable equi-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MatchStage:
    name: str  # tag recorded on the output edge
    left_key: str  # column on the left (source) frame
    right_key: str  # column on the right (target) frame


def staged_match(
    left: DataFrame,
    right: DataFrame,
    stages: list[MatchStage],
    left_id: str = "hubspot_id",
    right_id: str = "person_id",
) -> DataFrame:
    """Match left→right through ordered stages; each later stage only
    sees left rows no earlier stage matched (anti-join guard). Within
    a stage, ties resolve to the min right id — deterministic.

    Returns (left_id, right_id, match_type).
    """
    remaining = left
    results: list[DataFrame] = []
    for stage in stages:
        r = right.where(
            F.col(stage.right_key).isNotNull() & (F.col(stage.right_key) != "")
        ).select(F.col(stage.right_key).alias("_mk"), F.col(right_id).alias("_rid"))
        matched = (
            remaining.where(
                F.col(stage.left_key).isNotNull() & (F.col(stage.left_key) != "")
            )
            .join(F.broadcast(r), F.col(stage.left_key) == F.col("_mk"))
            .groupBy(F.col(left_id))
            .agg(F.min("_rid").alias(right_id))
            .withColumn("match_type", F.lit(stage.name))
        )
        results.append(matched)
        remaining = remaining.join(matched, left_id, "left_anti")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def match_users_to_persons(users: DataFrame, persons: DataFrame) -> DataFrame:
    """The reference's concrete instance: linkedin_url first, email
    fallback (entity_matcher.py:54-84) → SAME_AS edges."""
    return staged_match(
        users,
        persons,
        stages=[
            MatchStage("linkedin_url", "linkedin_url", "linkedin_url"),
            MatchStage("email", "email", "email"),
        ],
        left_id="hubspot_id",
        right_id="person_id",
    )
