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


def _deletion_variants_sql(text_col: str, max_distance: int) -> str:
    """All strings reachable from `text_col` by deleting ≤ max_distance
    characters (including the string itself), distinct, as ONE SQL
    array expression.

    1-based SQL substring; deleting position p is
    concat(substr(s,1,p-1), substr(s,p+1,L)); deleting p1 < p2 composes
    the same way. array_distinct collapses the duplicates runs of
    repeated characters produce (digit strings shrink a lot), which
    directly shrinks the candidate join's fan-out.
    """
    if max_distance not in (1, 2):
        raise ValueError("deletion-neighborhood join supports distance 1 or 2")
    s = f"`{text_col}`"
    d1 = (
        f"transform(sequence(1, length({s})), p -> "
        f"concat(substring({s}, 1, p - 1), substring({s}, p + 1, length({s}))))"
    )
    parts = [f"array({s})", d1]
    if max_distance == 2:
        # delete p1 < p2: middle piece spans (p1, p2) exclusive
        parts.append(
            f"flatten(transform(sequence(1, length({s})), p1 -> "
            f"transform(sequence(least(p1 + 1, length({s})), length({s})), p2 -> "
            f"if(p2 > p1, concat(substring({s}, 1, p1 - 1), "
            f"substring({s}, p1 + 1, p2 - p1 - 1), "
            f"substring({s}, p2 + 1, length({s}))), null))))"
        )
    return (
        "array_distinct(filter(concat(" + ", ".join(parts) + "), v -> v is not null))"
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    max_distance: int = 2,
    min_variant_len: int | None = None,
    no_cache: bool = False,
) -> DataFrame:
    """Exact edit-distance self-join: all pairs (id_a < id_b) with
    levenshtein(text_a, text_b) <= max_distance, optionally restricted
    to equal `block_col`.

    Scale design (replaces the within-block all-pairs join, which is
    O((N/blocks)²) with a FIXED block count — the r6 scale probe
    measured 35x wall at 10x data for fuzzy_name_pairs): candidates
    are pairs sharing ANY common ≤d-deletion variant. If
    lev(a,b) <= d, an alignment touches <= d positions in each string,
    so deleting those positions from each yields a COMMON string —
    recall is exact, no cap, no tuning. Conversely a shared variant
    only implies lev <= 2d, so candidates are a superset and the
    levenshtein verify keeps the OUTPUT bit-identical to the naive
    all-pairs join — the DuckDB oracle stays the plain blocked
    self-join. Variant keys carry L-d exact characters, so bucket
    population is bounded by local near-match density, not corpus
    size (measured at 10k suppliers: 89 distinct variants/row after
    array_distinct, max bucket 66, 1.4M pre-dedup candidate rows —
    and candidate volume grows LINEARLY with N where the blocked
    all-pairs join grows quadratically; scale probe: 35.4x → 4.8x
    wall at 10x data). Per-row fan-out is <= 1 + L + L(L-1)/2
    variants (172 for L=18) — the classic deletion-neighborhood /
    Pass-Join family (Li et al., VLDB 2011) as DataFrame algebra.

    Shuffle discipline (r7): the candidate join keys on
    xxhash64(variant) — an 8-byte long — instead of the raw L-d-char
    variant string, the same equality-only-key trick as
    doc_shingle_candidates (plans/text_queries.py). Equal variants
    hash equal, so recall is untouched; a hash collision between
    UNEQUAL variants only widens the candidate superset and the
    levenshtein verify removes it, so the output stays bit-identical
    while shuffle bytes per key drop from ~L to 8.

    Minimum-length assumption: the "bucket population ~ local
    near-match density" bound assumes strings are long relative to
    max_distance. Every string with length <= d shares the
    empty-string variant (and length-(d+1) strings share single-char
    variants), so a corpus dominated by very short values degrades
    the candidate join toward all-pairs within a block — output stays
    exact (the verify), but the scale bound silently disappears.
    `min_variant_len=m` restores it: variants shorter than m are
    dropped, but ONLY for rows with length(s) >= m + d. Exactness is
    preserved: if both sides of a true pair have length >= m + d, the
    alignment-derived common variant has length >= min(len) - d >= m
    and survives; if either side is shorter than m + d its variants
    are all kept, so every true pair still shares a surviving key.
    (With the prefix strip below, lengths here are STRIPPED lengths.)

    Corpus-prefix strip (r8): a prefix shared by every string is
    stripped before variant generation AND the verify. Exact twice
    over: (1) if a and b start with the same char c, the DP's first
    step is a free match, so lev(c+x, c+y) = lev(x, y) — by induction
    a shared prefix contributes 0 to the distance of EVERY pair;
    (2) any string lexicographically between min(s) and max(s) shares
    their common prefix, so lcp(min, max) — two aggregates, broadcast
    back — is shared corpus-wide. On id-like corpora (supplier names:
    18 chars, 9 of them the constant 'Supplier#') this cuts per-row
    fan-out from 1+L+L(L-1)/2 = 172 variants to 46 and shortens both
    the hashed variant strings and the verify DP — candidate recall
    and output are bit-identical (equality pinned in
    tests/test_operators_misc.py).
    """
    from .skew import lcp_length

    cols = [F.col(id_col).alias("_eid"), F.col(text_col).alias("_s")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("_blk"))
    raw = df.select(*cols)
    lcp = raw.agg(F.min("_s").alias("_mn"), F.max("_s").alias("_mx")).select(
        lcp_length(F.col("_mn"), F.col("_mx")).alias("_lcp")
    )
    base = (
        raw.crossJoin(F.broadcast(lcp))
        .withColumn("_s", F.col("_s").substr(F.col("_lcp") + 1, F.length("_s")))
        .drop("_lcp")
    )
    variants = F.expr(_deletion_variants_sql("_s", max_distance))
    if min_variant_len is not None:
        variants = F.when(
            F.length("_s") >= min_variant_len + max_distance,
            F.filter(variants, lambda v: F.length(v) >= min_variant_len),
        ).otherwise(variants)
    keys = base.select(
        "_eid",
        *(["_blk"] if block_col is not None else []),
        F.explode(variants).alias("_v"),
    ).select(
        "_eid",
        *(["_blk"] if block_col is not None else []),
        F.xxhash64("_v").alias("_vh"),
    )
    blk = ["_blk"] if block_col is not None else []
    # Candidate generation via the shared in-bucket pair-expansion
    # kernel (operators/skew.bucket_self_pairs) — not a bucket
    # self-join: the join shuffled the 10M-row key frame TWICE and
    # probed 2x the pairs before the id_a < id_b filter; the grouped
    # form shuffles the keys once and emits only i < j pairs
    # (r7: measured 94s → 39s at 100x data, identical output).
    from .skew import bucket_self_pairs

    cand = (
        bucket_self_pairs(keys, ["_vh"] + blk, "_eid", no_cache=no_cache)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"), *blk)
        .dropDuplicates(["id_a", "id_b"])
    )
    texts = base.select("_eid", "_s")
    # Bounded verify: levenshtein's threshold form stops each DP at
    # distance max_distance+? and returns -1 past it — O(L·d) per pair
    # instead of O(L²), and the returned value equals the unbounded
    # distance whenever it is <= the threshold, so the kept rows (and
    # the distance column) are bit-identical to the naive form.
    dist = F.levenshtein(F.col("_sa"), F.col("_sb"), max_distance)
    out_blk = [F.col("_blk").alias(block_col)] if block_col is not None else []
    return (
        cand.join(
            texts.select(F.col("_eid").alias("id_a"), F.col("_s").alias("_sa")), "id_a"
        )
        .join(
            texts.select(F.col("_eid").alias("id_b"), F.col("_s").alias("_sb")), "id_b"
        )
        .where((dist >= 0) & (dist <= max_distance))
        .select("id_a", "id_b", dist.cast("long").alias("distance"), *out_blk)
    )
