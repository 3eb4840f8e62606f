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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lcp_length(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two string columns.

    Positions where the two prefixes agree form a prefix-closed set,
    so counting agreeing positions IS the lcp length. Shared by the
    dry-run sink's sub-key fan-OUT (strip a constant id prefix so
    rank tasks spread — operators/neo4j_sink._subkeyed) and the
    deletion-variant join's fan-IN (strip a corpus-wide prefix so
    per-row variant count shrinks — operators/entity_match). NULL or
    empty inputs yield 0."""
    pair_len = F.least(F.length(a), F.length(b))
    agree = F.filter(
        F.sequence(F.lit(1), pair_len),
        lambda i: a.substr(F.lit(1), i) == b.substr(F.lit(1), i),
    )
    # sequence(1, 0) would DESCEND, hence the >= 1 guard
    return F.coalesce(F.when(pair_len >= 1, F.size(agree)), F.lit(0))


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


def hash_subsplit(
    df: DataFrame,
    group_col: str,
    id_col: str,
    max_group: int,
    out_col: str = "sub",
) -> DataFrame:
    """Deterministically sub-split oversized groups so downstream
    within-group all-pairs work stays bounded.

    A group of size s gets n_sub = ceil(s/max_group) sub-keys; each row
    lands in md5(id) % n_sub (the house md5→bigint family — exactly
    reproducible in a DuckDB oracle, unlike xxhash64). Joining on
    (group, sub) instead of (group) turns an O(s²) hot-group blowup
    into O(s·max_group) — linear in corpus size with max_group fixed.
    The size frame is one row per group; the join back is NOT
    broadcast-hinted — for a bounded group column (IVF cells, labels)
    AQE broadcasts it from runtime size stats anyway, and a caller who
    points this at a high-cardinality group column (band hashes,
    shingle keys) degrades gracefully to a shuffle join on the group
    key it already shuffled for, instead of collecting millions of
    rows to the driver. Groups at or under max_group get n_sub=1, so
    the split is the identity for them — small-SF results are
    unchanged.

    Used by plans/vector_queries.semantic_dedup (the r5-judge-measured
    70x fat-cell quadratic) and available for any hot-group all-pairs
    site; the df-cap family (max_band_df / max_bucket_df) is the
    DROP-based alternative when a hot bucket means redundant
    candidates rather than required comparisons.
    """
    sizes = df.groupBy(group_col).agg(
        F.expr(f"cast((count(*) + {max_group - 1}) DIV {max_group} as bigint)").alias(
            "_n_sub"
        )
    )
    return (
        df.join(sizes, group_col)
        .withColumn(
            out_col,
            F.expr(
                f"cast(conv(substring(md5(cast({id_col} as string)), 1, 15), "
                "16, 10) as bigint)"
            )
            % F.col("_n_sub"),
        )
        .drop("_n_sub")
    )


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


def bucket_self_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    item,
    expand_cap: int | None = 4096,
    no_cache: bool = False,
) -> DataFrame:
    """All unordered item pairs (a < b) within each bucket — the
    candidate-generation kernel shared by the bucketed pair operators
    (deletion-variant, LSH, band, simhash-chunk joins).

    Shape (r7): a bucket SELF-JOIN shuffles the key frame twice and
    probes every ordered pair before the a < b filter; this kernel
    instead groups once per bucket and expands ordered pairs from the
    sorted item array with a flat transform — one shuffle, i < j pairs
    only, no probe-side hash table (measured 94s → 39s on the 100x
    edit-distance join, identical output).

    Memory guard: the expansion materializes k(k-1)/2 structs per
    bucket in one row, so buckets larger than ``expand_cap`` fall back
    to the streaming self-join (their rows re-explode from the already
    -grouped arrays — no second pass over ``df``). Upstream operators
    bound bucket sizes structurally (auto-scaled plane counts, df
    caps, deletion-variant locality); the cap only matters for
    adversarial skew, where 4096² pairs/row would otherwise risk a
    single-row OOM. Both paths emit the same pairs; a bucket is
    entirely in one path.

    ``item`` may be a column name or a struct Column; for structs the
    first field must be the orderable identity (pair order compares it
    first). Items are deduped per bucket (collect_set), so an item
    never pairs with itself. Output: (*bucket_cols, a, b).

    ``expand_cap=None`` drops the fallback branch entirely (pure
    expansion): the plan embeds the upstream tree once instead of
    three times (small + both fallback sides), which saves driver
    analysis and two scheduled-but-empty stages per query. Correct
    ONLY when the caller bounds bucket population structurally
    (variant-key locality, auto-scaled plane counts, band-row
    collision floors, hot-chunk refinement, df caps) — an unbounded
    bucket under pure expansion is a single-row OOM, not a slow join.

    With the fallback enabled, ``grouped`` is cached: the fallback's
    two join sides would otherwise re-execute the groupBy (A/B at
    100x: 43s hybrid-uncached vs 33s cached ≈ pure for the simhash
    pair query). Caching contract: the cache outlives this call —
    long-lived sessions pass ``no_cache=True`` (bounded recompute,
    zero storage footprint) or call
    ``operators.caching.release_caches()`` after materializing
    results; batch tools clearCache between queries.
    """
    from .caching import tracked_cache

    item_col = F.col(item) if isinstance(item, str) else item
    grouped = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(item_col)).alias("_items"))
        .where(F.size("_items") > 1)
    )
    if expand_cap is not None:
        grouped = tracked_cache(grouped, no_cache)
    expand = F.expr(
        "flatten(transform(_items, (x, i) -> "
        "transform(slice(_items, i + 2, size(_items) - i - 1), "
        "y -> struct(x as a, y as b))))"
    )
    if expand_cap is None:
        return (
            grouped.select(*bucket_cols, F.explode(expand).alias("_p"))
            .select(*bucket_cols, F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        )
    small = (
        grouped.where(F.size("_items") <= expand_cap)
        .select(*bucket_cols, F.explode(expand).alias("_p"))
        .select(*bucket_cols, F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
    )
    big_src = grouped.where(F.size("_items") > expand_cap).select(
        *bucket_cols, F.explode("_items").alias("_it")
    )
    big = (
        big_src.alias("x")
        .join(big_src.alias("y"), bucket_cols)
        .where(F.col("x._it") < F.col("y._it"))
        .select(
            *bucket_cols, F.col("x._it").alias("a"), F.col("y._it").alias("b")
        )
    )
    return small.unionByName(big)


PACK_BASE = 4294967296  # 2^32 — the packed-pair radix


def packed_self_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    item: str,
    expand_cap: int | None = 4096,
    no_cache: bool = False,
) -> DataFrame:
    """``bucket_self_pairs`` for BOUNDED NON-NEGATIVE integer ids,
    emitting each pair as ONE packed long ``pk = a*2^32 + b`` instead
    of two columns.

    Why: the pair operators that AGGREGATE over the expansion (the
    >=3-shared-shingles join counts ~116M pair-incidence rows at 100x
    before its HAVING) shuffle every row into a groupBy on the pair
    key — one 8-byte long halves the shuffle width and makes the
    aggregate's hash/compare a single-word op. A/B at 100x: the
    shingle-overlap pair arm fell 19.0 -> 10.7 s for a bit-identical
    pair set. Callers keep the key packed THROUGH their aggregation
    and decode with ``unpack_pair`` after the filter, when the row
    count is survivor-sized.

    Exactness guard: packing is injective only for ids in [0, 2^31);
    every emitted element re-checks the bound and ``raise_error``s on
    violation (sorted arrays make the checks redundant in-range; they
    cost two long compares), so a caller feeding wider ids gets a loud
    failure, never a silently corrupted pair set. Same grouping,
    dedup, cap-fallback, and caching contract as ``bucket_self_pairs``
    — output is (*bucket_cols, pk), pairs a < b exactly once.
    """
    from .caching import tracked_cache

    guard = (
        f"IF(x >= 0 AND y < {PACK_BASE // 2}, x * {PACK_BASE} + y, "
        f"CAST(raise_error('packed_self_pairs: ids must be in [0, 2^31)') "
        f"AS BIGINT))"
    )
    grouped = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(F.col(item))).alias("_items"))
        .where(F.size("_items") > 1)
    )
    if expand_cap is not None:
        grouped = tracked_cache(grouped, no_cache)
    expand = F.expr(
        "flatten(transform(_items, (x, i) -> "
        "transform(slice(_items, i + 2, size(_items) - i - 1), "
        f"y -> {guard})))"
    )
    if expand_cap is None:
        return grouped.select(*bucket_cols, F.explode(expand).alias("pk"))
    small = grouped.where(F.size("_items") <= expand_cap).select(
        *bucket_cols, F.explode(expand).alias("pk")
    )
    big_src = grouped.where(F.size("_items") > expand_cap).select(
        *bucket_cols, F.explode("_items").alias("_it")
    )
    big = (
        big_src.alias("x")
        .join(big_src.alias("y"), bucket_cols)
        .where(F.col("x._it") < F.col("y._it"))
        .select(
            *bucket_cols,
            F.expr(
                f"IF(x._it >= 0 AND y._it < {PACK_BASE // 2}, "
                f"x._it * {PACK_BASE} + y._it, "
                f"CAST(raise_error('packed_self_pairs: ids must be in "
                f"[0, 2^31)') AS BIGINT))"
            ).alias("pk"),
        )
    )
    return small.unionByName(big)


def unpack_pair(pk) -> tuple[Column, Column]:
    """Decode a ``packed_self_pairs`` key back to (a, b) — pure bit
    ops (shift/mask), never float division: pk reaches 2^63 and a
    double round-trip loses bits past 2^53. Exact because pk >= 0 and
    2^32 is the radix."""
    col = F.col(pk) if isinstance(pk, str) else pk
    return F.shiftright(col, 32), col.bitwiseAND(F.lit(PACK_BASE - 1))
