"""Distributed connected components over an edge list.

Used to turn near-duplicate PAIRS (MinHash/SimHash/shingle/embedding
candidates) into duplicate CLUSTERS — the form a training-data dedup
pipeline actually consumes (keep one canonical doc per cluster).

Algorithm: hash-min label propagation + pointer jumping. Every vertex
starts labeled with its own id; each round a vertex (1) adopts the
minimum label among itself and its neighbors, then (2) jumps to its
label's label (path compression), halving chain depth — so rounds
needed are O(log diameter), same asymptotics as large-star/small-star,
and every step is a shuffle-on-vertex-id equi-join — no crossJoin.

Scale notes (100 TB): each round is two shuffles keyed on vertex id
(uniform if ids are hashes). Lineage is truncated every round with
``localCheckpoint`` so the plan does not grow exponentially with
iterations; on a real cluster configure a checkpoint dir and swap in
``checkpoint``. The convergence probe is a cheap ``isEmpty``-style
limit(1) count, not a full materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) where component = min vertex id reachable.

    Only vertices that appear in ``edges`` are labeled (isolated
    vertices are the caller's concern — for dedup they are singleton
    clusters by definition and never need the join).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    for it in range(max_iter):
        # step 1 — hash-min: adopt the min label among self + neighbors
        nbr_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("nid"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(
            nbr_min, labels.id == nbr_min.nid, "left"
        ).select(
            "id",
            "comp",
            F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("mid_comp"),
        )
        # step 2 — pointer jumping: label <- label(label), halving chain
        # depth each round so convergence is O(log diameter), not O(diameter)
        mapping = stepped.select(
            F.col("id").alias("m_id"), F.col("mid_comp").alias("m_comp")
        )
        proposed = stepped.join(
            mapping, stepped.mid_comp == mapping.m_id, "left"
        ).select(
            "id",
            "comp",
            F.least(
                F.col("mid_comp"), F.coalesce("m_comp", "mid_comp")
            ).alias("new_comp"),
        )
        proposed = proposed.localCheckpoint(eager=True)
        labels = proposed.select("id", F.col("new_comp").alias("comp"))
        # The convergence probe — a separate job — starts at round 1:
        # with any proper edge (src != dst) round 0 moves at least one
        # label (labels start as self, so the larger endpoint adopts the
        # smaller), making a round-0 probe a guaranteed-wasted job. For
        # degenerate inputs (empty or self-loop-only edge sets) this
        # trades the probe for one extra round over empty/converged
        # frames — accepted: those joins are near-free.
        if it > 0:
            changed = (
                proposed.where(F.col("new_comp") < F.col("comp")).limit(1).count()
            )
            if changed == 0:
                break
    return labels


def min_label_union_find(edge_rows: list) -> dict:
    """Min-label union-find over a bounded, collected edge list —
    path-compressed, deterministic (the root is always the minimum
    node id, matching hash-min CC and the recursive-CTE oracles).
    Shared by the streaming cluster store's condensed-graph solve and
    ``components_min_label``'s one-shot solve (r15 — hoisted here from
    streaming/cluster_store so both keep ONE implementation)."""
    parent: dict = {}
    nodes: set = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo
    # every node gets a row — roots map to themselves — matching the
    # distributed kernel's output shape
    return {n: find(n) for n in nodes}


def components_min_label(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """(id, comp = min vertex id reachable) — the exact contract of
    ``connected_components``, solved with a bounded DRIVER union-find
    when the edge list is small, the distributed kernel past the
    bound (r15, guide §1.2 — choose the cheapest correct algorithm).

    Why: the iterative kernel costs, per round, one eager-checkpoint
    job (two shuffles) plus a convergence-probe job — ~6-12 fixed-cost
    Spark jobs for a verified near-dup pair set that is id-pairs only
    and typically thousands of rows (the pair caps bound it at any
    corpus scale). The streaming cluster store has used this exact
    bounded-collect + distributed-fallback shape since r11
    (``driver_cc_max_edges``); this is the one-shot form. The edge
    list is eagerly checkpointed BEFORE the bounding collect so the
    upstream pair plan executes exactly once even when the fallback
    re-plans over it — and the collect reads checkpointed blocks.
    Equality with the kernel is pinned by
    ``test_components_min_label_equals_kernel`` (bound forced to 0)
    and by the registered CC-family oracles at three scales."""
    spark = edges.sparkSession
    id_type = dict(edges.dtypes)[src]
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    cond = e.localCheckpoint(eager=True)
    head = cond.limit(driver_max_edges + 1).collect()
    if len(head) > driver_max_edges:
        out = connected_components(cond, src="a", dst="b")
        return out.select(F.col("id"), F.col("comp"))
    if not head:
        return spark.createDataFrame(
            [], f"id {id_type}, comp {id_type}"
        ).coalesce(1)
    mapping = min_label_union_find([(r["a"], r["b"]) for r in head])
    import pandas as pd

    # pandas/Arrow + coalesce(1): the r14 driver-frame rule — a plain
    # list would parallelize into defaultParallelism Python-RDD slices
    frame = pd.DataFrame(sorted(mapping.items()), columns=["id", "comp"])
    return spark.createDataFrame(
        frame, f"id {id_type}, comp {id_type}"
    ).coalesce(1)


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → clusters: (cluster_id, n_members, min/max member).

    cluster_id is the minimum member id (stable across runs and
    partitionings). Singleton docs (no pair) are not rows here — a
    keep-list is ``docs.join(clusters_members, 'left_anti')`` plus one
    canonical id per cluster.
    """
    comp = components_min_label(pairs, src=id_a, dst=id_b)
    return comp.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.min("id").alias("min_member"),
        F.max("id").alias("max_member"),
    )


PR_SCALE = 1 << 20  # fixed-point scale for the oracle-exact variant


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-iteration PageRank in fixed-point INTEGER arithmetic →
    (id, rank_q: bigint) with rank_q ≈ rank × scale — the oracle-exact
    sibling of ``pagerank`` (same recurrence, same dangling-mass
    simplification), the ``kmeans_seeds_quantized`` trick applied to
    the iteration (r12, r11 VERDICT task 4: the double variant's rank
    sums depend on float addition order, so it could never hash-match
    a DuckDB oracle; every step here is int64 — exact, associative,
    order-free — so an unrolled-CTE SQL oracle matches cell-exact).

    Recurrence per round, all non-negative int64 (Spark's truncating
    ``div`` ≡ DuckDB's flooring ``//`` on non-negatives):
        contrib(u→v) = rank_q(u) div out_deg(u)
        rank_q'(v)   = (scale·(den−num)) div den
                       + (num · Σ contrib) div den
    Overflow headroom: total mass never exceeds N·scale (dangling
    vertices leak mass), so num·mass < 100·N·2^20 — safe past N=10^11.
    Quantization error ≤ out_deg/scale per vertex per round —
    irrelevant to ranking; the double variant remains the production
    default. Scale: identical shuffle structure to ``pagerank`` (one
    join pair per round, lineage truncated per round)."""
    # r14 (guide §2.4/§5): the graph-static frames are consumed by
    # EVERY round — without the checkpoints each of the n_iter round
    # plans re-derives e (source scans + union), vertices (distinct —
    # a shuffle) and out_deg (groupBy — a shuffle) from scratch, so the
    # upstream edge plan executed n_iter+1 times. Lazy localCheckpoint
    # materializes each once on first use; rounds then read the
    # persisted blocks (connected_components' `sym` pattern). Exact
    # same values: every step is int64 arithmetic, associative and
    # order-free.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    teleport = (scale * (damping_den - damping_num)) // damping_den
    ranks = vertices.select(
        "id", F.lit(scale).cast("long").alias("rank_q")
    )
    for _ in range(n_iter):
        contribs = (
            ranks.join(out_deg, ranks.id == out_deg.src, "inner")
            .join(e, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("rank_q div out_deg").alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            vertices.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(
                        f"({damping_num} * coalesce(in_mass, 0L)) "
                        f"div {damping_den}"
                    )
                ).cast("long").alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list:
    (id, rank), sum(rank) == n_vertices (the 1/N-normalized form ×N).

    Each iteration is ONE shuffle pair: ranks ⋈ edges on src (rank
    mass flows along out-edges, split by out-degree), then groupBy dst.
    Dangling vertices keep only their teleport share — their mass is
    NOT redistributed (the common web-graph simplification); the test
    oracle (numpy power iteration in tests/) implements the identical
    recurrence. Lineage is truncated per round with localCheckpoint,
    like connected_components above.

    Scale: state per round is one (id, rank) frame keyed uniformly;
    out_degree is precomputed once. Rank sums are doubles — results are
    deterministic up to float addition order, so this is test-verified
    (numpy, 1e-9 tolerance), not DuckDB-oracle-matched.
    """
    # r14: same static-frame checkpoints as pagerank_quantized — each
    # round otherwise re-derives e/vertices/out_deg from the upstream
    # edge plan (n_iter+1 executions of it). Float rank values are
    # unchanged within the documented test tolerance (per-key sum
    # order may differ across layouts, as always for doubles).
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    ranks = vertices.select("id", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            ranks.join(out_deg, ranks.id == out_deg.src, "inner")
            .join(e, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            vertices.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
