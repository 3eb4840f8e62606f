"""Unit tests for order-aware operators (as-of join, sessionization)
and distributed connected components."""

from __future__ import annotations

import pyspark.sql.functions as F

from hubspot_neo4j_pipeline_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from hubspot_neo4j_pipeline_spark.operators.sequence import (
    asof_join,
    session_stats,
    sessionize,
)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 5), (3, 1, 10), (4, 2, 50), (5, 3, 7)],
        "event_id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 90, "b"), (2, 50, "c"), (2, 60, "d")],
        "rk long, rts long, pay string",
    )
    out = {
        r["event_id"]: r["last_pay"]
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts", ["pay"]
        ).collect()
    }
    assert out == {
        1: "b",  # latest at-or-before 100 is rts=90
        2: None,  # ts=5 precedes every right row
        3: "a",  # inclusive: rts=10 == ts=10 matches
        4: "c",  # equal timestamp on other key
        5: None,  # key with no right rows at all
    }


def test_asof_join_no_row_explosion(spark):
    # many left rows per key must stay 1:1 in the output
    left = spark.createDataFrame(
        [(i, 1, i) for i in range(100)], "event_id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, i, str(i)) for i in range(0, 100, 10)], "rk long, rts long, pay string"
    )
    out = asof_join(left, right, "k", "rk", "ts", "rts", ["pay"])
    assert out.count() == 100
    rows = {r["event_id"]: r["last_pay"] for r in out.collect()}
    assert rows[55] == "50" and rows[9] == "0" and rows[99] == "90"


def test_sessionize_gap_splits(spark):
    m = 60 * 1_000_000  # one minute in microseconds
    df = spark.createDataFrame(
        [(i, 1, t) for i, t in enumerate([0, 10 * m, 50 * m, 55 * m])]
        + [(9, 2, 0)],
        "event_id long, user_id long, us long",
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    s = sessionize(df, gap_minutes=30)
    got = {
        (r["user_id"], r["event_id"]): r["session_id"] for r in s.collect()
    }
    # 0 -> s1, +10min same session, +40min gap -> s2, +5min same
    assert got == {(1, 0): 1, (1, 1): 1, (1, 2): 2, (1, 3): 2, (2, 9): 1}

    stats = {
        r["user_id"]: r for r in session_stats(df, gap_minutes=30).collect()
    }
    assert stats[1]["n_sessions"] == 2
    assert stats[1]["longest_session_events"] == 2
    assert stats[1]["total_dwell_us"] == 10 * m + 5 * m
    assert stats[2]["n_sessions"] == 1 and stats[2]["total_dwell_us"] == 0


def test_connected_components_basic(spark):
    # two components: {1,2,3,4} (chain) and {10,11}; 20 isolated (absent)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_on_long_chain(spark):
    # a 30-node chain needs ~15 hash-min rounds — well under max_iter,
    # and must converge exactly (single component labeled by min id)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    comp = connected_components(edges)
    assert comp.select(F.countDistinct("comp")).first()[0] == 1
    assert comp.where(F.col("comp") != 0).count() == 0


def test_components_min_label_equals_kernel(spark):
    """The bounded driver union-find solve (r15) and the distributed
    hash-min kernel must produce IDENTICAL labelings — forcing the
    bound to 0 exercises the fallback on the same input, so the scale
    path is never a correctness fork (the cluster store's rule)."""
    from hubspot_neo4j_pipeline_spark.operators.graph import (
        components_min_label,
    )

    import random

    rng = random.Random(7)
    # random clustered graph incl. a chain, a clique, self-loops, dups
    edges = (
        [(i, i + 1) for i in range(25)]
        + [(100 + a, 100 + b) for a in range(6) for b in range(a)]
        + [(500, 500), (600, 601), (600, 601)]
        + [(rng.randrange(200, 260), rng.randrange(200, 260)) for _ in range(80)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    via_driver = {
        (r["id"], r["comp"])
        for r in components_min_label(df).collect()
    }
    via_kernel = {
        (r["id"], r["comp"])
        for r in components_min_label(df, driver_max_edges=0).collect()
    }
    assert via_driver == via_kernel and len(via_driver) > 0


def test_components_min_label_string_ids(spark):
    from hubspot_neo4j_pipeline_spark.operators.graph import (
        components_min_label,
    )

    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    rows = {r["id"]: r["comp"] for r in components_min_label(df).collect()}
    assert rows == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    assert dict(components_min_label(df).dtypes) == {
        "id": "string", "comp": "string",
    }


def test_components_min_label_empty(spark):
    from hubspot_neo4j_pipeline_spark.operators.graph import (
        components_min_label,
    )

    df = spark.createDataFrame([], "src long, dst long")
    assert components_min_label(df).count() == 0


def test_dedup_clusters_shape(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    rows = {r["cluster_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[1]["n_members"] == 3 and rows[1]["max_member"] == 3
    assert rows[7]["n_members"] == 2 and rows[7]["min_member"] == 7


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from hubspot_neo4j_pipeline_spark.operators.graph import pagerank

    # small digraph incl. a dangling node (3) and a cycle
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 2), (3, 3)][:-1]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["id"]: r["rank"]
        for r in pagerank(edges, damping=0.85, n_iter=12).collect()
    }

    n = 5
    out_deg = np.zeros(n)
    adj = np.zeros((n, n))
    for s, d in edge_list:
        out_deg[s] += 1
        adj[s][d] += 1
    ranks = np.ones(n)
    for _ in range(12):
        new = np.full(n, 0.15)
        for s in range(n):
            if out_deg[s]:
                for d in range(n):
                    if adj[s][d]:
                        new[d] += 0.85 * adj[s][d] * ranks[s] / out_deg[s]
        ranks = new
    for i in range(n):
        assert abs(got[i] - ranks[i]) < 1e-9, (i, got[i], ranks[i])


def test_pagerank_quantized_tracks_double_variant(spark):
    """r12: the fixed-point variant (the DuckDB-oracle-exact path,
    registered as pagerank_topk) must track the double variant within
    quantization error — same recurrence, int64 arithmetic. Also pins
    the exact integer recurrence against a pure-Python replay, so the
    Spark plan and the SQL oracle share an independent ground truth."""
    from hubspot_neo4j_pipeline_spark.operators.graph import (
        PR_SCALE,
        pagerank,
        pagerank_quantized,
    )

    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 2)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    dbl = {
        r["id"]: r["rank"]
        for r in pagerank(edges, damping=0.85, n_iter=5).collect()
    }
    q = {
        r["id"]: r["rank_q"]
        for r in pagerank_quantized(edges, n_iter=5).collect()
    }
    for i in dbl:
        assert abs(q[i] / PR_SCALE - dbl[i]) < 1e-3, (i, q[i], dbl[i])

    # exact integer replay (the oracle's recurrence, driver-side)
    nodes = sorted({v for e in edge_list for v in e})
    out_deg = {s: sum(1 for a, _ in edge_list if a == s) for s in nodes}
    rq = {v: PR_SCALE for v in nodes}
    teleport = (PR_SCALE * 15) // 100
    for _ in range(5):
        mass = {v: 0 for v in nodes}
        for s, d in edge_list:
            mass[d] += rq[s] // out_deg[s]
        rq = {v: teleport + (85 * mass[v]) // 100 for v in nodes}
    assert q == rq


def test_pagerank_executes_edge_plan_once(spark):
    """r14 (guide §2.4/§5): the static graph frames (e, vertices,
    out_deg) are localCheckpointed, so the upstream edge plan must run
    EXACTLY once no matter how many rounds iterate — before the fix
    each round's plan re-derived all three from the source (n_iter+1
    executions). Pinned with an accumulator inside a pass-through
    mapInPandas on the edge frame: every edge row crosses the Python
    stage once iff the plan executed once."""
    from hubspot_neo4j_pipeline_spark.operators.graph import (
        pagerank_quantized,
    )

    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 2)]
    edges = spark.createDataFrame(edge_list, "src long, dst long").coalesce(1)
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = edges.mapInPandas(count_rows, "src long, dst long")
    pagerank_quantized(counted, n_iter=3).collect()
    assert acc.value == len(edge_list), acc.value
