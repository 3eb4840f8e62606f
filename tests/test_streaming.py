"""Streaming ≡ batch equivalence: the same transformation run as a
Structured Streaming query over a file source must produce exactly
the batch result (the batch plan is the oracle)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.sources.tpch import load_table
from hubspot_neo4j_pipeline_spark.streaming import (
    read_event_stream,
    sessionize,
    windowed_event_counts,
)
from hubspot_neo4j_pipeline_spark.streaming.event_analytics import run_stream_to_memory


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_windowed_counts_stream_equals_batch(spark, events, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    # write in 3 files → 3 micro-batches
    events.repartition(3).write.mode("overwrite").parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(events).collect()
    }
    stream_df = windowed_event_counts(read_event_stream(spark, src))
    assert stream_df.isStreaming
    run_stream_to_memory(stream_df, "wec_test")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM wec_test").collect()
    }
    assert set(streamed) == set(batch)
    for k, (n, tv) in batch.items():
        sn, stv = streamed[k]
        assert sn == n
        assert abs(stv - tv) < 1e-6


def test_sessionize_batch_sanity(events):
    sessions = sessionize(events, gap="30 minutes")
    rows = sessions.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1
    # sessions per user don't overlap
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for _, rs in by_user.items():
        rs.sort(key=lambda r: r["session_start"])
        for a, b in zip(rs, rs[1:]):
            assert a["session_end"] < b["session_start"]


def test_stateful_running_stats_stream_equals_batch(spark, events, tmp_path_factory):
    """applyInPandasWithState: after the stream drains, per-key state
    must equal the batch aggregate (update-mode emits one row per key
    per batch; the LAST row per key is the final state)."""
    from pyspark.sql import Window
    from hubspot_neo4j_pipeline_spark.streaming.stateful import (
        running_user_stats,
        running_user_stats_batch,
    )

    src = str(tmp_path_factory.mktemp("stateful_src"))
    events.repartition(4).write.mode("overwrite").parquet(src)

    stream = running_user_stats(read_event_stream(spark, src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # final state = last emitted row per user (monotone n_events)
    out = spark.sql(
        """
        SELECT user_id, n_events, total_value, last_seen FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) AS rn
            FROM stateful_test) WHERE rn = 1
        """
    ).collect()
    got = {r["user_id"]: r for r in out}
    expected = {r["user_id"]: r for r in running_user_stats_batch(events).collect()}
    assert set(got) == set(expected)
    for uid, exp in expected.items():
        assert got[uid]["n_events"] == exp["n_events"]
        assert abs(got[uid]["total_value"] - exp["total_value"]) < 1e-6
        assert got[uid]["last_seen"] == exp["last_seen"]
