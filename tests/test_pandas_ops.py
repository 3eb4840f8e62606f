"""applyInPandas per-group trend: known-slope fixture + exactness."""

from __future__ import annotations

import datetime

from hubspot_neo4j_pipeline_spark.operators.pandas_ops import user_value_trend


def test_trend_recovers_known_slope(spark):
    # user 1: value rises exactly 25 cents/minute (0.25 is binary-exact,
    # so floor(v*100) is the true cent count); user 2: constant
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for m in range(10):
        rows.append((1, t0 + datetime.timedelta(minutes=m), 1.00 + 0.25 * m))
        rows.append((2, t0 + datetime.timedelta(minutes=m), 5.00))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["user_id"]: r for r in user_value_trend(df).collect()}
    assert got[1]["n"] == 10 and got[2]["n"] == 10
    assert abs(got[1]["slope_cents_per_min"] - 25.0) < 1e-12
    assert got[2]["slope_cents_per_min"] == 0.0


def test_trend_single_event_group_is_flat(spark):
    df = spark.createDataFrame(
        [(7, datetime.datetime(2024, 1, 1), 3.33)],
        "user_id long, ts timestamp, value double",
    )
    (row,) = user_value_trend(df).collect()
    assert row["n"] == 1 and row["slope_cents_per_min"] == 0.0
