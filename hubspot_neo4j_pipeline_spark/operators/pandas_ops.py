"""Batch applyInPandas operators (Arrow-vectorized per-group Python).

Completes the Pandas-UDF family next to mapInPandas (multimodal
feature extraction) and applyInPandasWithState (streaming per-key
stats): a per-GROUP batch computation whose semantics genuinely want
imperative code, executed over Arrow record batches — never
row-at-a-time Python.

The demo op is a per-user least-squares trend of event value over
time. It is deliberately computed with EXACT integer arithmetic
(Python arbitrary-precision ints over cents × minute offsets) and one
final float division, so the DuckDB oracle (BIGINT sums, identical
formula) matches bit-for-bit — the same discipline as
plans/analytics_queries.py:lineitem_moments, proving the Python path
can be held to the same cross-engine bar as JVM expressions. All
intermediate sums fit BIGINT by construction (minute granularity,
month-scale windows); int64→double conversion is correctly rounded in
both engines.

Scale: applyInPandas shuffles once on the group key; each group must
fit in executor memory (users × a month of events — fine). At larger
per-group volumes, switch the exact sums to map-side partial
aggregates (the moments pattern) and keep only the final formula here.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

US_PER_MINUTE = 60_000_000

TREND_SCHEMA = "user_id long, n long, slope_cents_per_min double"


def _group_trend(pdf):
    import pandas as pd

    # exact integer domain: minutes since the user's first event ×
    # value in cents (floor(v*100) — same IEEE op as the oracle's floor)
    us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
    x0 = min(us)
    xs = [(u - x0) // US_PER_MINUTE for u in us]
    ys = [math.floor(v * 100) for v in pdf["value"].tolist()]
    n = len(xs)
    sx = sum(xs)
    sy = sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den) if den else 0.0
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n": [n],
            "slope_cents_per_min": [slope],
        }
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """(user_id, n, slope_cents_per_min): least-squares slope of event
    value (cents) over minutes-since-first-event, per user."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_group_trend, schema=TREND_SCHEMA)
    )
