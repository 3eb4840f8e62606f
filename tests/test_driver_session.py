"""The verification driver passes its OWN SparkSession to
entry()/queries() — typically built without nanosAsLong (events reads
would throw PARQUET_TYPE_ILLEGAL) and possibly with a non-UTC session
timezone (date_trunc/window results would shift vs the DuckDB oracle).

This test runs representative queries in a subprocess whose session is
deliberately hostile (America/New_York, no nanos flag) and checks the
results still match DuckDB exactly."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import duckdb
import __spark_entry__ as e
from verify_queries import compare

sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

names = ["recent_activity", "windowed_event_counts", "quarterly_deal_trend",
         "epoch_roundtrip", "latest_event_per_user", "campaign_stats"]
qs, oracles = e.queries(), e.oracle_sql()
failures = []
for name in names:
    sdf = qs[name](spark, sf).toPandas()
    odf = con.execute(oracles[name]).fetchdf()
    problems = compare(name, sdf, odf)
    if problems:
        failures.append((name, problems))
if failures:
    for name, p in failures:
        print("FAIL", name, p)
    sys.exit(1)
print("ALL_MATCH")
"""


def test_queries_survive_hostile_driver_session():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=300
    )
    assert "ALL_MATCH" in res.stdout, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-2000:]}"
