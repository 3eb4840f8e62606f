"""Local replica of the driver's correctness gate.

Runs every registered Spark query and its DuckDB oracle at a given SF
and compares: row count, sorted column names, and exact cell values
(rows sorted by all columns). Stricter than a hash compare — if this
passes, any order-insensitive value hash matches too.

Usage: python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cells_equal(a, b) -> bool:
    an, bn = pd.isna(a), pd.isna(b)
    if an or bn:
        return bool(an) == bool(bn)
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
    return a == b


def _dtype_problems(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Representation parity: the driver's value hash is type-sensitive, so a
    DuckDB HUGEINT/DECIMAL column that numerically equals Spark's BIGINT/DOUBLE
    still hash-mismatches. Flag any column whose pandas dtype kind differs
    (int vs float vs object) or whose object cells are Decimal/int128-ish."""
    problems: list[str] = []
    for c in sorted(set(spark_df.columns) & set(oracle_df.columns)):
        sk = spark_df[c].dtype.kind
        ok = oracle_df[c].dtype.kind
        if ok == "O":
            sample = next((v for v in oracle_df[c] if v is not None), None)
            if sample is not None and type(sample).__name__ == "Decimal":
                problems.append(
                    f"col {c}: oracle returns Decimal objects (dtype=object); "
                    f"CAST the SQL expression to BIGINT/DOUBLE"
                )
                continue
        if sk != ok and {sk, ok} <= {"i", "u", "f"}:
            problems.append(
                f"col {c}: dtype kind differs spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype}; the driver hash is type-sensitive"
            )
    return problems


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems: list[str] = _dtype_problems(spark_df, oracle_df)
    s, o = _normalize(spark_df), _normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        # keep the dtype problems already collected — a query failing both
        # checks should report both, not just the column diff
        problems.append(
            f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"
        )
        return problems
    if len(s) != len(o):
        return [f"row count differs: spark={len(s)} oracle={len(o)}"]
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _cells_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} cells differ; first at row {i}: "
                f"spark={x!r} oracle={y!r}"
            )
    return problems


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from hubspot_neo4j_pipeline_spark.plans import get_oracles, get_queries
    from hubspot_neo4j_pipeline_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    # Bound the in-process DuckDB engine and let it SPILL instead of
    # growing: its default limit (80% of RAM) stacks on top of the
    # Spark driver JVM and the pandas compare frames — an unbounded
    # 100x-scale oracle (e.g. the 19M-row LSH scored CTE) OOM-killed
    # the whole process. 40 GB + a temp dir keeps the big oracles
    # runnable (slower, disk-backed) without taking the box down.
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCKDB_MEM', '40GB')}'"
    )
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(
        f"SET threads={int(os.environ.get('SPARK_GRAFT_DUCKDB_THREADS', '16'))}"
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = get_queries(), get_oracles()
    n_pass = n_fail = n_rowsonly = 0
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            # several operators cache multi-consumer intermediates
            # (LSH buckets, MinHash sigs, pair sets, term explodes);
            # drop them between queries so a 111-query run does not
            # accumulate dead cached blocks (bench.py does the same)
            spark.catalog.clearCache()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "spark raised"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            results[name] = {"status": "rows_only", "rows": len(sdf)}
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "oracle raised"}
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"    {p}")
            results[name] = {"status": "fail", "rows": len(sdf), "problems": problems}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            results[name] = {"status": "pass", "rows": len(sdf)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rowsonly,
                    "compare": "rows + sorted columns + exact cell values + dtype-kind parity",
                    "queries": results,
                },
                fh,
                indent=1,
            )
        from tools import gatefresh

        gatefresh.record([json_out])  # gate-freshness (r11): artifact pins the engine code it measured
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
