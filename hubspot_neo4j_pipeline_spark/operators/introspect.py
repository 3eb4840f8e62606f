"""Schema introspection (SURVEY.md §2.1 S18) — the Spark analog of
get_schema.py:19-97 (labels, counts, sample properties, constraints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def describe_tables(
    spark: SparkSession, tables: dict[str, DataFrame]
) -> DataFrame:
    """One row per table: name, column count, row count, column list."""
    rows = [
        (
            name,
            len(df.columns),
            df.count(),
            ", ".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields),
        )
        for name, df in sorted(tables.items())
    ]
    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType()),
            T.StructField("n_columns", T.IntegerType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("columns", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
