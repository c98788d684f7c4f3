"""apache_iceberg_demo_spark — a PySpark-native data-lake analytics engine.

Brand-new implementation of the capability surface of the reference repo
``eduard-daily/apache-iceberg-demo`` (CSV -> partitioned Iceberg-style table ETL,
an analytical query suite differential-tested across engines, plus an extended
LLM-data-pipeline operator surface), re-expressed Spark-first: declarative
DataFrame/SQL plans that Catalyst + Tungsten optimize, designed for a
1000-executor / 100 TB deployment even though tests run on local[32].

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
- ``io``         : testdata table loaders + temp-view registration
- ``registry``   : query + DuckDB-oracle registry (driver contract)
- ``ingest``     : the reference's CSV->cast->derive->sort->partitioned-write ETL
- ``operators``  : relational + LLM-pipeline operators (joins, aggs, windows,
                   dedup, similarity, text, as-of, sessionization)
- ``functions``  : scalar-function surface (string/date/math/array/JSON)
- ``sources``    : warehouse layer — snapshot-versioned Parquet table format
                   with Iceberg-style metadata tables, time travel, compaction
- ``streaming``  : Structured Streaming operators (windows, watermark, dedup)
- ``plans``      : plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
