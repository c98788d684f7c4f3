"""CSV → partitioned-table ingest pipeline (SURVEY.md §2 A1-A6).

Re-expresses the reference's entire ETL job (``/root/reference/scripts/
csv_to_ice.py``) as a reusable, schema-declared pipeline:

  A1 CSV scan (header, inferSchema)     ``csv_to_ice.py:17``
  A2 explicit per-column casts          ``csv_to_ice.py:19-22``
  A3 derived partition column           ``csv_to_ice.py:25`` (date_format)
  A4 pre-write global sort (clustering) ``csv_to_ice.py:27``
  A5/A6 partitioned replace-write       ``csv_to_ice.py:30-58``

Differences from the reference, on purpose:
- The write targets the engine's snapshot-versioned Parquet warehouse
  (``sources/warehouse.py``) — the Iceberg-runtime jar is not available in
  this offline environment, so the warehouse layer provides the same
  create-or-replace, snapshot, and metadata-table semantics natively
  (SURVEY.md §7 "mandatory Parquet fallback abstraction").
- The reference's DDL-then-replace quirk (its CREATE TABLE schema is dead
  code because ``createOrReplace()`` derives the final schema from the
  DataFrame — SURVEY.md §1.3) is made explicit: the *DataFrame* schema wins,
  and tests assert it.

Scale notes: the pre-write sort is a range-exchange (sample + range partition
+ per-partition sort) — the TeraSort pattern, linear at 100 TB. Partition
column choice follows the reference (a date-grain string), which keeps
partition cardinality bounded (~days) rather than exploding the file count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.registry import register


@dataclass
class CsvIngestPipeline:
    """Declarative CSV→table pipeline mirroring ``csv_to_ice.py``."""

    casts: dict[str, str] = field(default_factory=dict)  # column -> type name
    derive_partition: tuple[str, str] | None = None  # (new_col, source ts col)
    sort_by: list[str] = field(default_factory=list)
    #: the reference's grain is daily (csv_to_ice.py:25); month grain bounds
    #: partition cardinality when the dataset spans years at small volume
    partition_format: str = "yyyy-MM-dd"

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        """A1: CSV scan with header + schema inference (``csv_to_ice.py:17``)."""
        return spark.read.csv(path, header=True, inferSchema=True)

    def transform(self, df: DataFrame) -> DataFrame:
        """A2+A3+A4: casts, derived partition column, pre-write clustering sort."""
        for col, typ in self.casts.items():
            df = df.withColumn(col, F.col(col).cast(typ))
        if self.derive_partition is not None:
            new_col, src = self.derive_partition
            # exactly the reference's derivation (csv_to_ice.py:25):
            # date_format returns a yyyy-MM-dd *string*
            df = df.withColumn(new_col, F.date_format(F.col(src), self.partition_format))
        if self.sort_by:
            df = df.orderBy(*self.sort_by)
        return df

    def run(self, spark: SparkSession, csv_path: str, warehouse_dir: str, table: str) -> DataFrame:
        """Full pipeline: read → transform → partitioned create-or-replace write.

        Returns the re-read table (A7 scan) for verification.
        """
        from apache_iceberg_demo_spark.sources.warehouse import Warehouse

        df = self.transform(self.read(spark, csv_path))
        wh = Warehouse(spark, warehouse_dir)
        part_col = self.derive_partition[0] if self.derive_partition else None
        wh.create_or_replace(table, df, partition_by=part_col)
        return wh.read(table)


def lineitem_pipeline() -> CsvIngestPipeline:
    """The reference pipeline transposed to the driver's lineitem table:
    partition column derived from ``l_shipdate`` exactly like
    ``csv_to_ice.py:25`` derives ``pickup_date``; clustering sort on
    (l_returnflag, ship_day) mirrors ``csv_to_ice.py:27``."""
    return CsvIngestPipeline(
        casts={
            "l_orderkey": "bigint",
            "l_linenumber": "int",
            "l_quantity": "double",
            "l_extendedprice": "double",
            "l_shipdate": "timestamp",
        },
        derive_partition=("ship_day", "l_shipdate"),
        sort_by=["l_returnflag", "ship_day"],
    )


@register(
    "a01_a06_csv_ingest_roundtrip",
    oracle="""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_day,
               count(*) AS n,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS value
        FROM lineitem
        WHERE l_orderkey % 31 = 0
        GROUP BY strftime(l_shipdate, '%Y-%m')
    """,
)
def a01_a06_csv_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A6 end-to-end, oracle-verified: export a deterministic lineitem
    subset to CSV, ingest through the full pipeline (infer → cast → derive →
    sort → partitioned replace-write into the snapshot warehouse), re-read,
    aggregate per partition. The oracle computes the same aggregate straight
    from the parquet — so every stage of the CSV roundtrip (type inference,
    coercion, timestamp serialization, partition derivation, write/read) is
    value-hash-verified, not just row-counted."""
    from apache_iceberg_demo_spark.io import load, scratch_dir

    tmp = scratch_dir("ingest_q_")
    csv_dir = f"{tmp}/csv"
    src = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 31 == 0)
    src.write.mode("overwrite").option("header", True).csv(csv_dir)

    pipeline = lineitem_pipeline()
    pipeline.partition_format = "yyyy-MM"  # bound partition count at demo volume
    out = pipeline.run(spark, csv_dir, f"{tmp}/wh", "lineitem_ingested")
    return out.groupBy("ship_day").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 6
        ).alias("value"),
    )
