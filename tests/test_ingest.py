"""A1-A6 ingest pipeline roundtrip (SURVEY.md §7 phase 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_demo_spark.ingest import lineitem_pipeline
from apache_iceberg_demo_spark.io import load

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_matches_source(spark, tmp_path):
    src = load(spark, SF, "lineitem").limit(500)
    csv_dir = str(tmp_path / "csv")
    src.write.mode("overwrite").option("header", True).csv(csv_dir)

    out = lineitem_pipeline().run(spark, csv_dir, str(tmp_path / "wh"), "li")

    # derived partition column exists and is a yyyy-MM-dd string (csv_to_ice.py:25)
    assert dict(out.dtypes)["ship_day"] == "string"
    assert out.count() == 500

    # values survive the roundtrip: compare keyed checksums
    a = src.agg(
        F.sum("l_orderkey").alias("k"),
        F.round(F.sum("l_extendedprice"), 2).alias("p"),
    ).collect()[0]
    b = out.agg(
        F.sum("l_orderkey").alias("k"),
        F.round(F.sum("l_extendedprice"), 2).alias("p"),
    ).collect()[0]
    assert (a.k, a.p) == (b.k, b.p)

    # casts applied: inferSchema + explicit coercion pass (csv_to_ice.py:19-22)
    dtypes = dict(out.dtypes)
    assert dtypes["l_orderkey"] == "bigint"
    assert dtypes["l_quantity"] == "double"
    assert dtypes["l_shipdate"] == "timestamp"


def test_binaryfile_ingest_roundtrip(spark):
    """binaryFile source reads back executor-written blobs byte-identical
    (the operator raises internally on any mismatch)."""
    from apache_iceberg_demo_spark import registry

    registry.load_all()
    out = registry.QUERIES["b1_binaryfile_ingest"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 200
    assert all(r.length > 0 and len(r.sha256_prefix) == 16 for r in rows)
