"""Pivot / unpivot / map-typed reshaping (SURVEY.md §2 B5/B8 extensions).

Pivot is a groupBy with CASE-filtered aggregates per pivot value (explicit
value lists only — an implicit-values pivot needs a distinct pass first,
which is a hidden extra job at 100 TB). Unpivot is `stack()` — a plan-level
row expansion, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b5_pivot_status_counts",
    oracle="""
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_linestatus = 'O') AS status_o,
               count(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 6) AS qty_o,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 6) AS qty_f
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b5_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: pivot with an explicit value list (one pass, no distinct job)."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_quantity"), 6).alias("qty"))
    )
    return p.select(
        "l_returnflag",
        F.col("O_cnt").alias("status_o"),
        F.col("F_cnt").alias("status_f"),
        F.col("O_qty").alias("qty_o"),
        F.col("F_qty").alias("qty_f"),
    )


@register(
    "b5_unpivot_measures",
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, round(val, 6) AS val
        FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
                   l_quantity AS val
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem WHERE l_linenumber = 1
        )
    """,
)
def b5_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: unpivot via stack() — wide measures to (measure, value) rows,
    plan-level expansion (no shuffle, no union re-scan like the oracle)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (measure, raw_val)",
    ).select(
        "l_orderkey", "l_linenumber", "measure", F.round("raw_val", 6).alias("val")
    )


@register(
    "b8_map_funcs",
    oracle="""
        WITH m AS (
            SELECT lang, count(*) AS n FROM documents GROUP BY lang
        )
        SELECT lang, n AS n_via_map, 2 AS n_keys, 'lang,n' AS key_csv
        FROM m
    """,
)
def b8_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: map construction + map_keys/map_values/element_at. The map is
    built and interrogated Spark-side; the output is flattened to scalars so
    the oracle compares values, not engine-specific map encodings."""
    d = load(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n"))
    m = F.create_map(
        F.lit("lang"), F.col("lang").cast("string"), F.lit("n"), F.col("n").cast("string")
    )
    return d.select(
        "lang",
        F.element_at(m, "n").cast("bigint").alias("n_via_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("key_csv"),
    )
