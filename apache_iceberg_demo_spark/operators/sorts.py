"""Sort / limit / top-k operators (SURVEY.md §2 B6, reference A4/A13).

The reference's two sorts: a global pre-write sort for file clustering
(``csv_to_ice.py:27``) and an ORDER BY over 10 aggregate rows
(``README.md:128``). Spark plans a global sort as sample→range-exchange→
per-partition sort (TeraSort shape) — fine at 100 TB; ORDER BY + LIMIT k is
planned as TakeOrderedAndProject (per-partition top-k heap + driver merge, no
global sort at all), which is the form we prefer for every "top N" question.

Determinism: LIMIT-carrying queries always sort on a key suffix that is
unique ((orderkey, linenumber) PK) so result sets are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b6_topk_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 6) AS price
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
)
def b6_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: global top-k — TakeOrderedAndProject, never a full sort."""
    return (
        load(spark, sf_dir, "lineitem")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 6).alias("price"))
    )


@register(
    "b6_limit_offset",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 6) AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50 OFFSET 25
    """,
)
def b6_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: LIMIT with OFFSET (pagination) on a deterministic order."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(25)
        .limit(50)
        .select("o_orderkey", F.round("o_totalprice", 6).alias("price"))
    )


@register(
    "b6_sort_nulls_placement",
    oracle="""
        SELECT o_orderkey, nullif(o_orderstatus, 'P') AS maybe_status,
               round(o_totalprice, 6) AS price
        FROM orders
        ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST,
                 o_totalprice DESC, o_orderkey
        LIMIT 200
    """,
)
def b6_sort_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: explicit NULLS FIRST placement on a derived nullable sort key."""
    o = load(spark, sf_dir, "orders").withColumn(
        "maybe_status", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    return (
        o.orderBy(
            F.col("maybe_status").asc_nulls_first(),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(200)
        .select("o_orderkey", "maybe_status", F.round("o_totalprice", 6).alias("price"))
    )
