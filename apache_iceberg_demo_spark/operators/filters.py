"""Filter / projection operators (SURVEY.md §2 B2).

The reference exercises equality and conjunctive range predicates
(``/root/reference/README.md:91-96,107-109`` — Q1 ``passenger_count = 3``, Q2
``passenger_count = 1 AND trip_distance < 5``); this module widens that to the
full predicate algebra (BETWEEN, IN, LIKE, IS NULL, boolean composition) and
projection with computed columns.

Scale notes: every predicate here is Catalyst-pushable — it reaches the
Parquet scan as ``PushedFilters`` and prunes row groups via min/max stats,
which is the same effect the reference observes as Presto reading 6.55 MB of
a 2 GB table (``README.md:162``). Projections prune the read schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b2_filter_between",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
    """,
)
def b2_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: BETWEEN range predicate, row-level output (pushed to scan)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "b2_filter_in",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') AND l_linenumber IN (1, 2)
    """,
)
def b2_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: IN-list predicates (compiled to scan-pushable In filters)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R") & F.col("l_linenumber").isin(1, 2))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


@register(
    "b2_filter_like",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_name LIKE '%1%' AND c_mktsegment NOT LIKE 'A%'
    """,
)
def b2_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: LIKE / NOT LIKE string predicates (StartsWith/Contains pushdown)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_name").like("%1%") & ~F.col("c_mktsegment").like("A%"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "b2_filter_null_bool",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               nullif(o_orderstatus, 'O') AS status_or_null
        FROM orders
        WHERE (nullif(o_orderstatus, 'O') IS NULL AND o_totalprice > 50000)
           OR (o_orderstatus = 'F' AND NOT (o_totalprice BETWEEN 0 AND 100000))
    """,
)
def b2_filter_null_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: IS NULL + AND/OR/NOT boolean algebra over a derived nullable."""
    o = load(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.withColumn("status_or_null", status_or_null)
        .filter(
            (F.col("status_or_null").isNull() & (F.col("o_totalprice") > 50000))
            | (
                (F.col("o_orderstatus") == "F")
                & ~F.col("o_totalprice").between(0, 100000)
            )
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "status_or_null")
    )


@register(
    "b2_project_computed",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               round(l_extendedprice * (1 - l_discount), 6) AS net_price,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
               CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class
        FROM lineitem
        WHERE l_linenumber = 1
    """,
)
def b2_project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: projection with computed/conditional columns (A3-style derivation)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 6).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charged"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
    )


@register(
    "b2_filter_regex_ilike",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE regexp_matches(c_name, '0{3}[0-4]')
          AND c_mktsegment ILIKE '%Ware%'
    """,
)
def b2_filter_regex_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: regex predicate (rlike) + case-insensitive LIKE (ilike)."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").rlike(r"0{3}[0-4]") & F.col("c_mktsegment").ilike("%Ware%")
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "b2_sql_named_params",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 6) AS qty
        FROM lineitem
        WHERE l_quantity >= 30 AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
    """,
)
def b2_sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: parameterized SQL (`spark.sql(query, args={...})`) — named
    parameter markers bind as LITERALS in the parsed plan, not string
    interpolation: injection-proof, plan-cache-friendly, and the values
    still constant-fold into pushed filters like any literal. The front
    door a 100 TB query service actually exposes."""
    from apache_iceberg_demo_spark.io import register_views

    register_views(spark, sf_dir, tables=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 6) AS qty
        FROM lineitem
        WHERE l_quantity >= :min_qty AND l_shipdate < :cutoff
        GROUP BY l_returnflag
        """,
        args={"min_qty": 30, "cutoff": "1997-01-01 00:00:00"},
    )
