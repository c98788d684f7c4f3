"""Set operations (SURVEY.md §2 B7) — absent from the reference, required surface.

UNION ALL is a zero-shuffle concatenation in Spark; DISTINCT / INTERSECT /
EXCEPT each cost one hash shuffle on the full row. At 100 TB prefer
pre-aggregated inputs (as these queries do — set ops over key columns, not
wide rows) so the shuffled payload is keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b7_union_all",
    oracle="""
        SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT o_custkey AS key, 'order' AS src FROM orders WHERE o_totalprice > 400000
    """,
)
def b7_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: UNION ALL — plan-level concatenation, no shuffle."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("key"), F.lit("order").alias("src"))
    )
    return c.unionAll(o)


@register(
    "b7_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def b7_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: UNION (distinct) — concat + hash-distinct on the key column only."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "b7_union_by_name",
    oracle="""
        SELECT n_name AS name, n_nationkey AS key FROM nation
        UNION ALL
        SELECT r_name AS name, r_regionkey AS key FROM region
    """,
)
def b7_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: unionByName — schema aligned by column name, not position."""
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
    )
    r = load(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.col("r_regionkey").alias("key")
    )
    return n.unionByName(r)  # note: n has (key,name), r has (name,key)


@register(
    "b7_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def b7_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: INTERSECT — customers with both open and finished orders."""
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    done = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_.intersect(done)


@register(
    "b7_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
    """,
)
def b7_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: EXCEPT — customer keys absent from orders (set difference).

    ``subtract`` is Spark's EXCEPT DISTINCT: a left value is dropped whenever
    it appears in the right side at ALL, independent of multiplicities —
    unlike ``exceptAll().distinct()``, which keeps a left value whose left
    multiplicity exceeds its right multiplicity (wrong unless the key is
    unique; ADVICE r01).
    """
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


@register(
    "b7_distinct_pairs",
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def b7_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: DISTINCT over a column pair (maps to partial+final hash aggregate)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "b7_drop_duplicates_subset",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderstatus
        FROM (
            SELECT o_custkey, o_orderkey, o_orderstatus,
                   row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                      ORDER BY o_orderkey) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
)
def b7_drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: deterministic dropDuplicates on a subset — keep min orderkey per
    (custkey, status). Implemented as window+filter (not ``dropDuplicates``,
    which keeps an *arbitrary* row and would flap the oracle hash)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderstatus")
    )


@register(
    "b7_intersect_all",
    oracle="""
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT ALL
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def b7_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: INTERSECT ALL — bag semantics (keeps min-multiplicity duplicates,
    unlike ``b7_intersect``'s set semantics). Implemented as a hash-partitioned
    count-compare on the key, so the shuffle carries one row per distinct
    value, not per duplicate."""
    c = load(spark, sf_dir, "customer")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    right = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return left.intersectAll(right)


@register(
    "b7_except_all",
    oracle="""
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT ALL
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def b7_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: EXCEPT ALL — bag difference (multiplicity-aware), the dedup-style
    primitive behind "remove one occurrence per match" retractions."""
    c = load(spark, sf_dir, "customer")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    right = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return left.exceptAll(right)
