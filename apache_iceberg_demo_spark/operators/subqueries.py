"""Subquery surface (SURVEY.md §2 B2 extension) — scalar, IN, correlated
EXISTS, and correlated scalar subqueries through the SQL entry point.

Catalyst de-correlates these into joins (RewriteCorrelatedScalarSubquery /
RewritePredicateSubquery), so the 100 TB behavior is exactly the join
section's: semi/anti joins for predicates, aggregated-then-joined scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import register_views
from apache_iceberg_demo_spark.registry import register


@register(
    "b2_scalar_subquery",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 6) AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
)
def b2_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: uncorrelated scalar subquery (planned as a broadcast of 1 value)."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 6) AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


@register(
    "b2_in_subquery",
    oracle="""
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '1%'
        ) AND l_linenumber <= 2
    """,
)
def b2_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: IN subquery — Catalyst rewrites to a left-semi join."""
    register_views(spark, sf_dir, tables=("orders", "lineitem"))
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '1%'
        ) AND l_linenumber <= 2
        """
    )


@register(
    "b2_correlated_exists",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
    """,
)
def b2_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: correlated EXISTS — de-correlated into a semi join on custkey."""
    register_views(spark, sf_dir, tables=("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@register(
    "b2_correlated_scalar",
    oracle="""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS price
        FROM orders o
        WHERE o_totalprice = (
            SELECT max(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
    """,
)
def b2_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: correlated scalar subquery (max order per customer) — rewritten
    into an aggregate + join; equivalent to the window top-1 pattern."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS price
        FROM orders o
        WHERE o_totalprice = (
            SELECT max(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "b2_not_in_null_semantics",
    oracle="""
        SELECT
          CAST((SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT CASE WHEN c_acctbal < 0
                                                    THEN c_custkey END
                                        FROM customer)) AS BIGINT)
              AS n_null_poisoned,
          CAST((SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                        WHERE c_acctbal < 0)) AS BIGINT)
              AS n_null_filtered
    """,
)
def b2_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: the NOT IN null trap, demonstrated and verified on both engines.
    One NULL in the subquery makes ``x NOT IN (...)`` UNKNOWN for every row
    — the poisoned leg returns 0; filtering nulls out of the subquery
    (the fix) returns the thousands of rows people expect.

    Spark plans the poisoned leg as a null-aware anti join (broadcast +
    null-check on the build side — the reason NOT IN is more expensive than
    NOT EXISTS at scale) and the filtered leg as a plain left-anti; both
    through the real SQL front door so the planner, not hand-rolled joins,
    owns the semantics."""
    from apache_iceberg_demo_spark.io import register_views

    register_views(spark, sf_dir, tables=("orders", "customer"))
    return spark.sql(
        """
        SELECT
          CAST((SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT CASE WHEN c_acctbal < 0
                                                    THEN c_custkey END
                                        FROM customer)) AS BIGINT)
              AS n_null_poisoned,
          CAST((SELECT count(*) FROM orders
                WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                        WHERE c_acctbal < 0)) AS BIGINT)
              AS n_null_filtered
        """
    )


@register(
    "b2_recursive_cte_spine",
    oracle="""
        WITH RECURSIVE months(m) AS (
          SELECT CAST((SELECT min(o_orderdate) FROM orders) AS TIMESTAMP)
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < (SELECT max(o_orderdate) FROM orders)
        )
        SELECT m AS month_start,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM months
        LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m
    """,
)
def b2_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: recursive CTE (Spark 4) — a generated calendar spine: months from
    min to max order date, LEFT JOINed so empty months surface as zero rows
    (the gap a plain GROUP BY silently swallows; the spine-join counterpart
    of the LOCF gap-fill in `b5_gap_fill_forward`).

    The bounds are read ONCE up front (one 2-value aggregate — at scale
    they'd come free from parquet footer/manifest stats) and inlined as
    literals: Spark re-evaluates a scalar subquery inside the recursive
    member on EVERY iteration, which turned an 80-step spine into 80 orders
    scans (measured 18.8 s → ~1 s). The oracle keeps the subquery form —
    DuckDB computes the identical bounds itself, so results match while the
    recursion text stays self-contained."""
    from apache_iceberg_demo_spark.io import load, register_views

    register_views(spark, sf_dir, tables=("orders",))
    lo, hi = (
        load(spark, sf_dir, "orders")
        .agg(F.min("o_orderdate"), F.max("o_orderdate"))
        .collect()[0]
    )
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S}'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '{hi:%Y-%m-%d %H:%M:%S}'
        )
        SELECT m AS month_start,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM months
        LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m
        """
    )
