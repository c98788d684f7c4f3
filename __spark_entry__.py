"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``apache_iceberg_demo_spark`` package: every operator from
SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame`` query and (where
SQL-expressible) a DuckDB oracle — reproducing the reference's cross-engine
differential-testing methodology (``/root/reference/README.md:85-211``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_demo_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary on lineitem — the reference Q3 shape
    (filter → hash aggregate → sort, ``/root/reference/README.md:120-143``)
    widened to 8 aggregates.
    """
    return registry.QUERIES["flagship_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(registry.ORACLES)
