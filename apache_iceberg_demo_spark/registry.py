"""Query + oracle registry — the driver contract's backbone.

Every implemented operator from SURVEY.md §2 registers here:

- a *query*: ``(spark, sf_dir) -> DataFrame`` (Spark-first implementation), and
- optionally an *oracle*: the equivalent ANSI SQL DuckDB runs on the same
  parquet (driver compares row count + schema + order-insensitive value-hash).

This reproduces the reference's own correctness methodology — an identical
query suite run on two independent engines with results diffed
(``/root/reference/README.md:85-211``, DuckDB vs Presto) — as an automated,
per-operator gate.

Float discipline (SURVEY.md §5.3): the reference's own cross-engine AVGs
diverge in the last ~6 digits (``README.md:113`` vs ``:172``), so every double
aggregate is rounded (helper ``round6``) on BOTH sides before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle SQL, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from apache_iceberg_demo_spark.operators import (  # noqa: F401
        aggregates,
        asof,
        dedup,
        filters,
        joins,
        multimodal,
        reshape,
        sampling,
        setops,
        similarity,
        sorts,
        subqueries,
        text,
        windows,
    )
    from apache_iceberg_demo_spark import ingest  # noqa: F401
    from apache_iceberg_demo_spark.functions import scalars, udfs  # noqa: F401
    from apache_iceberg_demo_spark.sources import formats, warehouse  # noqa: F401
    from apache_iceberg_demo_spark.streaming import windows as swindows  # noqa: F401
