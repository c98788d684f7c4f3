"""Plan-inspection helpers (SURVEY.md §4).

The reference *observes* its engines' optimizations rather than implementing
them — Presto reads 6.55 MB of a 2 GB table for Q1 (``README.md:162``), which
is predicate pushdown + column pruning at work. These helpers make the same
observations assertable on our Catalyst plans, so tests lock in the plan
shapes (pushdown reached the scan, the dim join broadcast, codegen spans
exist) rather than just row values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """Post-AQE final plan (materializes the query)."""
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lines from every scan in the plan."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in line for line in pushed_filters(df))


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    import re

    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            cols = set(re.findall(r"(\w+):", line.split("struct<", 1)[-1]))
            out.append(cols)
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """One entry per join node (parsed from the detail-section headers —
    node names also appear in the plan tree, which would double-count)."""
    import re

    kinds = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
    out = []
    for line in formatted_plan(df).splitlines():
        m = re.match(r"^\(\d+\)\s+(\w+)", line.strip())
        if m and m.group(1) in kinds:
            out.append(m.group(1))
    return out


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and "Exchange" in line and "BroadcastExchange" not in line
    )


def codegen_span_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
