"""Window-function operators (SURVEY.md §2 B5) — absent from the reference.

All window specs partition on a natural key (customer, user, brand) so state
per partition is bounded; nothing here requires a global window (the one
100 TB anti-pattern for window functions — a single unpartitioned ORDER BY
funnels the table through one task).

Determinism discipline: every ORDER BY inside a window spec ends with a
unique tie-breaker column so row_number/lag/lead results are stable across
engines (DuckDB parity would otherwise flap on ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b5_row_number_topk",
    oracle="""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS price, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
)
def b5_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: top-K per group via row_number (the scalable per-group top-k)."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("price"),
            "rn",
        )
    )


@register(
    "b5_rank_dense_ntile",
    oracle="""
        SELECT p_brand, p_partkey,
               rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
               dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
               ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS quartile
        FROM part
    """,
)
def b5_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: rank / dense_rank / ntile over one partitioning (single shuffle)."""
    p = load(spark, sf_dir, "part")
    w_price = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    w_size = W.partitionBy("p_brand").orderBy("p_size")
    w_tile = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w_price).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_size).cast("bigint").alias("drnk"),
        F.ntile(4).over(w_tile).cast("bigint").alias("quartile"),
    )


@register(
    "b5_lag_lead",
    oracle="""
        SELECT user_id, event_id, event_type,
               lag(event_type)  OVER w AS prev_type,
               lead(event_type) OVER w AS next_type,
               round(value - lag(value) OVER w, 6) AS value_delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def b5_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: lag/lead over per-user event streams (ts + event_id tiebreak)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@register(
    "b5_running_agg",
    oracle="""
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_sum,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_3,
               count(*) OVER (PARTITION BY user_id) AS user_events
        FROM events
    """,
)
def b5_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: running sum + 3-row moving average + whole-partition count."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 6).alias(
            "running_sum"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg_3"),
        F.count("*").over(W.partitionBy("user_id")).alias("user_events"),
    )


@register(
    "b5_range_frame",
    oracle="""
        SELECT o_orderstatus, o_orderkey, round(o_totalprice, 6) AS price,
               count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS peers_within_10k
        FROM orders
    """,
)
def b5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: value-based RANGE frame (tie-insensitive, deterministic by design)."""
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        F.round("o_totalprice", 6).alias("price"),
        F.count("*").over(w).alias("peers_within_10k"),
    )


@register(
    "b5_value_functions",
    oracle="""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS cheapest_order,
               last_value(o_orderkey) OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS priciest_order,
               nth_value(o_orderkey, 2) OVER w AS second_cheapest
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def b5_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: first_value / last_value / nth_value — frame-boundary pickers.
    last_value gets the full-partition frame (the default running frame is
    the classic wrong-answer trap, identical in both engines)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
    )


@register(
    "b5_percent_rank_cume_dist",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6)    AS cum_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def b5_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: relative-position window functions — percent_rank / cume_dist.

    The unique (o_totalprice, o_orderkey) tie-breaker makes both functions
    deterministic across engines (module-docstring discipline). Partitioning
    on o_custkey keeps per-partition state tiny and cardinality high — the
    scale-safe shape (vs a single global ORDER BY window).
    """
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register(
    "b5_gap_fill_forward",
    oracle="""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n, round(sum(value), 6) AS v
            FROM events
            WHERE user_id % 50 = 0
            GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
        ),
        grid AS (
            SELECT s.user_id,
                   unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS hour
            FROM spans s
        )
        SELECT g.user_id,
               CAST(g.hour AS TIMESTAMP) AS hour,
               coalesce(h.n, 0) AS n_events,
               last_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING) AS filled_value
        FROM grid g LEFT JOIN hourly h USING (user_id, hour)
        ORDER BY user_id, hour
    """,
)
def b5_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 (hypertable gap-fill shape): densify each user's hourly series over
    its own [min, max] span and forward-fill missing values (LOCF) — the
    time-series primitive behind `time_bucket_gapfill` / `locf`.

    Spark-first: the dense grid is `sequence(min, max, interval 1 hour)` +
    explode — generated distributed, per user, never on the driver; the fill
    is one `last(v, ignorenulls=True)` window per user. Two shuffles total
    (hourly agg, user window; the span agg reuses the hourly partitioning).
    Grid size is bounded per user by its own span, so a 100 TB corpus fans
    out rows proportionally to (users × span), each partition independent."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("user_id", "hour")
    )


@register(
    "b5_named_window_clause",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                     AS DOUBLE), 6) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def b5_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: the SQL ``WINDOW w AS (...)`` named-window clause — one window
    definition shared by several functions (the parser surface; Catalyst
    collapses same-window functions into one Window operator either way,
    so this registers the front door, not a new plan). Running money sum
    accumulates in DECIMAL per the float discipline."""
    from apache_iceberg_demo_spark.io import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                     AS DOUBLE), 6) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )
