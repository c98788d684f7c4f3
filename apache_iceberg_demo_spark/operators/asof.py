"""As-of join + gap sessionization (SURVEY.md §2 custom-operator surface).

Spark has no native AS-OF join; the scalable composition here is the
**union-and-carry** pattern: tag both sides, union, sort within the
partition key by (ts, side-priority), and carry the last quote value forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding window. One
shuffle on the partition key, no per-group Python, no nested-loop — this is
the 100 TB form (the `pd.merge_asof`-per-group alternative ships whole
groups through Arrow and dies on a hot key).

Sessionization is the lag-gap-cumsum composition: flag gaps > threshold,
running-sum the flags → session ids. Same single-shuffle shape.

Both are oracle-paired: DuckDB has a native ASOF JOIN, and the session SQL
is plain window functions — so these non-trivial compositions get full
value-hash verification, not just rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreaker: str | None = None,
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key. Union-and-carry
    implementation (one shuffle on ``on``).

    ``tiebreaker`` appends a final ordering column so right-side rows that
    share (key, ts) resolve deterministically: the carry takes the row with
    the GREATEST tiebreaker (``last`` over the ordered frame) — i.e.
    ``max_by(value, tiebreaker)`` semantics folded into the window instead
    of a separate pre-aggregation pass (r15: dropping the quotes groupBy
    removed its exchange+aggregate — asof_join_events wall 0.51→0.38 s,
    cpu 156→125 ms at sf0.1, results identical at all three SFs).

    The value columns travel as ONE struct gated on the right side (r16,
    ADVICE): per-column ``last(c, ignorenulls=True)`` would let columns of
    the carried match come from DIFFERENT right rows whenever a value column
    is NULL in the latest row — the struct is non-null for every right row,
    so the whole match is taken from the same row (exactly native ASOF/
    ``max_by`` semantics, which carry the latest row even if its value is
    NULL). It also halves the window expressions for multi-column carries."""
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rhs = right.withColumn("_side", F.lit(0)).withColumn("_ts", F.col(right_ts))
    for c in set(lhs.columns) - set(rhs.columns):
        if c not in ("_side", "_ts"):
            rhs = rhs.withColumn(c, F.lit(None))
    for c in set(rhs.columns) - set(lhs.columns):
        lhs = lhs.withColumn(c, F.lit(None))
    merged = lhs.unionByName(rhs.select(*lhs.columns))
    # quotes (side 0) sort before trades (side 1) at equal ts ⇒ `<=` semantics
    order = ["_ts", "_side"] + ([tiebreaker] if tiebreaker else [])
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # null for left rows (so ignorenulls skips them), non-null for EVERY
    # right row (so the carry is atomic per matched row)
    payload = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    carried = merged.select(
        "*", F.last(payload, ignorenulls=True).over(w).alias("_asof")
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            "*",
            *[F.col("_asof")[c].alias(f"asof_{c}") for c in value_cols],
        )
        .drop("_asof", "_side", "_ts", *value_cols)
    )


@register(
    "asof_join_events",
    oracle="""
        WITH quotes AS (
            SELECT user_id, ts, max_by(value, event_id) AS quote_value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ),
        trades AS (
            SELECT user_id, ts, event_id, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT t.event_id, t.user_id,
               round(t.value, 6) AS trade_value,
               round(q.quote_value, 6) AS last_view_value
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.user_id = q.user_id AND t.ts >= q.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF: each purchase joined to the user's most recent view at-or-before
    it (the trades/quotes shape). The oracle uniques views per (user, ts) with
    max_by(value, event_id); the Spark side folds that dedup into the carry
    window's ordering (event_id tiebreaker) instead of a separate
    groupBy — one less exchange+aggregate, same well-defined match."""
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("value").alias("quote_value")
    )
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        trades,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["quote_value"],
        tiebreaker="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("trade_value"),
        F.round("asof_quote_value", 6).alias("last_view_value"),
    )


@register(
    "sessionize_gap30m",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               round(sum(value), 6) AS session_value,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        FROM numbered
        GROUP BY user_id, session_id
    """,
)
def sessionize_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions per user via lag + running sum
    (one shuffle on user_id; both window passes share the partitioning)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer-microsecond gap math — events carry sub-second precision,
    # so second-truncating casts would mis-place session boundaries
    us = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) <= 1800 * 1_000_000, 0).otherwise(1),
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("duration_us"),
    )


@register(
    "funnel_signup_to_purchase",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   min(ts) FILTER (WHERE event_type = 'signup')   AS first_signup,
                   min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
            FROM events
            GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               count(first_signup) AS n_signed_up,
               count(CASE WHEN first_purchase >= first_signup
                          THEN 1 END) AS n_converted,
               CAST(sum(n_purchases) AS BIGINT) AS total_purchases
        FROM firsts
    """,
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup → purchase conversion in one conditional
    aggregation pass (no joins, no self-union — the FILTER-clause form keeps
    it a single hash aggregate, the cheapest possible funnel at 100 TB)."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count(
            F.when(F.col("first_purchase") >= F.col("first_signup"), 1)
        ).alias("n_converted"),
        F.sum("n_purchases").cast("bigint").alias("total_purchases"),
    )


@register(
    "asof_join_tolerance",
    oracle="""
        WITH quotes AS (
            SELECT user_id, ts, max_by(value, event_id) AS quote_value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ),
        trades AS (
            SELECT user_id, ts, event_id, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT t.event_id, t.user_id,
               round(t.value, 6) AS trade_value,
               CASE WHEN q.ts >= t.ts - INTERVAL 1 HOUR
                    THEN round(q.quote_value, 6) END AS last_view_value,
               (q.ts IS NOT NULL AND q.ts >= t.ts - INTERVAL 1 HOUR)
                   AS within_tolerance
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.user_id = q.user_id AND t.ts >= q.ts
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF with tolerance — `merge_asof(tolerance=1h)` semantics: each
    purchase takes the user's most recent view at-or-before it ONLY if that
    view is within the last hour; staler matches are nulled (a quote that
    old is not a quote).

    Same union-and-carry plan as `asof_join_events` — the carried columns
    just include the quote timestamp, and the tolerance is a post-window
    null-out predicate; no extra shuffle, no per-group Python. The oracle is
    DuckDB's native ASOF JOIN with the identical staleness CASE, so the
    composed form is value-hash-verified against a first-class
    implementation."""
    ev = load(spark, sf_dir, "events")
    # per-(user, ts) view dedup folded into the carry window via the
    # event_id tiebreaker — see asof_join_events (r15)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("quote_value"),
        F.col("ts").alias("quote_ts"),
    )
    trades = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        trades,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["quote_value", "quote_ts"],
        tiebreaker="event_id",
    )
    fresh = F.col("asof_quote_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("trade_value"),
        F.when(fresh, F.round("asof_quote_value", 6)).alias("last_view_value"),
        F.coalesce(fresh, F.lit(False)).alias("within_tolerance"),
    )
