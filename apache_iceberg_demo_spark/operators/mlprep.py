"""ML-preparation statistics operators — feature encoding, distribution
summaries, sequence models, and native session windows over the batch
tables.

These extend SURVEY.md §2 part C's training-data-pipeline surface with the
feature-engineering passes that sit between "corpus is clean" and "model
sees tensors": categorical target encoding (leave-one-out, the standard
leakage-free form), per-column distribution summaries (entropy / Gini — the
class-balance diagnostics any labeled-data pipeline reports), first-order
Markov transition matrices over event streams (the classic clickstream
model), and Spark's native ``session_window`` in batch mode (the operator
the reference's engines lack entirely; our gap-based ``sessionize_gap30m``
implements the same semantics by hand — this entry exercises the built-in
and the oracle proves the two formulations agree).

Reference basis: the reference demonstrates cross-engine analytic SQL over
one Iceberg table (``/root/reference/README.md:85-211``); these operators
are the engine-side capabilities a user would reach for next when that
table feeds a training pipeline.

This module is imported LAST by ``registry.load_all`` (after corpus.py):
its entries rank behind every previously-registered driver-unverified
query, so adding surface here never displaces the ordering the round-5
driver budget was sequenced against (registry.py::_reorder).

Scale notes are per-operator; none of these collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b4_target_encoding_loo",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              OVER (PARTITION BY o_orderpriority)
                          - CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                     / (count(*) OVER (PARTITION BY o_orderpriority) - 1),
                     6) AS te_loo
        FROM orders
    """,
)
def b4_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-surface feature engineering: leave-one-out target encoding of a
    categorical column (the leakage-free mean-target encoder: each row's
    encoding is the category mean of the target computed WITHOUT that row,
    ``(sum_cat - y) / (n_cat - 1)``).

    Spark-first: one window partitioned by the category computes the
    category sum and count in a single shuffle; the per-row exclusion is
    arithmetic on top — no self-join, no second pass. At 100 TB this is one
    hash-partition by category (low cardinality → Spark's window exec runs
    partial aggregation map-side; skewed categories could be two-leveled
    with a salted pre-agg + broadcast of the per-category totals, which is
    the same algebra since sum/count are algebraic).

    Float discipline: the per-category sum is ~1e9 at sf0.1 (>1e8), so it
    accumulates in DECIMAL(18,2) on both sides; the exclusion difference is
    exact in DECIMAL and only the final division happens in double.
    """
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority")
    y = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.sum(y).over(w).alias("cat_sum"),
            F.count(F.lit(1)).over(w).alias("cat_n"),
            y.alias("y"),
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("cat_sum") - F.col("y")).cast("double")
                / (F.col("cat_n") - F.lit(1)),
                6,
            ).alias("te_loo"),
        )
    )


def _entropy_oracle(table: str, col: str) -> str:
    """Shared per-column entropy/Gini SQL (identical algebra to the Spark
    side): H = ln(N) - (Σ c·ln c)/N and Gini = 1 - (Σ c²)/N², both pure
    functions of the per-class counts."""
    return f"""
        SELECT '{table}.{col}' AS col,
               CAST(count(*) AS BIGINT) AS n_classes,
               round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
               round(1.0 - sum(c * c) / (sum(c) * sum(c)), 6) AS gini
        FROM (SELECT CAST(count(*) AS DOUBLE) AS c FROM {table} GROUP BY {col})
    """


@register(
    "b4_column_entropy",
    oracle=" UNION ALL ".join(
        _entropy_oracle(t, c)
        for t, c in [
            ("orders", "o_orderpriority"),
            ("orders", "o_orderstatus"),
            ("lineitem", "l_returnflag"),
            ("events", "event_type"),
            ("documents", "lang"),
        ]
    ),
)
def b4_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-surface class-balance diagnostics: Shannon entropy and Gini
    impurity of five categorical columns across four tables (the summary a
    labeled-data pipeline prints before stratified splitting — near-zero
    entropy flags a column that carries no signal or a broken upstream
    filter; compare s1 class-balancing which CONSUMES this diagnostic).

    Spark-first: per column, a two-level aggregate — groupBy(col).count()
    (partial map-side combine, tiny shuffle of one row per class) then a
    1-row fold using the identities H = ln N − (Σ c·ln c)/N and
    Gini = 1 − Σc²/N², so no per-row probability column ever materializes.
    The five 1-row frames union plan-side. At 100 TB each column is one
    shuffle of (n_classes) rows — bytes, not data.
    """

    def one(table: str, col: str) -> DataFrame:
        counts = (
            load(spark, sf_dir, table)
            .groupBy(col)
            .agg(F.count(F.lit(1)).cast("double").alias("c"))
        )
        return counts.agg(
            F.lit(f"{table}.{col}").alias("col"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
            ).alias("entropy"),
            F.round(
                F.lit(1.0)
                - F.sum(F.col("c") * F.col("c")) / (F.sum("c") * F.sum("c")),
                6,
            ).alias("gini"),
        )

    frames = [
        one("orders", "o_orderpriority"),
        one("orders", "o_orderstatus"),
        one("lineitem", "l_returnflag"),
        one("events", "event_type"),
        one("documents", "lang"),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@register(
    "b4_markov_event_transitions",
    oracle="""
        WITH tr AS (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_t,
                   event_type AS next_t
            FROM events
        ),
        c AS (
            SELECT prev_t, next_t, CAST(count(*) AS BIGINT) AS n
            FROM tr WHERE prev_t IS NOT NULL
            GROUP BY prev_t, next_t
        )
        SELECT prev_t, next_t, n,
               round(n / CAST(sum(n) OVER (PARTITION BY prev_t) AS DOUBLE),
                     6) AS p
        FROM c
    """,
)
def b4_markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence modeling over the event stream: the first-order Markov
    transition matrix of ``event_type`` per user (the classic clickstream
    model — P(next event | current event), the baseline against which any
    learned sequence model is judged).

    Spark-first: one window (partition user_id, order ts with event_id
    tiebreak — deterministic under timestamp ties, a must for oracle
    parity) produces lagged pairs; a groupBy on (prev,next) collapses to
    the k×k matrix; the row-normalization is a second window over the tiny
    matrix. At 100 TB the only data-sized shuffle is the per-user
    partition, which sessionize/asof already require — a production
    pipeline computes all of them from one shared user-partitioned pass.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.lag("event_type").over(w).alias("prev_t"),
        F.col("event_type").alias("next_t"),
    ).where(F.col("prev_t").isNotNull())
    counts = tr.groupBy("prev_t", "next_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wp = W.partitionBy("prev_t")
    return counts.select(
        "prev_t",
        "next_t",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


@register(
    "b5_session_window_batch",
    oracle="""
        WITH x AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS pts
            FROM events
        ),
        m AS (
            SELECT user_id, ts,
                   CASE WHEN pts IS NULL
                             OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                        THEN 1 ELSE 0 END AS brk,
                   event_id
            FROM x
        ),
        s AS (
            SELECT user_id, ts,
                   sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM m
        )
        SELECT user_id,
               CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s
        GROUP BY user_id, sid
    """,
)
def b5_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: Spark's NATIVE ``session_window`` operator run in batch mode —
    30-minute-gap sessions per user, reported as (first event, last event,
    event count) so the result is convention-free (session_window's own
    end = last_ts + gap is an implementation detail we deliberately do not
    expose).

    The oracle re-derives the identical sessions with the portable
    lag + cumulative-break-sum formulation — so this entry doubles as a
    machine-checked proof that Spark's merging-interval semantics (a new
    session starts when the gap is ≥ the threshold, since windows
    [ts, ts+gap) merge only on strict overlap) agree with the hand-rolled
    ``sessionize_gap30m``.

    Scale: session_window is a single hash-partition by user_id followed
    by an in-partition sort-merge of intervals — exactly the one shuffle
    the problem requires; no window function, no self-join. Timestamps
    compare as integer microseconds end-to-end (events float discipline).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.unix_micros(F.min("ts")).alias("first_us"),
            F.unix_micros(F.max("ts")).alias("last_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select("user_id", "first_us", "last_us", "n_events")
    )


@register(
    "b3_triangle_count_copurchase",
    oracle="""
        WITH e0 AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        ),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
            GROUP BY node
        ),
        o AS (
            SELECT CASE WHEN da.d < db.d OR da.d = db.d THEN e0.a ELSE e0.b END AS u,
                   CASE WHEN da.d < db.d OR da.d = db.d THEN e0.b ELSE e0.a END AS v
            FROM e0
            JOIN deg da ON da.node = e0.a
            JOIN deg db ON db.node = e0.b
        ),
        wedge AS (
            SELECT e1.v AS v, e2.v AS w
            FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v
        )
        SELECT (SELECT CAST(count(*) AS BIGINT)
                FROM wedge JOIN e0 ON wedge.v = e0.a AND wedge.w = e0.b
               ) AS n_triangles,
               (SELECT CAST(count(*) AS BIGINT) FROM wedge) AS n_wedges,
               (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges
    """,
)
def b3_triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics on a relationally-derived graph: triangle counting
    over the co-purchase graph (parts appearing in the same order are
    linked), via the degree-oriented node-iterator algorithm — the standard
    distributed formulation (Suri & Vassilvitskii, "Counting Triangles and
    the Curse of the Last Reducer", WWW'11, public).

    Why orientation matters at scale: enumerating wedges from EVERY vertex
    is Σ deg² — quadratic in hub degree, and one celebrity node melts its
    reducer. Orienting each edge from the lower-(degree, id) endpoint to
    the higher caps every out-degree at O(√m), so the wedge join is
    Σ outdeg² ≤ m^1.5 regardless of skew — each triangle is counted exactly
    once, from its lowest-ranked vertex (ties break by the a<b edge
    construction, identically in the oracle).

    Spark-first plan: edge build = one self-join shuffled by l_orderkey;
    degree = one groupBy of endpoint ids; the two deg joins broadcast (deg
    has one row per part — at 100 TB, sort-merge instead); the wedge
    self-join shuffles oriented edges by source. Only vertex-id pairs ever
    shuffle — never payloads.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e0 = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionAll(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    keep_ab = (F.col("da.d") < F.col("db.d")) | (F.col("da.d") == F.col("db.d"))
    oriented = (
        e0.join(F.broadcast(deg.alias("da")), F.col("da.node") == F.col("a"))
        .join(F.broadcast(deg.alias("db")), F.col("db.node") == F.col("b"))
        .select(
            F.when(keep_ab, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(keep_ab, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    wedge = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"),
            (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
        )
        .select(F.col("e1.v").alias("v"), F.col("e2.v").alias("w"))
    )
    tri_n = (
        wedge.join(e0, (F.col("v") == F.col("a")) & (F.col("w") == F.col("b")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    wedge_n = wedge.agg(F.count(F.lit(1)).cast("bigint").alias("n_wedges"))
    edge_n = e0.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return tri_n.crossJoin(F.broadcast(wedge_n)).crossJoin(F.broadcast(edge_n))


@register(
    "s1_weighted_sample_topk",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 6) AS weight
        FROM (
            SELECT o_orderkey, o_totalprice,
                   -ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                             AS BIGINT) + 0.5) / 4294967296.0)
                   / o_totalprice AS es_key
            FROM orders
        )
        ORDER BY es_key
        LIMIT 100
    """,
)
def s1_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, public) — draw 100 orders with inclusion
    probability proportional to ``o_totalprice``, deterministically: the
    uniform draw is the first 8 md5 hex chars of the key (the repo's
    standard cross-engine deterministic-RNG trick, sampling.py:25), so both
    engines select the identical sample.

    Each row's key is ``-ln(u)/w`` (an Exponential(w) draw); the k smallest
    keys are exactly a weight-proportional sample without replacement. This
    is THE distributed one-pass weighted sampler: keys are computed
    embarrassingly parallel and the global top-k is Spark's
    TakeOrderedAndProject — per-partition heaps, then a k-row merge on one
    reducer. No shuffle of the table, no sequential draw dependency; at
    100 TB it reads once and moves 100 rows.

    The +0.5/2^32 midpoint keeps u strictly inside (0,1) — ln(0) can never
    occur, identically on both sides.
    """
    o = load(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = -F.log(u) / F.col("o_totalprice")
    return (
        o.select("o_orderkey", "o_totalprice", key.alias("es_key"))
        .orderBy("es_key")
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 6).alias("weight"))
    )


@register(
    "b4_incremental_agg_maintenance",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS total_spend
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def b4_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: incremental materialized-aggregate maintenance — the algebra
    behind every streaming/batch "update the rollup with today's delta"
    pipeline. The historical partition (orders before 2000-01-01) is
    aggregated into per-group STATE (count + DECIMAL sum); the delta
    partition (2000-01-01 onward) aggregates separately; the two states
    merge with a second-level combine. The oracle recomputes from scratch
    over the full table — green means state-merge ≡ recompute, the
    correctness property incremental view maintenance rests on.

    Works because count/sum are algebraic (commutative-monoid states);
    AVG-like results derive from merged (sum, count) afterward. The sums
    accumulate in DECIMAL(18,2) on both sides (money float discipline), so
    the merge is EXACT — no float re-association drift between the
    incremental and recomputed paths.

    Scale: at 100 TB the historical state is a few rows per group persisted
    in the warehouse; each refresh scans only the delta partition
    (partition pruning on the date predicate — visible as PushedFilters)
    and shuffles group-count rows, not data.
    """
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
        )

    historical = state(o.where(F.col("o_orderdate") < cutoff))
    delta = state(o.where(F.col("o_orderdate") >= cutoff))
    return (
        historical.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.round(F.sum("spend").cast("double"), 6).alias("total_spend"),
        )
    )
