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

# result caches from the most recent invocation needing a reused subplan
# (PageRank's per-iteration edge frame); released on the next invocation —
# same pattern as operators/text.py / operators/corpus.py.
_live_caches: list[DataFrame] = []

#: per-operator RESULT caches (r15): keyed so each operator releases ONLY its
#: own previous result at re-invocation — a fresh invocation must recompute
#: from parquet (no result caching across runs), but within one invocation
#: the driver's count-then-collect reads the materialized frame once.
_op_caches: dict[str, DataFrame] = {}


def _keep_result(owner: str, df: DataFrame) -> DataFrame:
    from apache_iceberg_demo_spark.caching import keep_result

    return keep_result(_op_caches, owner, df)


def _release_caches() -> None:
    while _live_caches:
        df = _live_caches.pop()
        try:
            df.unpersist()
        except Exception:
            # the frame's SparkSession was stopped (session-restart
            # consumers, e.g. tools/determinism_probe.py): its cached
            # blocks died with the session — nothing to release
            pass


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
    result = tri_n.crossJoin(F.broadcast(wedge_n)).crossJoin(F.broadcast(edge_n))
    # one execution total: e0 feeds deg/oriented/tri_n/edge_n (4 traversals
    # uncached — Catalyst shares no subplans) and the driver's
    # count-then-collect would re-run the wedge pipeline per action
    # (audited: 3.3 s + 2.9 s at sf0.01). Materialize under an input-sized
    # scope; e0's cache builds inside it.
    from apache_iceberg_demo_spark.tuning import input_sized_shuffle, scoped_conf

    with scoped_conf(
        spark, {"spark.sql.shuffle.partitions": input_sized_shuffle(li)}
    ):
        result = result.persist()
        result.count()
    _live_caches.append(result)
    return result


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
    merged = (
        historical.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.round(F.sum("spend").cast("double"), 6).alias("total_spend"),
        )
    )
    # r15: persist+materialize the 5-row result — the driver's
    # count-then-collect otherwise executes the two-scan DECIMAL
    # aggregate twice (reexec audit: 1.5 s + 1.7 s at sf0.01)
    return _keep_result("b4_incremental_agg_maintenance", merged)


#: embedding dimensionality of the synthetic corpus (TESTDATA.md)
_DIM = 64


#: fixed-point scale for the covariance quantization (6 decimal places).
#: Headroom: |x| < 1 → |q| < 1e6 → |q·q| < 1e12 → an int64 partial sum is
#: exact past 9e6 rows PER PARTITION and the cross-partition merge is
#: DECIMAL, so no row count overflows it.
_COV_SCALE = 1_000_000


@register(
    "c3_covariance_matrix",
    oracle=f"""
        WITH x AS (
            SELECT vec_id,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                              * {_COV_SCALE}.0 + 0.5) AS BIGINT) AS q,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS i
            FROM embeddings
        ),
        g AS (
            SELECT a.i AS i, b.i AS j,
                   CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS c,
                   CAST(sum(a.q) AS HUGEINT) AS s_i,
                   CAST(sum(b.q) AS HUGEINT) AS s_j,
                   CAST(count(*) AS HUGEINT) AS n
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        ),
        r AS (
            SELECT i, j,
                   n * c - s_i * s_j AS num,
                   n * (n - 1) * CAST({_COV_SCALE * _COV_SCALE} AS HUGEINT)
                       AS den,
                   n * (n - 1)
                       * CAST({_COV_SCALE * _COV_SCALE // 2} AS HUGEINT)
                       AS half
            FROM g
        )
        SELECT i, j,
               CAST(CASE WHEN num >= 0 THEN (num * 1000000 + half) // den
                         ELSE -(((-num) * 1000000 + half) // den)
                    END AS DOUBLE) / 1000000.0 AS cov
        FROM r
    """,
)
def c3_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: the data-parallel half of PCA — the d×d covariance matrix of the
    embedding corpus (upper triangle, 0-based indices), computed as
    per-partition Gram partials (numpy ``XᵀX`` per Arrow batch via
    ``mapInPandas``) that reduce with a plain groupBy-sum. The driver-side
    eigendecomposition of a 64×64 matrix is O(d³) trivial — tested against
    ``numpy.cov`` in tests/test_mlprep.py.

    This is the canonical "matrix statistic at 100 TB" pattern: each
    executor folds its rows into an O(d²) partial (one 4096-entry row per
    partition — NOT per input row), so the shuffle moves partitions×d²
    values regardless of corpus size; the oracle's unnest-self-join
    formulation would shuffle rows×d² and is exactly what NOT to run at
    scale (it's here as the independent correctness check).

    Numeric determinism — the engine-proof formulation (3rd iteration; the
    r07 red row was float64 merge-order, the r08 red row was rounding-TIE
    semantics): no step anywhere in the pipeline invokes either engine's
    rounding mode.

    1. Quantize with ``floor(x·1e6 + 0.5)`` on BOTH engines. The float64
       multiply, add and floor are each correctly-rounded IEEE ops, so the
       int64 result is bitwise identical cross-engine — even on exact
       .5 ties, which DO exist (any odd multiple of 1/128: x·1e6 =
       (2k+1)·5⁶/2⁷ is an exact float64 ending in .5; sf0.001 data
       contains two). ``round()`` was the r08 bug: numpy rounds half-even,
       DuckDB half-away, so each tie was a coin flip between engines.
       (The old docstring's "ties are impossible" proof wrongly assumed
       (2k+1)/(2⁷·5⁶) is never a binary float — it is whenever 5⁶ divides
       2k+1.)
    2. Every sum is exact integer math (int64 per partition, DECIMAL(38,0)
       / HUGEINT across partitions) — order-insensitive, overflow-proof to
       ~1e9 rows (|q|<1e6 ⇒ n·C·1e6 < 1e38 needs n ≲ 3e9; far past any
       driver SF, and the scale note below covers the 100 TB form).
    3. The final 6-decimal rounding runs in INTEGER space: with
       N = n·C − s_i·s_j and D = n·(n−1)·scale² (both exact),
       cov = sign(N)·⌊(|N|·10⁶ + D/2) / D⌋ / 10⁶ — integer half-away
       division, bit-identical on any engine; the only float64 ops left
       are one exact int→double cast (quotient ≲ 2e6) and one
       correctly-rounded division by 1e6, identical both sides.
       (Spark's ``div`` and DuckDB's ``//`` truncate toward zero, so both
       are applied to non-negative numerators only, where truncate=floor.)

    Verified bit-exact Spark vs DuckDB vs a Python-bigint reference on a
    fixture of 50 exact-tie values (odd multiples of 1/128) in
    tests/test_mlprep.py, where half-even vs half-away quantization
    disagrees on all 50.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        n = 0
        s = np.zeros(_DIM, dtype=np.int64)
        c = np.zeros((_DIM, _DIM), dtype=np.int64)
        for pdf in batches:
            if len(pdf):
                x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                # floor(v+0.5), NOT np.round: half-even vs DuckDB's
                # half-away diverges on exact .5 ties (odd multiples of
                # 1/128) — floor(+0.5) is bitwise identical cross-engine
                q = np.floor(x * _COV_SCALE + 0.5).astype(np.int64)
                n += q.shape[0]
                s += q.sum(axis=0)
                c += q.T @ q
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "c": [c.reshape(-1).tolist()]}
            )

    parts = emb.mapInPandas(
        gram_partials, "n bigint, s array<bigint>, c array<bigint>"
    )
    # one narrow reuse point: the partial frame feeds three reductions
    parts = parts.persist()
    total = parts.agg(F.sum("n").alias("n"))
    svec = (
        parts.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("s"))
    )
    cmat = (
        parts.select(F.posexplode("c").alias("p", "v"))
        .groupBy("p")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("c"))
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    nn1 = n_dec * (F.col("n") - F.lit(1)).cast("decimal(38,0)")
    out = (
        cmat.select(
            (F.col("p") / _DIM).cast("int").alias("i"),
            (F.col("p") % _DIM).cast("int").alias("j"),
            "c",
        )
        .where(F.col("i") <= F.col("j"))
        .join(F.broadcast(svec.selectExpr("i AS i2", "s AS s_i")), F.col("i") == F.col("i2"))
        .join(F.broadcast(svec.selectExpr("i AS j2", "s AS s_j")), F.col("j") == F.col("j2"))
        .crossJoin(F.broadcast(total))
        .select(
            "i",
            "j",
            (n_dec * F.col("c") - F.col("s_i") * F.col("s_j")).alias("num"),
            (nn1 * F.lit(_COV_SCALE * _COV_SCALE).cast("decimal(38,0)")).alias("den"),
            (nn1 * F.lit(_COV_SCALE * _COV_SCALE // 2).cast("decimal(38,0)")).alias("half"),
        )
        # integer half-away rounding to 6 decimals (docstring step 3);
        # `div` truncates, so the CASE keeps its numerator non-negative
        .selectExpr(
            "i",
            "j",
            "CAST(CASE WHEN num >= 0 THEN (num * 1000000 + half) div den "
            "ELSE -((-num * 1000000 + half) div den) END AS DOUBLE) "
            "/ 1000000.0 AS cov",
        )
    )
    # r15: persist+materialize the k x k result — count-then-collect
    # otherwise runs the Gram-partial pipeline twice (reexec audit:
    # 1.9 s + 1.5 s at sf0.01). Values untouched (cache of the final
    # frame; the engine-proof integer-space math above is unchanged).
    return _keep_result("c3_covariance_matrix", out)


#: BM25 free parameters (the universal defaults from Robertson et al.)
_BM25_K1, _BM25_B = 1.2, 0.75
#: the keyword query this entry scores — common corpus terms so every SF
#: produces a populated ranking
_BM25_TERMS = ("join", "filter", "vector")


@register(
    "c5_bm25_search",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
            FROM toks WHERE tok IN ('join', 'filter', 'vector')
            GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY tok
        ),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   avg(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) AS avgdl
            FROM documents
        )
        SELECT doc_id, round(score, 6) AS bm25
        FROM (
            SELECT tf.doc_id,
                   sum(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * tf.tf * ({_BM25_K1} + 1)
                       / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                                                + {_BM25_B} * tf.dl / stats.avgdl))
                   ) AS score
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
            GROUP BY tf.doc_id
        )
        ORDER BY round(score, 6) DESC, doc_id
        LIMIT 20
    """,
)
def c5_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: BM25 keyword retrieval over the document corpus (Robertson &
    Zaragoza's probabilistic ranking function — the lexical baseline every
    embedding retriever is benchmarked against; pairs with c3's ANN surface
    to make this a hybrid-search engine).

    Spark-first: one explode pass builds (doc, term) frequencies for the
    query terms only (the IN filter lands before the groupBy, so non-query
    tokens never shuffle); document frequency and corpus stats are
    broadcast 3-row/1-row frames; the score is a closed-form JVM expression
    and the ranking is TakeOrderedAndProject. Top-k ties break on the
    ROUNDED score then doc_id — bit-identical selection on both engines.

    At 100 TB: the per-(doc,term) shuffle carries only hits of the 3 query
    terms; for a full search index you'd invert once (term → postings,
    the same explode groupBy keyed by term) and serve many queries from it.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    with_dl = docs.select(
        "doc_id", F.size("toks").cast("bigint").alias("dl"), "toks"
    )
    tf = (
        with_dl.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .where(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"), F.first("dl").alias("dl"))
    )
    df = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    stats = with_dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1)
        / (
            F.col("tf")
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    # no hint on the df join: bounded here (≤3 query terms) so AQE
    # broadcasts it from observed size; a full inverted index generalizes
    # this frame to vocabulary scale where a forced hint would OOM. The
    # 1-row stats aggregate keeps its hint — size-bounded by construction.
    ranked = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
    # r15: persist+materialize the 20-row ranking — count-then-collect
    # otherwise executes the tokenize+tf+df pipeline twice (reexec
    # audit: 3.1 s + 2.1 s at sf0.01)
    return _keep_result("c5_bm25_search", ranked)


@register(
    "s1_stratified_exact_split",
    oracle="""
        SELECT doc_id, lang,
               CASE WHEN rn <= floor(0.8 * cnt) THEN 'train' ELSE 'val' END AS split
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY lang) AS cnt
            FROM documents
        )
    """,
)
def s1_stratified_exact_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: stratified train/val split with EXACT per-stratum proportions —
    rank each document inside its language stratum by a deterministic
    pseudo-random key (md5 of the id — the repo's cross-engine RNG trick)
    and cut at floor(0.8·n). Unlike ``sampleBy`` (seeded Bernoulli,
    rows-only verifiable, ±binomial noise per stratum), this split is
    reproducible bit-for-bit across engines AND hits the 80/20 target
    exactly per stratum — what you want when strata are small and a
    binomial draw could starve validation.

    Scale: one hash-partition by stratum + in-partition sort on the md5
    key. For a jumbo stratum the same cut works from a two-pass
    percentile-of-md5-key threshold instead of a full sort — the key is
    uniform, so the rank cut IS a key-range cut.
    """
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("cnt"),
    ).select(
        "doc_id",
        "lang",
        F.when(F.col("rn") <= F.floor(0.8 * F.col("cnt")), "train")
        .otherwise("val")
        .alias("split"),
    )


@register(
    "b4_winsorized_robust_stats",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.01) AS p01,
                   quantile_cont(l_extendedprice, 0.50) AS med,
                   quantile_cont(l_extendedprice, 0.99) AS p99
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               round(q.p01, 6) AS p01,
               round(q.med, 6) AS median,
               round(q.p99, 6) AS p99,
               round(CAST(sum(CAST(round(greatest(q.p01, least(q.p99, l.l_extendedprice)), 6)
                                   AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 6) AS winsorized_mean,
               round(quantile_cont(abs(l.l_extendedprice - q.med), 0.5), 6) AS mad
        FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
        GROUP BY l.l_returnflag, q.p01, q.med, q.p99
    """,
)
def b4_winsorized_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: robust statistics per group — exact p01/median/p99, the
    winsorized mean (outliers clipped to the percentile fence before
    averaging), and the median absolute deviation. The outlier-resistant
    summary a data-quality gate prefers over mean/stddev, which one fat-
    finger row can drag arbitrarily.

    Two-pass plan: pass 1 reduces each group to a 3-number percentile
    state; pass 2 re-scans with the per-group fences joined back via
    BROADCAST (3 groups — at 100 TB still just one row per group) and
    aggregates clip/deviation expressions JVM-side. Spark's exact
    `percentile` builds a value→count map per group (memory ∝ distinct
    values); the bounded-memory 100 TB form swaps in `approx_percentile`
    with the same plan shape (that sketch's accuracy contract is
    b4_percentile_approx).

    Float discipline: clipped values round to 6 decimals and accumulate in
    DECIMAL(18,6) on both sides before the division — a winsorized sum is
    ~1e9 at sf0.1, above the 1e8 float-reassociation threshold.
    """
    from apache_iceberg_demo_spark.tuning import cpu_spread

    # spread the 1-2 scan splits before the exact-percentile partials: the
    # per-task value→count maps build on all cores instead of 1-2 (r15
    # measured 7.1 → 3.4 s at sf0.1; no-op on a cluster-wide scan). Unlike
    # b4_approx_count_distinct — where the same spread LOST (round-robin
    # scatters duplicate keys, gutting partial-distinct dedup before the
    # exchange) — percentile partials keep full effectiveness under any
    # row placement.
    li = cpu_spread(
        load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    )
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("p01"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("med"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )
    clipped = F.round(
        F.greatest(F.col("p01"), F.least(F.col("p99"), F.col("l_extendedprice"))), 6
    ).cast("decimal(18,6)")
    stats = (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.first("p01"), 6).alias("p01"),
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("p99"), 6).alias("p99"),
            F.round(
                F.sum(clipped).cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean"),
            F.round(
                F.expr("percentile(abs(l_extendedprice - med), 0.5)"), 6
            ).alias("mad"),
        )
    )
    # r15: persist+materialize the 3-row result — count-then-collect
    # otherwise runs the two-pass percentile pipeline twice (reexec
    # audit: 1.3 s + 1.8 s at sf0.01)
    return _keep_result("b4_winsorized_robust_stats", stats)


#: PageRank hyperparameters (the canonical Brin & Page values) and a fixed
#: iteration count so both engines compute the identical deterministic result
_PR_DAMP, _PR_ITERS = 0.85, 10


@register(
    "b3_pagerank_copurchase",
    oracle=f"""
        WITH RECURSIVE e0 AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        ),
        edges AS (SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT s, CAST(count(*) AS DOUBLE) AS outd FROM edges GROUP BY s),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
        pr(iter, node, rank) AS (
            SELECT 0, s, (SELECT 1.0 / n FROM nn) FROM deg
            UNION ALL
            SELECT iter + 1, e.d,
                   (SELECT {1 - _PR_DAMP} / n FROM nn)
                   + {_PR_DAMP} * sum(pr.rank / deg.outd)
            FROM pr
            JOIN edges e ON e.s = pr.node
            JOIN deg ON deg.s = pr.node
            WHERE iter < {_PR_ITERS}
            GROUP BY iter + 1, e.d
        )
        SELECT node, round(rank * (SELECT n FROM nn), 6) AS rank_x_n
        FROM pr WHERE iter = {_PR_ITERS}
    """,
)
def b3_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics: PageRank over the co-purchase part graph — {_PR_ITERS}
    power iterations at damping 0.85, reported as rank x N (so a uniformly
    unimportant node reads 1.0). The undirected graph is symmetrized, every
    node has degree >= 1, hence no dangling-mass term and total rank is
    conserved exactly.

    Spark-first iterative pattern: the edge+outdegree frame is built once,
    PERSISTED (Catalyst does not share common subplans — without the persist
    each of the {_PR_ITERS} iterations would rebuild the lineitem self-join),
    and each iteration is contributions = ranks ⋈ edges, groupBy(dst),
    sum(rank/outdeg) — one hash shuffle of (node, double) pairs per
    iteration, never payload data. The node count N is collected ONCE as a
    driver scalar (O(1) driver data — one aggregated row, the same thing
    GraphX does) and inlined as a literal: the earlier per-iteration
    ``crossJoin(broadcast(nn))`` added 12 BroadcastExchanges/jobs to the
    chain and cost ~30% of its materialization time at sf0.01. At 100 TB
    this is the exact Pregel-style plan GraphX runs, expressed in
    DataFrames so AQE handles skewed hubs.

    The oracle recomputes the identical iteration in DuckDB's recursive CTE
    (Spark 4 forbids aggregates over the recursive reference, so the Spark
    side HAS to be the loop — a genuine engine-capability divergence worth
    pinning in a test).
    """
    _release_caches()
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
    # EVERY materializing action — the nodes count, the cache builds it
    # triggers, and the final 10-iteration chain — runs inside ONE
    # shuffle scope: a plain 200-partition session otherwise schedules
    # ~200 tasks × 2 shuffles × 10 iterations (and the driver's
    # count-then-collect would re-execute the whole chain). r15: the scope
    # floors at the session's core count — 8 input-sized partitions left
    # 3/4 of a 32-core box idle during the iteration stages — and the edge
    # frame is persisted PRE-PARTITIONED on the join key at that same
    # count, so no iteration ever re-exchanges (or re-sorts) edge bytes:
    # only the small rank frame moves per round, the GraphX edge-partition
    # design. The rank side carries a SHUFFLE_HASH hint — sort-merge would
    # sort the (cached, already-partitioned) edge side every iteration;
    # hash-building the per-partition rank slice is the Pregel shape and
    # spills gracefully if a 100 TB vertex partition outgrows memory.
    # Measured (sf, current → this): sf0.01 16.8 → 7.9 s, sf0.1 22.3 →
    # 16.5 s for the full build+10-iteration chain.
    from apache_iceberg_demo_spark.tuning import input_sized_shuffle, scoped_conf

    nparts = max(
        int(input_sized_shuffle(li)), spark.sparkContext.defaultParallelism
    )
    with scoped_conf(
        spark, {"spark.sql.shuffle.partitions": str(nparts)}
    ):
        # r16: persist() compiles the cached PHYSICAL plan at registration
        # time, not at first materialization — registering these caches
        # before the scope opened baked 200-partition exchanges into the
        # cached plans, and (canChangeCachedPlanOutputPartitioning=false)
        # every iteration join then exchanged at 200 to co-partition with
        # them: ten 200-task stages per run at driver conditions. All
        # persists now register INSIDE the scope (r16 interleaved A/B,
        # plain local[8], sf0.1 spark-side min-of-3: 40.3 -> 25.6 s; the
        # one-iteration chain plan drops from 20 hashpartitioning(..,200)
        # references to zero — plans/r16/b3_pagerank_copurchase_*.txt).
        # e0 feeds TWO separate cache builds (ew, nodes-via-deg) that
        # cannot share exchanges across jobs — persisting it in-scope
        # saves one full pair-join build (r16 interleaved: 25.3/22.9/22.6
        # -> 22.8/21.1/21.3 s, consistent all three pairs; overturns the
        # r15 "e0 cache loses" datum, which registered the cache OUTSIDE
        # the scope and paid 200-wide cached-plan exchanges for it).
        e0 = e0.persist()
        _live_caches.append(e0)
        edges = e0.selectExpr("a AS s", "b AS d").unionAll(
            e0.selectExpr("b AS s", "a AS d")
        )
        deg = edges.groupBy("s").agg(
            F.count(F.lit(1)).cast("double").alias("outd")
        )
        ew = edges.join(deg, "s").repartition(nparts, "s").persist()
        _live_caches.append(ew)
        nodes = deg.select(F.col("s").alias("node")).persist()
        _live_caches.append(nodes)
        # N as a driver scalar: one aggregated row, O(1) driver data. The
        # division stays JVM-side (lit/lit) so the doubles are bit-identical
        # to the former broadcast-column form.
        n_lit = F.lit(float(nodes.count()))

        ranks = nodes.select("node", (F.lit(1.0) / n_lit).alias("rank"))
        for _ in range(_PR_ITERS):
            r = ranks.hint("shuffle_hash")
            contrib = (
                r.join(ew, r["node"] == ew["s"])
                .groupBy("d")
                .agg(F.sum(F.col("rank") / F.col("outd")).alias("c"))
            )
            ranks = nodes.join(contrib, nodes["node"] == contrib["d"], "left").select(
                "node",
                (
                    F.lit(1 - _PR_DAMP) / n_lit
                    + F.lit(_PR_DAMP) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        result = ranks.select(
            "node", F.round(F.col("rank") * n_lit, 6).alias("rank_x_n")
        ).persist()
        result.count()
    _live_caches.append(result)
    return result


@register(
    "b3_join_strategy_hints",
    oracle="""
        SELECT strategy, c_mktsegment, n_orders, revenue FROM (
            SELECT 'broadcast' AS strategy, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            UNION ALL
            SELECT 'merge', c_mktsegment, CAST(count(*) AS BIGINT),
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            UNION ALL
            SELECT 'shuffle_hash', c_mktsegment, CAST(count(*) AS BIGINT),
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        )
    """,
)
def b3_join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/optimizer surface: the SAME join computed under three physical
    join strategies forced by hints — BROADCAST (build side shipped to every
    task, zero shuffle of the fact side), MERGE (sort-merge: both sides
    shuffled+sorted on the key — the safe default for two big tables), and
    SHUFFLE_HASH (shuffle both, hash-build the smaller — cheaper than merge
    when the build side fits per-task memory but dims outgrow broadcast).

    All three must produce byte-identical aggregates — that physical
    strategy never changes results is the optimizer contract this entry
    turns into a hashed oracle row set. tests/test_mlprep.py additionally
    asserts each branch's physical plan actually contains its forced
    operator (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin), so a
    silently-ignored hint fails loudly.

    At 100 TB the choice is the single biggest join cost lever: broadcast
    for dims < ~1 GB, shuffle-hash for mid dims with AQE guarding the build
    size, sort-merge for fact-fact.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def agg(strategy: str) -> DataFrame:
        return (
            o.join(c.hint(strategy), o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    ),
                    6,
                ).alias("revenue"),
            )
            .select(
                F.lit(strategy).alias("strategy"),
                "c_mktsegment",
                "n_orders",
                "revenue",
            )
        )

    return (
        agg("broadcast").unionByName(agg("merge")).unionByName(agg("shuffle_hash"))
    )


@register(
    "b4_zscore_anomalies",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   avg(value) AS m,
                   stddev_samp(value) AS sd
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, round((e.value - s.m) / s.sd, 6) AS z
        FROM events e JOIN s ON e.event_type = s.event_type
        WHERE abs((e.value - s.m) / s.sd) > 3.0
    """,
)
def b4_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: z-score anomaly detection on the event stream — flag events whose
    value sits more than 3 sample standard deviations from its event-type
    mean (the first-line outlier screen of any metrics pipeline; the robust
    MAD-based variant for fat-tailed data is b4_winsorized_robust_stats).

    Two-pass: per-type (mean, stddev) reduces to one row per event type,
    BROADCASTS back, and the flag is a JVM-side predicate on the second
    scan — no window function, so no per-type sort and no skew exposure;
    at 100 TB both passes are full-scan + tiny-shuffle.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(F.broadcast(s), "event_type")
        .where(F.abs(z) > 3.0)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


@register(
    "b5_rolling_median",
    oracle="""
        SELECT event_id, user_id,
               round(quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ), 6) AS rolling_med
        FROM events
    """,
)
def b5_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: rolling MEDIAN over a 7-event frame per user — robust smoothing
    of the event-value series (a rolling mean chases every spike; the
    rolling median ignores isolated outliers, which is why monitoring
    pipelines prefer it — pairs with b4_zscore_anomalies as screen+smooth).

    Spark's exact `percentile` aggregate runs as a WINDOW function over the
    row frame (not just in groupBy) — same interpolation as DuckDB's
    `quantile_cont`, proven by the hash. Frame order ties break on
    event_id, deterministically on both engines.

    Scale: one hash-partition by user + in-partition sort; the frame holds
    ≤7 values so per-row cost is O(7 log 7) and state never exceeds the
    frame — no quadratic window blowup.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("rolling_med"),
    )


#: α^k decay weights for the 8-event EWMA frame, written as exact double
#: literals so both engines parse bit-identical constants
_EWMA_POWERS = [repr(0.7**k) for k in range(8)]


@register(
    "b5_ewma_smoothing",
    oracle=f"""
        WITH framed AS (
            SELECT event_id, user_id,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM events
        )
        SELECT event_id, user_id,
               round(list_dot_product(list_reverse(vals),
                                      ([{', '.join(_EWMA_POWERS)}])[1:len(vals)])
                     / list_sum(([{', '.join(_EWMA_POWERS)}])[1:len(vals)]),
                     6) AS ewma
        FROM framed
    """,
)
def b5_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: exponentially-weighted moving average (α = 0.7) over the last 8
    events per user — the decay-weighted smoother feature pipelines use for
    "recent behavior" signals (an 8-deep truncation of the classic
    recursive EWMA; weights are renormalized over however many events
    exist, so early rows aren't biased toward zero).

    The recursion s_t = αs_{t-1} + (1-α)x_t is inherently sequential — the
    WRONG shape for a distributed engine. The truncated form re-expresses
    it as a dot product of the window frame with a CONSTANT weight vector:
    collect_list over a 8-row frame, reverse (newest first), zip with the
    α^k literal array, fold. All JVM-side; HOF lambdas are interpreted
    (CLAUDE.md) but touch ≤8 elements per row — arithmetic, not
    string-building, per the measured guidance.

    The α^k constants are spelled as exact double literals (repr
    round-trip) so Spark and DuckDB parse bit-identical weights.
    """
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
    powers = ", ".join(f"{p}D" for p in _EWMA_POWERS)
    framed = ev.select(
        "event_id", "user_id", F.collect_list("value").over(w).alias("vals")
    )
    return framed.select(
        "event_id",
        "user_id",
        F.round(
            F.expr(
                f"aggregate(zip_with(reverse(vals), slice(array({powers}), 1, size(vals)),"
                f" (x, y) -> x * y), 0D, (a, x) -> a + x)"
                f" / aggregate(slice(array({powers}), 1, size(vals)), 0D, (a, x) -> a + x)"
            ),
            6,
        ).alias("ewma"),
    )


@register(
    "c2_fuzzy_join_blocked",
    oracle="""
        WITH probes AS (
            SELECT p_partkey AS probe_key,
                   concat(substr(p_name, 1, 2), substr(p_name, 4)) AS probe_name
            FROM part WHERE p_partkey % 97 = 3
        )
        SELECT probe_key, probe_name, p_partkey AS matched_key,
               CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
        FROM probes JOIN part
          ON substr(probe_name, 1, 2) = substr(p_name, 1, 2)
         AND abs(len(probe_name) - len(p_name)) <= 2
         AND levenshtein(probe_name, p_name) <= 2
    """,
)
def c2_fuzzy_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: fuzzy (approximate-string) JOIN with blocking — the entity-
    resolution primitive: match a probe set of corrupted part names (3rd
    character deleted — a deterministic typo model, so both engines build
    the identical probes) back to the catalog at edit distance ≤ 2.

    The all-pairs fuzzy join is O(N·M) edit-distance calls — never viable.
    Blocking makes it tractable: candidates must share the 2-char name
    prefix AND have length within ±2. Both keys are INVARIANT under the
    typo model (a deletion at position 3 never touches chars 1-2, and
    changes length by exactly 1), so blocking provably loses no true match
    — recall 1.0 by construction, the property a blocking scheme must
    argue, not assume. In production the typo model isn't known, so you
    union several redundant blocking keys (prefix, length band, shared
    q-grams) — same plan shape, more block joins.

    Scale: the equi-join on the prefix block key is an ordinary hash
    shuffle; Levenshtein runs JVM-side only within blocks. Probe side is
    tiny → broadcast.
    """
    p = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    probes = p.where(F.col("p_partkey") % 97 == 3).select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substr(p_name, 4)")
        ).alias("probe_name"),
    )
    dist = F.levenshtein("probe_name", "p_name")
    return (
        F.broadcast(probes)
        .join(
            p,
            (F.substring("probe_name", 1, 2) == F.substring("p_name", 1, 2))
            & (
                F.abs(F.length("probe_name") - F.length("p_name")) <= 2
            )
            & (dist <= 2),
        )
        .select(
            "probe_key",
            "probe_name",
            F.col("p_partkey").alias("matched_key"),
            dist.cast("bigint").alias("dist"),
        )
    )


@register(
    "b2_group_by_all",
    oracle="""
        SELECT o_orderpriority,
               year(o_orderdate) AS order_year,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS revenue
        FROM orders
        GROUP BY ALL
    """,
)
def b2_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 SQL-surface: ``GROUP BY ALL`` — the modern-SQL convenience (every
    non-aggregate select item becomes a grouping key) that Spark 4 and
    DuckDB both implement; the oracle runs the IDENTICAL dialect-free text,
    pinning that the two engines resolve the implicit grouping the same
    way. Executed through ``spark.sql`` on a registered view (the SQL entry
    point, not the DataFrame API), like b2_sql_pipe_syntax.
    """
    from apache_iceberg_demo_spark.io import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               year(o_orderdate) AS order_year,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS revenue
        FROM orders
        GROUP BY ALL
        """
    )


@register(
    "b5_interval_union_length",
    oracle="""
        WITH x AS (
            SELECT user_id, epoch_us(ts) AS t,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nt
            FROM events
        )
        SELECT user_id,
               CAST(sum(CASE WHEN nt IS NULL THEN 900000000
                             ELSE least(900000000, nt - t) END) AS BIGINT)
                   AS covered_us,
               CAST(1 + sum(CASE WHEN nt IS NOT NULL AND nt - t > 900000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_islands
        FROM x GROUP BY user_id
    """,
)
def b5_interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: interval-union coverage (gaps-and-islands, measure form) — each
    event opens a 15-minute activity interval; report per user the total
    UNION length of those overlapping intervals and the island count (the
    "minutes actually active" metric billing/engagement pipelines need,
    where naive n_events x 15min double-counts overlap).

    The union never materializes intervals: sorted by time, each event
    contributes min(gap_to_next, 15min) and the last a full 15min — a
    single lead() window plus a sum, O(n) with one user-partitioned
    shuffle. Duplicate timestamps contribute zero regardless of tie order,
    so the result is deterministic even under equal-ts events. All
    arithmetic in integer microseconds (events float discipline).
    """
    g_us = 900_000_000  # 15 minutes
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    x = ev.select(
        "user_id", t.alias("t"), F.lead(t).over(w).alias("nt")
    )
    return x.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("nt").isNull(), g_us).otherwise(
                F.least(F.lit(g_us), F.col("nt") - F.col("t"))
            )
        )
        .cast("bigint")
        .alias("covered_us"),
        (
            1
            + F.sum(
                F.when(
                    F.col("nt").isNotNull() & (F.col("nt") - F.col("t") > g_us), 1
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("n_islands"),
    )


@register(
    "c3_nearest_centroid_confusion",
    oracle="""
        WITH x AS (
            SELECT vec_id, label,
                   CAST(unnest(embedding) AS DOUBLE) AS v,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        cent AS (
            SELECT label AS clabel, i, avg(v) AS c FROM x GROUP BY label, i
        ),
        d AS (
            SELECT x.vec_id, x.label, cent.clabel,
                   sum((x.v - cent.c) * (x.v - cent.c)) AS d2
            FROM x JOIN cent ON x.i = cent.i
            GROUP BY x.vec_id, x.label, cent.clabel
        ),
        r AS (
            SELECT label, clabel,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rk
            FROM d
        )
        SELECT label AS true_label, clabel AS pred_label,
               CAST(count(*) AS BIGINT) AS n
        FROM r WHERE rk = 1
        GROUP BY label, clabel
    """,
)
def c3_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: nearest-centroid classification + confusion matrix over the
    labeled embedding corpus — the eval-side primitive of every clustering
    / labeling pipeline ("how separable are my classes in embedding
    space?"). Per-label centroids from one posexplode+groupBy pass; each
    vector is assigned to its squared-L2-nearest centroid (ties break on
    label — deterministic); the confusion matrix counts (true, predicted).

    Scale shape: centroids are k×d rows → reassembled into k arrays and
    BROADCAST; assignment is a map-side zip_with fold over each vector
    against k centroid arrays (never a shuffle of the corpus), and the
    confusion matrix is a k² aggregate. This is one Lloyd iteration's
    E-step with supervised centroids — the same plan our k-means/SemDeDup
    surface runs, here made oracle-checkable end to end.
    """
    emb = load(spark, sf_dir, "embeddings")
    pos = emb.select("label", F.posexplode("embedding").alias("i", "v"))
    centroids = (
        pos.groupBy("label", "i")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("sc"))
        .select(
            F.col("label").alias("clabel"),
            F.expr("transform(sc, s -> s.c)").alias("cvec"),
        )
    )
    d2 = F.expr(
        "aggregate(zip_with(embedding, cvec,"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " 0D, (a, x) -> a + x)"
    )
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "label", "clabel", d2.alias("d2"))
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "clabel")),
        )
        .where("rk = 1")
    )
    return assigned.groupBy(
        F.col("label").alias("true_label"), F.col("clabel").alias("pred_label")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


#: synthetic source size — fixed (not SF-scaled) so the oracle is closed-form
_PYDS_ROWS, _PYDS_PARTS = 10_000, 4


@register(
    "b1_python_datasource",
    oracle=f"""
        SELECT CAST(id % 7 AS INTEGER) AS category,
               CAST(count(*) AS BIGINT) AS n,
               round(sum((CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))
                               AS BIGINT) + 0.5) / 4294967296.0), 6) AS value_sum
        FROM generate_series(0, {_PYDS_ROWS - 1}) t(id)
        GROUP BY 1
    """,
)
def b1_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/Spark-4 front: a CUSTOM CONNECTOR via the Python Data Source API
    (pyspark.sql.datasource, new in Spark 4) — the extension point for
    reading systems Spark has no built-in source for. This source generates
    a deterministic synthetic user table: `partitions()` plans 4 input
    splits (real parallelism — each split generates its id range on its own
    task), `read(partition)` yields rows whose `value` is the repo's
    md5-uniform (sampling.py:25) of the id.

    Because the generator is a pure function of the row id, the connector
    is ORACLE-CHECKABLE: DuckDB rebuilds the identical table from
    generate_series + the same md5 arithmetic and must agree on the grouped
    aggregate — connector correctness proven without any golden file.

    Scale notes: splits are planned driver-side but generated
    executor-side (nothing materializes on the driver); a production
    connector adds `pushFilters` for scan-level predicate pushdown — the
    API hook is on DataSourceReader.
    """
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _Range(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", _PYDS_ROWS))
            self.nparts = int(options.get("partitions", _PYDS_PARTS))

        def partitions(self):
            step = self.rows // self.nparts
            return [
                _Range(p * step, self.rows if p == self.nparts - 1 else (p + 1) * step)
                for p in range(self.nparts)
            ]

        def read(self, part):
            import hashlib

            for i in range(part.start, part.end):
                h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                yield (i, i % 7, (h + 0.5) / 4294967296.0)

    class SyntheticUsers(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_users"

        def schema(self):
            return "id bigint, category int, value double"

        def reader(self, schema):
            return _Reader(self.options)

    spark.dataSource.register(SyntheticUsers)
    df = (
        spark.read.format("synthetic_users")
        .option("rows", str(_PYDS_ROWS))
        .option("partitions", str(_PYDS_PARTS))
        .load()
    )
    return df.groupBy("category").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )
