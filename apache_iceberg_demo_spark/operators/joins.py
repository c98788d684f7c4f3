"""Join operators (SURVEY.md §2 B3) — absent from the reference, required surface.

The reference is single-table (verified in SURVEY.md Part B), so every join
here is designed from Spark-first principles for the 100 TB case:

- **Dimension joins broadcast.** region/nation/supplier/part stay small at any
  scale factor (TPC-H dims grow sublinearly or are fixed); `F.broadcast` pins
  the hash-join build side so the fact table never shuffles for them.
- **Fact-fact joins shuffle on the join key** (sort-merge); AQE converts to
  broadcast at runtime when a filtered side turns out small, and splits skewed
  partitions (`spark.sql.adaptive.skewJoin`).
- **Semi/anti instead of IN/EXISTS subqueries** — no duplicate blowup, and the
  probe side streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b3_join_inner_broadcast",
    oracle="""
        SELECT n.n_name AS nation, count(*) AS n_customers,
               round(avg(c.c_acctbal), 6) AS avg_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def b3_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: inner equi-join, broadcast build side (25-row dim never shuffles)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_balance"),
        )
    )


@register(
    "b3_join_star_revenue",
    oracle="""
        SELECT r.r_name AS region,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY r.r_name
    """,
)
def b3_join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: 5-table star join (TPC-H Q5 shape) — revenue per region.

    Plan shape for 100 TB: lineitem⋈orders is the only shuffle (both fact
    tables, sort-merge on orderkey); customer⋈nation⋈region collapse into
    broadcast hash joins layered on the probe stream. Filter on orders is
    pushed below the join.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    # Exact revenue accumulation — join-shuffle arrival order must not perturb
    # a ~1e9-magnitude float sum, so the sum runs in DECIMAL(18,6).
    # r16 REVERT of the r15 two-level integer-sum rewrite: the extra merge
    # Exchange costs one AQE stage round on a broadcast-build-bound query,
    # and at driver conditions that wall cost exceeds the per-row decimal
    # save (driver r15: wall 0.575->0.863 s, cpu flat; r16 quiet-host
    # bench-level interleaved A/B: old wall 0.631/0.560 vs new 0.663/0.660
    # at 32/8 cores — the ~90 ms cpu win never recovers the stage round).
    # A single-agg sum over round(x*1e6)::long::decimal(38,0) was also
    # measured and is NOT cheaper (cpu 340-406 ms ~= this form's 356-392:
    # Spark's decimal sum buffer churns either way). Flagship keeps the
    # two-level form — there it wins on BOTH wall and cpu (3 money sums,
    # no join ahead of the agg; driver-corroborated). At true 100 TB the
    # two-level form would win here too (per-row cpu scales with rows, the
    # stage round is fixed) — that trade-off is recorded, but PERF is
    # measured at bench scale and the regression was real.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                6,
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "b3_join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 6) AS spend
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
)
def b3_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: left outer join — customers kept even with zero orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 6).alias("spend"),
        )
    )


@register(
    "b3_join_full_outer",
    oracle="""
        WITH big_spenders AS (
            SELECT o_custkey, round(sum(o_totalprice), 6) AS spend
            FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > 300000
        ),
        rich AS (
            SELECT c_custkey, round(c_acctbal, 6) AS balance
            FROM customer WHERE c_acctbal > 7000
        )
        SELECT coalesce(b.o_custkey, r.c_custkey) AS custkey, b.spend, r.balance
        FROM big_spenders b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
    """,
)
def b3_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: full outer join between two partially-overlapping derived sets."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("raw_spend"))
        .filter(F.col("raw_spend") > 300000)
        .select("o_custkey", F.round("raw_spend", 6).alias("spend"))
    )
    rich = c.filter(F.col("c_acctbal") > 7000).select(
        "c_custkey", F.round("c_acctbal", 6).alias("balance")
    )
    return big.join(rich, big.o_custkey == rich.c_custkey, "full").select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"), "spend", "balance"
    )


@register(
    "b3_join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def b3_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: left semi join (EXISTS) — probe side streams, no duplicate blowup."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "b3_join_anti",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def b3_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: left anti join (NOT EXISTS) — customers who never ordered."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "b3_join_cross",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation
        FROM region r CROSS JOIN nation n
    """,
)
def b3_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: cross join (tiny×tiny only — broadcast nested loop)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    )


@register(
    "b3_join_multikey",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, s.l_extendedprice
        FROM lineitem l
        JOIN lineitem s ON l.l_orderkey = s.l_orderkey
                       AND l.l_linenumber = s.l_linenumber
        WHERE l.l_returnflag = 'R' AND l.l_linenumber <= 2
    """,
)
def b3_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: multi-key equi self-join on the composite (orderkey, linenumber) PK."""
    li = load(spark, sf_dir, "lineitem")
    left = li.filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") <= 2)).alias("l")
    right = li.alias("s")
    return left.join(
        right,
        (F.col("l.l_orderkey") == F.col("s.l_orderkey"))
        & (F.col("l.l_linenumber") == F.col("s.l_linenumber")),
    ).select(
        F.col("l.l_orderkey").alias("l_orderkey"),
        F.col("l.l_linenumber").alias("l_linenumber"),
        F.col("l.l_quantity").alias("l_quantity"),
        F.col("s.l_extendedprice").alias("l_extendedprice"),
    )


@register(
    "b3_join_nonequi_range",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
                     AND l.l_shipdate >= o.o_orderdate
                     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
        WHERE l.l_returnflag = 'A'
    """,
)
def b3_join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: equi key + range residual (theta) join — ship within 30 days of order.

    The equi component keeps it a hash/sort-merge join (the range is a cheap
    residual filter), so this stays shuffle-bounded at 100 TB — never a
    nested-loop.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return li.join(o, cond).select(
        "l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"
    )


@register(
    "b3_join_bucketed_colocated",
    oracle="""
        SELECT l.l_orderkey, count(*) AS n_lines,
               round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS order_value,
               max(o.o_orderstatus) AS status
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linenumber <= 4
        GROUP BY l.l_orderkey
    """,
)
def b3_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: bucketed co-located fact-fact join — both tables bucketed on the
    join key at write time, so the join (and the follow-on groupBy on the
    same key) runs with ZERO shuffle exchanges on the fact data.

    This is THE technique for repeated 100 TB fact-fact joins: pay the
    bucketing shuffle once at ingest, never again per query. The oracle is
    the plain join (bucketing must not change results). Bucket tables are
    (re)materialized in a session-scoped warehouse dir.
    """
    from apache_iceberg_demo_spark.io import scratch_dir

    db_tag = "bucketed_demo"
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
    o = load(spark, sf_dir, "orders")
    li_t, o_t = f"{db_tag}_lineitem", f"{db_tag}_orders"
    wh_dir = scratch_dir("bucketed_wh_")
    for name, df, key in ((li_t, li, "l_orderkey"), (o_t, o, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", f"{wh_dir}/{name}")
            .bucketBy(16, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    lb = spark.table(li_t)
    ob = spark.table(o_t)
    # pin sort-merge: at toy scale Catalyst would pick broadcast and hide the
    # point — with matching bucket specs, SMJ needs NO exchange on either side
    return (
        lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 6
            ).alias("order_value"),
            F.max("o_orderstatus").alias("status"),
        )
    )


@register(
    "b3_join_salted_skew",
    oracle="""
        SELECT o.o_orderstatus,
               count(*) AS n,
               round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS total
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
)
def b3_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: manually salted skew join — identical result to the plain join
    (the oracle), different shuffle shape.

    Technique: the probe side gets a deterministic salt in [0,8); the build
    side is replicated 8x (one copy per salt) via an explode; the join key
    becomes (key, salt), so one hot orderkey spreads over 8 reducers instead
    of melting one. This is the pre-AQE-era defense, still needed when skew
    survives AQE (e.g. a single key larger than a partition split). Salt is
    hash-derived — no RNG, reproducible. Cost: build side ×8 (broadcast-
    sized sides only) — at 100 TB you salt the few detected hot keys, not
    the whole table.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    n_salt = 8
    salted_probe = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    replicated_build = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        salted_probe.join(
            replicated_build,
            (salted_probe.l_orderkey == replicated_build.o_orderkey)
            & (salted_probe.salt == replicated_build.salt),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 6
            ).alias("total"),
        )
    )


@register(
    "b3_join_null_safe",
    oracle="""
        WITH a AS (
            SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders
            WHERE o_orderkey % 70 = 0
        ),
        b AS (
            SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders
            WHERE o_orderkey % 50 = 0
        )
        SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b, a.k AS status_key
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
                     AND a.o_orderkey < b.o_orderkey
    """,
)
def b3_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — NULL keys
    match each other instead of silently dropping (a plain equi-join loses
    every NULL-keyed row; the null-safe form still plans as a hash join).

    The key has only 3 distinct values (F/O/NULL), so the pair count is
    near-quadratic in the input — the %70/%50 samples keep the semantics
    (both NULL-match and residual) while bounding the demo's cost."""
    o = load(spark, sf_dir, "orders")
    mk = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k")
    a = o.filter(F.col("o_orderkey") % 70 == 0).select(F.col("o_orderkey").alias("key_a"), mk)
    b = o.filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("key_b"), mk.alias("kb")
    )
    return (
        a.join(b, a.k.eqNullSafe(b.kb) & (a.key_a < b.key_b))
        .select("key_a", "key_b", F.col("k").alias("status_key"))
    )


@register(
    "b3_join_dpp_partitioned",
    oracle="""
        SELECT f.o_orderpriority,
               count(*) AS n,
               round(CAST(sum(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                                AS spend
        FROM orders f
        JOIN (SELECT DISTINCT o_orderpriority FROM orders
              WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%') d
          ON f.o_orderpriority = d.o_orderpriority
        GROUP BY f.o_orderpriority
    """,
)
def b3_join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: dynamic partition pruning — the fact side is a hive-partitioned
    table and the partition filter only exists at RUNTIME (it comes from the
    broadcast dimension's rows, not a literal), so Catalyst injects a
    ``dynamicpruningexpression`` into the fact scan's PartitionFilters and
    whole partition directories are skipped before any footer is read.

    This is the scan-side pattern that makes star joins viable at 100 TB:
    a date-dim filter prunes a ship-date-partitioned fact to days of data,
    with zero literal date in the query.
    """
    from apache_iceberg_demo_spark.io import scratch_dir

    tmp = scratch_dir("dpp_fact_")
    o = load(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
    fact = spark.read.parquet(tmp)
    dim = (
        o.filter(
            F.col("o_orderpriority").startswith("1")
            | F.col("o_orderpriority").startswith("2")
        )
        .select("o_orderpriority")
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 6
            ).alias("spend"),
        )
    )


@register(
    "b3_join_range_binned",
    oracle="""
        SELECT c.user_id,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(sum(p.value), 6) AS paired_value
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        GROUP BY c.user_id
    """,
)
def b3_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: range join via TIME BINNING — the scale rewrite of a ±30-minute
    interval join. A naive `|t1-t2| <= w` condition on a shuffle join makes
    every same-key pair a candidate (O(n·m) residual evaluation per user);
    binning floors both sides to w-sized buckets, EXPLODES one side to its
    bucket ±1, and equi-joins on (user_id, bin) — every true pair shares an
    expanded bin, candidates shrink to temporal neighbors, and the join key
    becomes hashable. Same trick Spark's streaming interval join plays with
    watermark-bounded state, applied to batch.

    The oracle is the naive inequality join — results must match exactly,
    proving the bin expansion loses no pairs and the residual drops no
    legitimate ones."""
    from apache_iceberg_demo_spark.io import load as _load

    W_US = 30 * 60 * 1_000_000
    ev = _load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withColumn("c_us", F.unix_micros("c_ts"))
        .withColumn(
            "bin",
            F.explode(
                F.array(
                    (F.col("c_us") / W_US).cast("bigint") - 1,
                    (F.col("c_us") / W_US).cast("bigint"),
                    (F.col("c_us") / W_US).cast("bigint") + 1,
                )
            ),
        )
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), "value")
        .withColumn("p_us", F.unix_micros("p_ts"))
        .withColumn("bin", (F.col("p_us") / W_US).cast("bigint"))
    )
    pairs = clicks.join(purchases, ["user_id", "bin"]).filter(
        (F.col("p_us") >= F.col("c_us") - W_US) & (F.col("p_us") <= F.col("c_us") + W_US)
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.sum("value"), 6).alias("paired_value"),
    )
