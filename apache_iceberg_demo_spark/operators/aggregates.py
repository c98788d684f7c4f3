"""Aggregation operators (SURVEY.md §2 A9-A14, B4).

The reference's complete analytical suite — Q1/Q2/Q3 run identically on DuckDB
and Presto (``/root/reference/README.md:88-203``) — transposed from the taxi
table to the driver's ``lineitem`` fact table (mapping per SURVEY.md §7
phase 2: ``passenger_count``→``l_linenumber``, ``total_amount``→
``l_extendedprice``, ``trip_distance``→``l_quantity``), plus the full B4
aggregation surface (multi-agg stats, count-distinct, HLL approx, rollup,
cube, grouping sets, HAVING).

Scale notes: every GROUP BY here is a hash aggregate with map-side partial
aggregation (partial→final HashAggregate), which is exactly what Presto's
81-splits→10-groups execution demonstrates in the reference
(``README.md:186-201``). Group-by keys are low-cardinality (flags, line
numbers), so the shuffle moves only #groups × #partitions pre-aggregated rows
— this plan shape is 100 TB-safe as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


def round6(c, alias):  # shared float discipline (SURVEY.md §5.3)
    return F.round(c, 6).alias(alias)


# --- The reference's own 3-query suite + count sanity check (A9-A14) ------------


@register(
    "a09_count_all",
    oracle="SELECT count(*) AS all_records FROM lineitem",
)
def a09_count_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: global COUNT(*) — reference ``README.md:52-58`` (12,748,986 check)."""
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("all_records"))


@register(
    "a10_q1_filter_count",
    oracle="""
        SELECT count(*) AS trip_count
        FROM lineitem
        WHERE l_linenumber = 3
    """,
)
def a10_q1_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 / reference Q1: equality filter + count (``README.md:91-101``).

    The filter is pushed into the parquet scan (PushedFilters), mirroring
    Presto's 6.55 MB-of-2 GB read at ``README.md:162``.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 3)
        .agg(F.count("*").alias("trip_count"))
    )


@register(
    "a11_q2_filter_avg",
    oracle="""
        SELECT round(avg(l_extendedprice), 6) AS avg_fare_amount
        FROM lineitem
        WHERE l_linenumber = 1 AND l_quantity < 5
    """,
)
def a11_q2_filter_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 / reference Q2: conjunctive predicate + AVG (``README.md:107-115``)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_quantity") < 5)).agg(
        round6(F.avg("l_extendedprice"), "avg_fare_amount")
    )


@register(
    "a12_q3_group_agg_sort",
    oracle="""
        SELECT l_linenumber,
               count(*) AS trip_count,
               round(avg(l_extendedprice), 6) AS avg_fare_amount
        FROM lineitem
        GROUP BY l_linenumber
        ORDER BY l_linenumber ASC
    """,
)
def a12_q3_group_agg_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+A13 / reference Q3: hash aggregate + ORDER BY (``README.md:120-143``)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_linenumber")
        .agg(
            F.count("*").alias("trip_count"),
            round6(F.avg("l_extendedprice"), "avg_fare_amount"),
        )
        .orderBy(F.asc("l_linenumber"))
    )


# --- Flagship: TPC-H-Q1-shaped pricing summary (entry() target) -----------------


@register(
    "flagship_pricing_summary",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               round(sum(l_quantity), 6)                              AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                                                                      AS sum_base_price,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_disc_price,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                   AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_charge,
               round(avg(l_quantity), 6)                              AS avg_qty,
               round(avg(l_extendedprice), 6)                         AS avg_price,
               round(avg(l_discount), 6)                              AS avg_disc,
               count(*)                                               AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference Q3 shape widened to a TPC-H-Q1 pricing summary.

    A7+A10+A12+A13+A14 in one query (scan → pushed filter → partial+final hash
    aggregate over 2 low-cardinality keys → tiny sort). At 100 TB the shuffle
    carries only #groups(≈6) × #map-partitions pre-aggregated rows.
    """
    li = load(spark, sf_dir, "lineitem")
    # the long cents/micros partial sums below rely on ANSI mode to make a
    # (bound-impossible) overflow loud rather than silently wrapping (ADVICE
    # r15): fail fast if a consumer session runs with ANSI off
    if str(spark.conf.get("spark.sql.ansi.enabled", "true")).lower() != "true":
        raise AssertionError(
            "flagship_pricing_summary requires spark.sql.ansi.enabled=true: "
            "its exact long partial sums must overflow loudly, never wrap"
        )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Money sums must be EXACT: float64 addition is non-associative, and at
    # ~1e9 magnitudes partial-agg merge order would otherwise flap the 6th
    # decimal across engines/runs (SURVEY.md §5.3). Prices/discounts/taxes
    # are exact 2dp, so the products are exact 4/6dp. r01-r14 recovered them
    # with per-row double→DECIMAL casts (BigDecimal churn: 1.0 s cpu at
    # sf0.1, ~0.45 s of it the casts+decimal adds). r15 replaces that with
    # TWO-LEVEL integer aggregation — the per-row work is round()+long adds
    # in whole-stage codegen, and only the tiny merge level touches DECIMAL:
    #   level 1 (per scan task, keyed by spark_partition_id): exact long
    #     cents/micros sums. Overflow-safe by the split bound: a 1 GB scan
    #     task holds ~1e7 lineitem rows x <=1.13e11 micros ~= 1.1e18 << 2^63,
    #     and ANSI mode makes any pathological violation loud, never silent.
    #   level 2 (6 groups x #tasks rows): DECIMAL(38,0) sums of the partial
    #     longs -- unbounded-scale exact, same 100 TB soundness as before.
    # round(x*1e6) recovers the exact 6dp product for the same reason the
    # old decimal cast did: the double is within ~1e-5 of the true integer.
    # Measured (sf0.1, interleaved best-of-5): wall 1.09->0.86 s, cpu
    # 774->389 ms; results bit-identical at sf0.001/0.01/0.1. The composed
    # avgs (sum/count over the same partials) reassociate double addition,
    # but the error (~1e-11 after the divide) sits 5 orders below the
    # round-6 contract, same class as native avg's own partial merge.
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_mic = F.round(disc_price * 1_000_000, 0).cast("long")
    charge_mic = F.round(disc_price * (1 + F.col("l_tax")) * 1_000_000, 0).cast("long")
    inner = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum("l_quantity").alias("qty_s"),
            F.sum(cents).alias("base_s"),
            F.sum(disc_mic).alias("disc_s"),
            F.sum(charge_mic).alias("charge_s"),
            F.sum("l_extendedprice").alias("price_s"),
            F.sum("l_discount").alias("draw_s"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        inner.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round6(F.sum("qty_s"), "sum_qty"),
            round6((F.sum(F.col("base_s").cast("decimal(38,0)")) / 100).cast("double"), "sum_base_price"),
            round6((F.sum(F.col("disc_s").cast("decimal(38,0)")) / 1_000_000).cast("double"), "sum_disc_price"),
            round6((F.sum(F.col("charge_s").cast("decimal(38,0)")) / 1_000_000).cast("double"), "sum_charge"),
            round6(F.sum("qty_s") / F.sum("cnt"), "avg_qty"),
            round6(F.sum("price_s") / F.sum("cnt"), "avg_price"),
            round6(F.sum("draw_s") / F.sum("cnt"), "avg_disc"),
            F.sum("cnt").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- B4: wider aggregation surface ----------------------------------------------


@register(
    "b4_agg_stats",
    oracle="""
        SELECT l_returnflag,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                                                       AS sum_price,
               round(min(l_extendedprice), 6)          AS min_price,
               round(max(l_extendedprice), 6)          AS max_price,
               round(stddev_samp(l_extendedprice), 6)  AS sd_price,
               round(var_samp(l_extendedprice), 2)     AS var_price,
               CAST(sum(l_linenumber) AS BIGINT)       AS sum_line
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b4_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: count/sum/min/max/stddev/variance in one hash aggregate."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            round6(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), "sum_price"),
            round6(F.min("l_extendedprice"), "min_price"),
            round6(F.max("l_extendedprice"), "max_price"),
            round6(F.stddev("l_extendedprice"), "sd_price"),
            # variance magnitudes (~1e9) put engine-algorithm divergence
            # (~2e-7 measured) at the 6-decimal rounding boundary — round 2
            F.round(F.variance("l_extendedprice"), 2).alias("var_price"),
            F.sum("l_linenumber").cast("bigint").alias("sum_line"),
        )
    )


@register(
    "b4_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey)  AS n_customers,
               count(*)                   AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def b4_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: COUNT(DISTINCT) — expands to a two-phase distinct aggregate.

    Spark plans this as partial-distinct then final (no naive global
    de-duplication), so it scales with #distinct per group, not row count.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "b4_approx_count_distinct",
    oracle="""
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               CAST(count(DISTINCT l_partkey)  AS BIGINT) AS exact_parts,
               TRUE AS orders_within_5pct,
               TRUE AS parts_within_5pct
        FROM lineitem
    """,
)
def b4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: HyperLogLog++ approximate distinct — the 100 TB path for distincts.

    HLL estimates are engine-specific, so the ESTIMATE itself can't be
    oracle-compared; what CAN be is the accuracy contract: the query emits
    the exact counts plus in-query booleans asserting the HLL estimate lands
    within 5%% relative error (rsd=0.02 ⇒ ~2σ bound), and the oracle asserts
    the same counts with literal TRUE. A broken sketch flips the boolean and
    fails the value-hash."""
    err = lambda approx, exact: F.abs(approx - exact) / exact  # noqa: E731
    return (
        load(spark, sf_dir, "lineitem")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_o"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_p"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "exact_orders",
            "exact_parts",
            (err(F.col("a_o"), F.col("exact_orders")) <= 0.05).alias("orders_within_5pct"),
            (err(F.col("a_p"), F.col("exact_parts")) <= 0.05).alias("parts_within_5pct"),
        )
    )


@register(
    "b4_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 6) AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def b4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: ROLLUP — hierarchical subtotals in one pass (Expand + HashAggregate)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), round6(F.sum("l_quantity"), "qty"))
    )


@register(
    "b4_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(avg(l_extendedprice), 6) AS avg_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def b4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: CUBE — all grouping-set combinations in one shuffle."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), round6(F.avg("l_extendedprice"), "avg_price"))
    )


@register(
    "b4_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def b4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: explicit GROUPING SETS via the SQL entry point (same Catalyst plan)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "b4_having",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 6) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 3
    """,
)
def b4_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: HAVING — post-aggregate filter (stays in the aggregate stage)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            round6(F.sum("o_totalprice"), "spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "b4_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b4_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). The exact form needs the values per group; the 100 TB
    form is `b4_percentile_approx` (bounded-memory sketch)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            round6(F.percentile("l_extendedprice", 0.5), "p50"),
            round6(F.percentile("l_extendedprice", 0.9), "p90"),
            round6(F.percentile("l_extendedprice", 0.99), "p99"),
        )
    )


@register(
    "b4_percentile_approx",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
               TRUE AS p50_within_1pct,
               TRUE AS p90_within_1pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b4_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: approximate percentiles (Greenwald-Khanna sketch, constant
    memory) — the scale path for quantiles. The sketch output is
    engine-specific, so the oracle checks the accuracy CONTRACT instead:
    exact p50 value-compared, plus in-query booleans asserting the sketch
    lands within 1%% of the exact interpolated percentile."""
    li = load(spark, sf_dir, "lineitem")
    ok = lambda a, e: F.abs(a - e) / e <= 0.01  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
            F.percentile_approx("l_extendedprice", 0.9, 10000).alias("a90"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("e90"),
        )
        .select(
            "l_returnflag",
            F.round("e50", 6).alias("p50_exact"),
            ok(F.col("a50"), F.col("e50")).alias("p50_within_1pct"),
            ok(F.col("a90"), F.col("e90")).alias("p90_within_1pct"),
        )
    )


@register(
    "b4_salted_skew_agg",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b4_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: two-phase salted aggregation for skewed keys — identical result
    to the plain GROUP BY (the oracle), different shuffle shape.

    Phase 1 groups on (key, salt∈[0,16)) so a hot key spreads over 16
    reducers; phase 2 merges the 16 partials per key. At 100 TB this is the
    standard defense when one group holds half the table; on non-skewed data
    it costs one extra (tiny) shuffle. Salt is derived from the row's PK —
    deterministic, no RNG.

    Money sums run in DECIMAL(18,2): float64 addition is non-associative, so
    the salted re-grouping would otherwise drift from the plain GROUP BY in
    the last ulps; decimal is exact and order-independent (this is also the
    correct type for money at 100 TB).
    """
    li = load(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    salted = (
        li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(F.count("*").alias("pn"), F.sum(price_dec).alias("pt"))
    )
    return (
        salted.groupBy("l_returnflag")
        .agg(F.sum("pn").alias("n"), F.sum("pt").cast("double").alias("total"))
    )


@register(
    "b4_corr_regression",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 2)  AS qty_price_covar,
               round(regr_slope(l_extendedprice, l_quantity), 4)  AS price_per_qty,
               round(regr_intercept(l_extendedprice, l_quantity), 2) AS base_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b4_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: bivariate statistics — correlation, covariance, least-squares
    slope/intercept — in one hash aggregate (all streaming-mergeable moments,
    so partial+final works and 100 TB costs one shuffle of 5 doubles/group).
    Covariance/intercept round coarser: like variance, their ~1e4-1e5
    magnitudes put engine-algorithm divergence near fine rounding boundaries.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("base_price"),
    )


@register(
    "b4_histogram_width_bucket",
    oracle="""
        -- DuckDB 1.0 has no width_bucket; spell out its semantics
        -- (bucket 0 below lo, n+1 above hi, else floor((x-lo)/w)+1)
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 500000 THEN 21
                         ELSE floor(o_totalprice / 25000) + 1 END AS BIGINT) AS bucket,
               count(*) AS n,
               round(min(o_totalprice), 6) AS lo,
               round(max(o_totalprice), 6) AS hi
        FROM orders
        GROUP BY 1
    """,
)
def b4_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: equi-width histogram via width_bucket + hash aggregate — the
    distributed histogram (each bucket's count merges associatively)."""
    o = load(spark, sf_dir, "orders")
    b = F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20))
    return o.groupBy(b.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
    )


@register(
    "b4_freq_items",
    oracle="""
        WITH tot AS (SELECT count(*) AS n FROM lineitem)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT l_returnflag FROM lineitem GROUP BY l_returnflag
                    HAVING count(*) > 0.2 * (SELECT n FROM tot))) AS n_true_frequent_flags,
               (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT l_linenumber FROM lineitem GROUP BY l_linenumber
                    HAVING count(*) > 0.2 * (SELECT n FROM tot))) AS n_true_frequent_lines,
               TRUE AS flags_all_found,
               TRUE AS lines_all_found
    """,
)
def b4_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: approximate frequent items (Karp et al. streaming heavy-hitters) —
    constant memory per column, single pass; the 100 TB alternative to an
    exact top-k over an unbounded-cardinality column.

    The sketch may return false positives (engine-specific), so the oracle
    checks the algorithm's GUARANTEE instead: every value whose true
    frequency exceeds the support threshold must appear in the sketch output
    — verified in-query by cross-joining the sketch row with the exact
    frequent sets and folding array_contains over them."""
    li = load(spark, sf_dir, "lineitem")
    fi = li.freqItems(["l_returnflag", "l_linenumber"], support=0.2)

    def exact_frequent(col: str, alias: str) -> DataFrame:
        counts = li.groupBy(col).agg(F.count("*").alias("cnt"))
        total = li.agg(F.count("*").alias("tot"))
        return (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") > 0.2 * F.col("tot"))
            .agg(F.collect_list(col).alias(alias))
        )

    flags = exact_frequent("l_returnflag", "true_flags")
    lines = exact_frequent("l_linenumber", "true_lines")
    contains_all = lambda truth, sketch: F.forall(  # noqa: E731
        truth, lambda x: F.array_contains(sketch, x)
    )
    return (
        fi.crossJoin(F.broadcast(flags))
        .crossJoin(F.broadcast(lines))
        .select(
            F.size("true_flags").cast("bigint").alias("n_true_frequent_flags"),
            F.size("true_lines").cast("bigint").alias("n_true_frequent_lines"),
            contains_all(F.col("true_flags"), F.col("l_returnflag_freqItems")).alias(
                "flags_all_found"
            ),
            contains_all(F.col("true_lines"), F.col("l_linenumber_freqItems")).alias(
                "lines_all_found"
            ),
        )
    )


@register(
    "b4_collect_sorted_lists",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name)                    AS nations_csv,
               array_to_string(list_sort(list(DISTINCT n_nationkey % 5)), ',')
                                                                          AS key_mod_set,
               count(*)                                                   AS n
        FROM nation
        GROUP BY n_regionkey
    """,
)
def b4_collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: collection aggregates — collect_list / collect_set materialized as
    deterministically-sorted CSV strings (collection order is engine- and
    partition-dependent, so raw arrays can never hash-match across engines;
    sorting before serializing is the portable discipline).

    Scale note: collect_* is bounded by group width — safe here (≤25 nations
    per region), an anti-pattern on unbounded groups; the cap belongs in the
    query (slice/filter) not the engine.
    """
    return (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nations_csv"
            ),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set(F.col("n_nationkey") % 5)),
                    lambda x: x.cast("string"),
                ),
            ).alias("key_mod_set"),
            F.count("*").alias("n"),
        )
    )


@register(
    "b4_median_bool",
    oracle="""
        SELECT l_returnflag,
               round(median(l_quantity), 6)           AS median_qty,
               round(median(l_extendedprice), 6)      AS median_price,
               bool_and(l_quantity <= 50)             AS all_qty_in_range,
               bool_or(l_extendedprice > 90000)       AS any_big_ticket,
               count(*)                               AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def b4_median_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: exact median + boolean aggregates (bool_and/bool_or).

    Exact median requires a per-group sort (unlike approx_percentile's
    constant-memory sketch, ``b4_percentile_approx``) — at 100 TB use the
    sketch; the exact form stays for low-group-count audits like this one.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round6(F.median("l_quantity"), "median_qty"),
        round6(F.median("l_extendedprice"), "median_price"),
        F.bool_and(F.col("l_quantity") <= 50).alias("all_qty_in_range"),
        F.bool_or(F.col("l_extendedprice") > 90000).alias("any_big_ticket"),
        F.count("*").alias("n"),
    )


@register(
    "b4_grouping_id",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def b4_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: grouping() markers distinguish real NULL group keys from rollup
    subtotal rows — required for correct downstream consumption of any
    ROLLUP/CUBE output."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n"),
        )
    )


@register(
    "b4_filtered_aggs",
    oracle="""
        SELECT o_orderpriority,
               CAST(count_if(o_totalprice > 150000) AS BIGINT)        AS n_big,
               round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 0), 6) AS finished_spend,
               CASE WHEN count_if(o_orderstatus = 'O') > 0
                    THEN round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                               FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
                         / CAST(count_if(o_orderstatus = 'O') AS BIGINT), 6)
               END                                                    AS open_avg,
               count(*)                                               AS n
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def b4_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: conditionally-filtered aggregates (SQL FILTER clause / count_if).

    One pass over the data computes every conditional aggregate at once — the
    scale-safe alternative to self-joining k filtered subqueries (k scans →
    1 scan). Spark expresses FILTER as agg-over-when(cond, x) with nulls
    ignored, which compiles to the same conditional accumulation.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        round6(
            F.coalesce(
                # exact DECIMAL accumulation: per-group magnitude exceeds 1e8 at
                # sf0.01, where float64 summation-order error straddles round-6
                # (float discipline, CLAUDE.md) — r01 hash flake root cause
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "F",
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ),
            "finished_spend",
        ),
        # AVG's underlying float64 sum is ~4.5e8 at sf0.01 — above the 1e8
        # DECIMAL threshold (float discipline, CLAUDE.md): a different
        # parallel summation order can straddle the round-6 boundary, the
        # r01-r04 driver hash flake. Exact DECIMAL sum ÷ exact count, then
        # ONE double division identical on both sides.
        round6(
            F.when(
                F.count_if(F.col("o_orderstatus") == "O") > 0,
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "O",
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                ).cast("double")
                / F.count_if(F.col("o_orderstatus") == "O"),
            ),
            "open_avg",
        ),
        F.count("*").alias("n"),
    )


@register(
    "b4_hll_sketch_mergeable",
    oracle="""
        SELECT r_name,
               CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_customers,
               TRUE AS union_within_5pct
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name
    """,
)
def b4_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: Apache DataSketches HLL (`hll_sketch_agg` / `hll_union_agg`) —
    the MERGEABLE sketch tier above `approx_count_distinct`.

    What the extra tier buys at 100 TB: the per-nation binary sketches are a
    storable rollup — region/global distinct counts come from UNIONING those
    sketches (bytes per nation), never rescanning the fact rows; the same
    sketch column serves every rollup level and every later query. Same
    verification idea as `b4_approx_count_distinct`: estimates are
    engine-specific, so the query emits exact counts plus an in-query
    boolean asserting the sketch-union estimate lands within 5% of exact;
    the oracle asserts the identical exact counts with literal TRUE."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    per_nation = joined.groupBy("r_name", "n_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    unioned = per_nation.groupBy("r_name").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = joined.groupBy("r_name").agg(
        F.countDistinct("c_custkey").alias("exact_customers")
    )
    return exact.join(unioned, "r_name").select(
        "r_name",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            / F.col("exact_customers")
            <= 0.05
        ).alias("union_within_5pct"),
    )


@register(
    "b4_observe_metrics",
    # The observed metrics are plain aggregates over the scan — relationally
    # recomputable (DECIMAL-exact total → identical double both sides).
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS rows_seen,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS qty_total,
               CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                   AS returned_rows,
               TRUE AS metrics_match
        FROM lineitem
    """,
)
def b4_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: in-flight pipeline metrics via ``df.observe`` — named aggregates
    collected DURING another query's execution, no second scan (Spark's
    AccumulatorV2-backed Observation API; the mechanism behind streaming's
    observed metrics).

    Why it matters at 100 TB: data-quality counters (rows read, nulls seen,
    value totals) on a petabyte scan are free as observations but cost a
    full re-scan as a separate query. Self-verified: the observed metrics
    must equal an independent aggregate recompute exactly — count equality
    and a DECIMAL-summed total, so no float-order tolerance is needed."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_total"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned_rows"),
    )
    # the *real* query this pipeline runs; metrics piggyback on its scan
    per_flag = observed.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n")
    )
    per_flag_rows = {r["l_returnflag"]: r["n"] for r in per_flag.collect()}

    got = obs.get
    expect = li.agg(
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_total"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned_rows"),
    ).collect()[0]
    if (
        got["rows_seen"] != expect["rows_seen"]
        or got["qty_total"] != expect["qty_total"]
        or got["returned_rows"] != expect["returned_rows"]
        or got["returned_rows"] != per_flag_rows.get("R", 0)
    ):
        raise AssertionError(
            f"observed metrics {got} diverge from recompute {expect.asDict()}"
        )
    return spark.createDataFrame(
        [
            (
                int(got["rows_seen"]),
                float(got["qty_total"]),
                int(got["returned_rows"]),
                True,
            )
        ],
        "rows_seen bigint, qty_total double, returned_rows bigint, metrics_match boolean",
    )


@register(
    "b4_data_profile",
    oracle="""
        SELECT 'o_custkey' AS col,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(o_custkey) AS BIGINT) AS n_non_null,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
               CAST(min(o_custkey) AS DOUBLE) AS min_v,
               CAST(max(o_custkey) AS DOUBLE) AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(count(*) AS BIGINT),
               CAST(count(o_totalprice) AS BIGINT),
               CAST(count(DISTINCT o_totalprice) AS BIGINT),
               round(CAST(min(o_totalprice) AS DOUBLE), 6),
               round(CAST(max(o_totalprice) AS DOUBLE), 6)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate',
               CAST(count(*) AS BIGINT),
               CAST(count(o_orderdate) AS BIGINT),
               CAST(count(DISTINCT o_orderdate) AS BIGINT),
               CAST(epoch(min(o_orderdate)) AS DOUBLE),
               CAST(epoch(max(o_orderdate)) AS DOUBLE)
        FROM orders
    """,
)
def b4_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: column profiling — the data-quality summary every ingest pipeline
    computes before accepting a batch (null rates, cardinality, value
    bounds; the relational core of `df.summary()` but exact and
    oracle-verifiable, no approximate quantiles).

    One scan per profiled column set — Spark computes all three profile
    rows from grouped one-pass aggregates and unions the 1-row frames
    plan-side (no shuffle beyond the aggregates; at 100 TB this is the
    cheap pre-commit gate before a WAP publish)."""
    o = load(spark, sf_dir, "orders")

    def prof(col: str, minmax_expr):
        mn, mx = minmax_expr
        return o.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count(col).cast("bigint").alias("n_non_null"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            mn.alias("min_v"),
            mx.alias("max_v"),
        )

    return (
        prof(
            "o_custkey",
            (F.min("o_custkey").cast("double"), F.max("o_custkey").cast("double")),
        )
        .unionByName(
            prof(
                "o_totalprice",
                (
                    F.round(F.min("o_totalprice").cast("double"), 6),
                    F.round(F.max("o_totalprice").cast("double"), 6),
                ),
            )
        )
        .unionByName(
            prof(
                "o_orderdate",
                (
                    F.unix_timestamp(F.min("o_orderdate")).cast("double"),
                    F.unix_timestamp(F.max("o_orderdate")).cast("double"),
                ),
            )
        )
    )
