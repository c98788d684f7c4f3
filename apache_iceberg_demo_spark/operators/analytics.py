"""Complex analytic query pack (SURVEY.md §2 B2/B3/B4 extension) — TPC-H
derived decision-support shapes over the synthetic star schema, adapted to
its column subset (no partsupp/comment/receiptdate columns).

The reference demonstrates its engines on TPC-H-style scans and aggregates
(``/root/reference/README.md:85-211``); this module widens that surface to
the harder shapes a warehouse engine must plan well: correlated EXISTS /
NOT EXISTS (de-correlated to semi/anti joins), aggregate-membership
subqueries, double aggregation over an outer join, a 6-table nation-pair
volume join, and a ties-safe argmax via exact DECIMAL comparison.

Scale notes per query in the docstrings; the common rules: dims broadcast,
facts shuffle at most once per key change, money sums accumulate in DECIMAL
(CLAUDE.md float discipline), and every predicate lives below the join it
feeds so Catalyst pushes it into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b2_exists_late_shipment",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1995-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def b2_exists_late_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q4 shape): priority census of orders with a late shipment —
    correlated EXISTS with a non-equi correlated predicate.

    Spark-first: the EXISTS becomes a LEFT SEMI join on ``l_orderkey =
    o_orderkey`` with the ``l_shipdate > o_orderdate + 60 days`` residual
    evaluated inside the join — one shuffle on orderkey, no subquery
    re-execution per row (the 100 TB de-correlation Catalyst would also pick
    for the SQL form)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "b2_not_exists_quiet_customers",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 6) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority LIKE '1%')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def b2_not_exists_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q22 shape): well-funded customers with no urgent orders —
    uncorrelated scalar subquery + correlated NOT EXISTS.

    Spark-first: the scalar threshold is a broadcast 1-row aggregate (no
    driver collect), the NOT EXISTS a LEFT ANTI join against the filtered
    orders — the anti side is pre-filtered to urgent orders only, so the
    anti-join build is a fraction of the orders table."""
    c = load(spark, sf_dir, "customer")
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").like("1%"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, on="c_custkey", how="left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "b2_agg_membership_big_orders",
    oracle="""
        SELECT c_name, o_orderkey,
               round(o_totalprice, 6) AS price,
               round(sum(l_quantity), 6) AS total_qty
        FROM customer c
        JOIN orders o ON c_custkey = o_custkey
        JOIN lineitem l ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        GROUP BY c_name, o_orderkey, o_totalprice
        ORDER BY o_orderkey
    """,
)
def b2_agg_membership_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q18 shape): large-volume orders — IN over a grouped HAVING
    subquery, then a 3-table join re-aggregated per order.

    Spark-first: the membership set is itself an aggregate (sum(qty) > 300
    per order) joined back LEFT SEMI; at 100 TB the semi join and the final
    join share the l_orderkey shuffle partitioning, so AQE reuses the
    exchange instead of re-shuffling lineitem."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), on="o_orderkey", how="left_semi"
    )
    c = load(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("price"),
            "total_qty",
        )
        .orderBy("o_orderkey")
    )


@register(
    "b3_custdist_outer_agg",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
            GROUP BY c.c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def b3_custdist_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (TPC-H Q13 shape): customer order-count distribution — LEFT OUTER
    join with an ON-clause filter (filter must NOT drop orderless customers),
    then two stacked aggregations.

    Spark-first: count(o_orderkey) ignores the nulls the outer join
    introduces, exactly like SQL; the second aggregation is over ≤ a few
    thousand distinct counts — map-side partial aggregation collapses it
    before the (tiny) shuffle."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "b3_nation_volume_matrix",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            WHERE n1.n_regionkey = 0 AND n2.n_regionkey <= 1
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01') shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def b3_nation_volume_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (TPC-H Q7 shape): shipping volume between nation pairs by year —
    a 6-table join (2 facts + 4 dims) with region-restricted nation pairs.

    Spark-first plan: lineitem⋈orders is the ONLY fact-fact shuffle;
    supplier, customer and both nation legs are broadcast hash joins layered
    on the probe stream (each dim ≤ a few thousand rows at any realistic
    scale-up of this schema — nation is 25 rows forever). The region and
    ship-date filters sit below their joins, so both prune at the scan.
    Revenue accumulates in DECIMAL: join-arrival order must not flap the
    round-6 hash."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    n1 = n.filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_regionkey") <= 1).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "b4_top_supplier_revenue",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
)
def b4_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (TPC-H Q15 shape): the top supplier(s) by quarterly revenue —
    aggregate, then argmax against a scalar subquery over the SAME aggregate,
    ties kept.

    Ties-safe across engines because the argmax equality compares EXACT
    DECIMAL sums, never floats (two float sums that differ at the 1e-9 level
    would pick different winners per engine); the double cast happens only on
    output. Spark-first: the revenue aggregate is computed once and reused
    for both the max (broadcast 1-row agg) and the equality filter — no
    second scan of lineitem."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "b3_market_share",
    oracle="""
        SELECT o_year,
               round(CAST(sum(CAST(CASE WHEN supp_region = 0 THEN volume ELSE 0 END
                                   AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6)
                   AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   sn.n_regionkey AS supp_region
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
            WHERE cn.n_regionkey = 1) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def b3_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (TPC-H Q8 shape): region-0 suppliers' market share of region-1
    customers' spend, by order year — conditional-aggregate ratio over a
    6-table join.

    Spark-first: single fact-fact shuffle (lineitem⋈orders); customer,
    supplier, and both nation legs broadcast. The share is a ratio of two
    EXACT DECIMAL sums — numerator and denominator are order-insensitive, so
    the round-6 double division is stable across partitionings (a float
    accumulator on either side would flap the hash)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    cn = n.filter(F.col("n_regionkey") == 1).select(
        F.col("n_nationkey").alias("cn_key")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("supp_region")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    num = F.sum(F.when(F.col("supp_region") == 0, vol).otherwise(F.lit(0).cast("decimal(18,6)")))
    den = F.sum(vol)
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "b4_promo_revenue_share",
    oracle="""
        SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                                THEN l_extendedprice * (1 - l_discount)
                                                ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,6))) AS DOUBLE), 6)
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate <  TIMESTAMP '1995-10-01'
    """,
)
def b4_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (TPC-H Q14 shape): percent of one month's revenue from PROMO parts —
    conditional aggregation over a fact⋈dim join, single-row output.

    Spark-first: the ship-date filter pushes into the lineitem scan (one
    month survives), part broadcasts, and the global aggregate is a partial
    + final HashAggregate with no groupBy shuffle at all. Exact DECIMAL
    numerator/denominator as in b3_market_share."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,6)"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * num.cast("double") / F.sum(vol).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "b2_disjunctive_pushdown",
    oracle="""
        SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15
               AND l_quantity BETWEEN 1  AND 20)
           OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
    """,
)
def b2_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q19 shape): revenue under three disjunctive brand/size/
    quantity branches — the classic OR-of-ANDs predicate-pushdown test.

    Spark-first: Catalyst factors the common single-side conjuncts out of the
    OR — ``p_brand IN (...)``, ``p_size BETWEEN 1 AND 50``, ``l_quantity
    BETWEEN 1 AND 50`` each push into their own scan BELOW the join — then
    evaluates the full disjunction as the join residual. At 100 TB the
    pushed brand/size filter shrinks the broadcast side to 3 brands before
    the join builds."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & qty.between(10, 35))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(20, 50) & qty.between(20, 50))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.round(F.sum(vol).cast("double"), 6).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "b2_latest_shipper_per_order",
    oracle="""
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
    """,
)
def b2_latest_shipper_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q21 shape): suppliers who shipped last in multi-supplier
    finished orders — EXISTS and NOT EXISTS both correlated to the same
    outer row with inequality residuals.

    Spark-first: both subqueries de-correlate to self-joins of lineitem on
    l_orderkey — a LEFT SEMI (some other supplier exists) and a LEFT ANTI
    (no other supplier shipped later). All three legs hash-partition on
    orderkey, so AQE reuses one exchange of the fact instead of three; the
    supplier dim broadcasts onto the survivors."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = li.alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    ).alias("l3")
    waiting = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2"))
            & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3"))
            & (F.col("l1.l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "b4_rollup_reuse_hierarchy",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY day
        ORDER BY day
    """,
)
def b4_rollup_reuse_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (hypertable continuous-aggregate shape): daily event rollup derived
    FROM an hourly partial rollup, not from the raw table.

    count and sum are decomposable, so ``daily = agg(hourly)`` is exact while
    touching 24× fewer rows than a raw rescan. This is the continuous-
    aggregate / materialized-rollup pattern a 100 TB time-series store lives
    on: materialize the finest rollup once, serve every coarser granularity
    (day/week/month) from it. The oracle recomputes daily straight from the
    raw table — proving the two-level derivation is lossless. Spark-first:
    both levels are partial+final HashAggregates; the second level's input is
    already grouped on a prefix of the first's key, so AQE sees a tiny
    exchange (≤ 24 rows/day)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v"), 6).alias("total_value"),
        )
        .orderBy("day")
    )


@register(
    "b3_local_supplier_volume",
    oracle="""
        SELECT n.n_name,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'REGION_2'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n_name
    """,
)
def b3_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (TPC-H Q5 shape): revenue where customer and supplier share a
    nation, per nation of one region — the join graph closes a cycle
    (customer⋈supplier on nationkey THROUGH the lineitem⋈orders spine).

    Spark-first: the cycle edge (c_nationkey = s_nationkey) rides as a
    residual on the supplier broadcast join instead of forcing a second
    fact shuffle; nation⋈region collapses to a broadcast semi-filter before
    it ever touches the facts."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_2")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "b4_revenue_delta_forecast",
    oracle="""
        SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
                                   AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue_delta
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
)
def b4_revenue_delta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (TPC-H Q6 shape): forgone revenue if small-quantity discounts were
    dropped — pure scan+filter+global agg, the canonical pushdown probe.

    All three predicates push into the parquet scan (row-group min/max skip
    at 100 TB); no shuffle at all — partial agg per split, one tiny final."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                6,
            ).alias("revenue_delta")
        )
    )


@register(
    "b3_returned_item_reporting",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               round(c.c_acctbal, 6) AS c_acctbal,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1995-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def b3_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (TPC-H Q10 shape): top-20 customers by returned-merchandise revenue
    in a quarter — fact⋈fact⋈dim⋈dim with a top-k on an aggregate.

    Spark-first: returnflag + order-date filters prune both fact scans below
    the join; customer/nation broadcast; the final ORDER BY + LIMIT plans as
    TakeOrderedAndProject (no global sort of the aggregate). Ties can't flap
    the cut: revenue is an exact DECIMAL sum and c_custkey breaks the rest."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 6).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "b2_small_quantity_avg_correlated",
    oracle="""
        SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey)
    """,
)
def b2_small_quantity_avg_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q17 shape): revenue from orders below 20% of a part's
    average quantity — correlated scalar aggregate over the SAME fact table.

    Spark-first: the correlated subquery de-correlates to a per-part average
    (one aggregate of lineitem) joined back on partkey — both sides share the
    l_partkey shuffle, so AQE reuses one exchange; the brand filter prunes
    via the broadcast part dim BEFORE the per-part average is joined. Money
    sum accumulates in DECIMAL (result magnitude ~1e6 but per-part sums are
    summation-order-sensitive at round-6 otherwise)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    per_part_avg = branded.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        branded.join(per_part_avg, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "b2_sql_api_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def b2_sql_api_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q3 shape, raw-SQL surface): the engine's ``spark.sql`` entry
    point — temp views over the parquet tables, then the literal SQL text.

    Same Catalyst plan as the DataFrame form (views are lazy aliases, filters
    still push to the scans, dims still broadcast) — registered to prove the
    SQL front door end-to-end, since every other query exercises the
    DataFrame front door. Views are per-session temp objects; registration is
    idempotent."""
    from apache_iceberg_demo_spark.io import register_views

    register_views(spark, sf_dir, tables=("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT l.l_orderkey,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


@register(
    "b2_sql_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
)
def b2_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (SQL pipe syntax, Spark 4): the `|>` pipelined-SQL front door —
    the same filter→aggregate plan as the ANSI form, written as a linear
    dataflow (`FROM … |> WHERE … |> AGGREGATE … GROUP BY`). Catalyst parses
    pipe stages into the identical logical plan (filter pushed to the scan,
    partial/final hash aggregate), so this registers the *parser surface*,
    not a new execution path; money sum accumulates in DECIMAL on both
    sides per the float discipline."""
    from apache_iceberg_demo_spark.io import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS total_price
           GROUP BY o_orderpriority
        """
    )


@register(
    "b3_min_cost_supplier",
    oracle="""
        WITH pair_cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eu AS (
            SELECT pc.l_partkey, pc.l_suppkey, pc.unit_cost,
                   s_acctbal, s_name, n_name
            FROM pair_cost pc
            JOIN supplier ON s_suppkey = pc.l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT round(eu.s_acctbal, 6) AS s_acctbal, eu.s_name, eu.n_name,
               p.p_partkey, p.p_type, round(eu.unit_cost, 6) AS unit_cost
        FROM eu
        JOIN part p ON p.p_partkey = eu.l_partkey
        WHERE p.p_size = 15 AND p.p_type = 'LARGE'
          AND eu.unit_cost = (SELECT min(e2.unit_cost) FROM eu e2
                              WHERE e2.l_partkey = eu.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
)
def b3_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 (TPC-H Q2 shape): cheapest supplier per part in a region — the
    correlated-min scalar subquery, de-correlated to an aggregate + re-join.

    The testdata has no partsupp table (reference README.md:85 TPC-H subset),
    so "supply cost" is the supplier's minimum observed unit sell price from
    lineitem — min is order-insensitive, so the float compares identically on
    both engines (no summation-order hazard).

    Spark-first: one shuffle builds (part, supplier, min unit price); the
    region restriction rides on broadcast dims; the correlated min becomes a
    per-part aggregate joined back on (partkey, cost) — the same
    de-correlation Catalyst performs for the SQL form, with the part filter
    pushed below both sides. At 100 TB the only big shuffle is the pair
    aggregate, keyed on (partkey, suppkey)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    pair_cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("unit_price").alias("unit_cost")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        pair_cost.join(F.broadcast(s), pair_cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    part_min = eu.groupBy(F.col("l_partkey").alias("pm_key")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    return (
        eu.join(
            part_min,
            (eu.l_partkey == part_min.pm_key) & (eu.unit_cost == part_min.min_cost),
        )
        .join(F.broadcast(p), eu.l_partkey == p.p_partkey)
        .select(
            F.round("s_acctbal", 6).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_type",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "b3_product_type_profit",
    oracle="""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               round(CAST(sum(CAST(
                   l_extendedprice * (1 - l_discount)
                   - 0.25 * p_retailprice * l_quantity
                   AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
        ORDER BY nation, o_year DESC
    """,
)
def b3_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B4 (TPC-H Q9 shape): profit by supplier nation and order year for
    one product line — a 5-table join with a computed per-row measure.

    No partsupp.ps_supplycost exists in the testdata, so cost is proxied as
    25% of retail price per unit; the shape (name-LIKE part filter, fact
    joined to part+supplier+orders+nation, nation x year rollup) is Q9's.

    Spark-first: part/supplier/nation broadcast; lineitem->orders is the one
    fact-fact shuffle on orderkey; the measure accumulates in DECIMAL(18,6)
    because national yearly profit exceeds the 1e8 float-discipline line at
    scale. Per-row arithmetic stays in the textual order of the oracle so the
    IEEE results agree bit-for-bit before the decimal cast."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.25) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(amount).cast("double"), 6).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "b4_important_stock_value",
    oracle="""
        WITH partvalue AS (
            SELECT l_partkey,
                   sum(CAST(l_quantity * p_retailprice AS DECIMAL(18,2))) AS value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN part     ON p_partkey = l_partkey
            WHERE n_name IN ('NATION_3', 'NATION_7')
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey,
               round(CAST(value AS DOUBLE), 6) AS stock_value
        FROM partvalue
        WHERE value > (SELECT sum(value) * 0.001 FROM partvalue)
        ORDER BY stock_value DESC, p_partkey
    """,
)
def b4_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (TPC-H Q11 shape): parts holding a significant share of two
    nations' stock value — a grouped aggregate filtered against a scalar
    subquery over the SAME aggregate.

    Stock value is proxied from shipped lineitems (quantity x retail price;
    no partsupp.ps_availqty in the testdata). Both the per-part values and
    the global threshold accumulate in DECIMAL, so the > compare is exact on
    both engines.

    Spark-first: the per-part aggregate is built once as a lineage; the
    global total re-derives from the same subplan, which Spark's
    ReuseExchange collapses to a single shuffle at execution, and joins back
    as a broadcast 1-row relation (no driver collect)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    partvalue = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,2)")
            ).alias("value")
        )
    )
    threshold = partvalue.agg((F.sum("value") * F.lit(0.001)).alias("cut"))
    return (
        partvalue.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("cut"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value").cast("double"), 6).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "p_partkey")
    )


@register(
    "b4_shipdelay_priority",
    oracle="""
        SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY THEN 'SLOW'
                    WHEN l_shipdate >= o_orderdate + INTERVAL 21 DAY THEN 'MEDIUM'
                    ELSE 'FAST' END AS ship_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY ship_bucket
        ORDER BY ship_bucket
    """,
)
def b4_shipdelay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (TPC-H Q12 shape): order-priority census by shipping class — the
    conditional two-way count aggregate. The testdata has no l_shipmode /
    l_commitdate / l_receiptdate, so the class is derived from the
    order-to-ship delay (interval compares only: no datediff dtype hazard).

    Spark-first: the one shuffle is lineitem-orders on orderkey (both fact
    tables; AQE picks SMJ at scale), the year filter pushes into the lineitem
    scan, and both counts come from a single pass of conditional sums rather
    than two scans."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (
        F.when(
            F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            "SLOW",
        )
        .when(
            F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 21 DAYS"),
            "MEDIUM",
        )
        .otherwise("FAST")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "b4_supplier_part_census",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#9'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def b4_supplier_part_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 (TPC-H Q16 shape): how many suppliers can serve each surviving
    (brand, type, size) bucket — NOT IN exclusion subquery + COUNT DISTINCT.
    Supplier "complaints" are proxied by negative account balance (the
    testdata has no s_comment column); lineitem is the part-supplier bridge
    (no partsupp table).

    Spark-first: the NOT IN becomes a broadcast LEFT ANTI join (the excluded
    supplier list is tiny and NULL-free by construction, so anti-join
    semantics match NOT IN); part prunes to 3 columns and broadcasts; the
    COUNT DISTINCT shuffles (brand, type, size, suppkey) once, which Spark
    expands to the standard two-phase distinct aggregate."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "b2_promotion_part_suppliers",
    oracle="""
        SELECT s_name, round(s_acctbal, 6) AS s_acctbal
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
              GROUP BY l_suppkey, l_partkey
              HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                               AND l_shipdate <  TIMESTAMP '1997-01-01'
                              THEN l_quantity ELSE 0 END)
                     > 0.3 * sum(l_quantity))
        ORDER BY s_name
    """,
)
def b2_promotion_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (TPC-H Q20 shape): regional suppliers who moved a concentrated
    share of a promoted product line — doubly nested IN subqueries over a
    grouped HAVING. The availability predicate (ps_availqty) is proxied as
    "1996 shipped over 30% of all-time shipped quantity for that part" since
    the testdata has no partsupp.

    Spark-first: the inner part-name IN is a broadcast semi join into the
    lineitem scan; the HAVING is a conditional-sum aggregate on (suppkey,
    partkey); the outer IN collapses to a semi join of the tiny supplier dim
    against the distinct qualifying suppkeys. Quantities are integral
    doubles, so the sums are exact and the 0.3x compare is engine-stable."""
    promo_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    in_1996 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(promo_parts), on="l_partkey", how="left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias("q96"),
            F.sum("l_quantity").alias("q_all"),
        )
        .filter(F.col("q96") > F.lit(0.3) * F.col("q_all"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(qualifying, on="s_suppkey", how="left_semi")
        .select("s_name", F.round("s_acctbal", 6).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "b4_retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort,
                   date_diff('day', f.cohort, CAST(date_trunc('day', e.ts) AS DATE))
                       AS day_offset
            FROM events e JOIN firsts f USING (user_id)
        )
        SELECT cohort AS cohort_day,
               CAST(day_offset AS INT) AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM activity GROUP BY cohort, day_offset
    """,
)
def b4_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: cohort retention triangle — users grouped by first-activity day,
    counted as retained on each later day they appear (the product-analytics
    staple the reference's engines get asked for constantly).

    Plan: first-touch per user (one hash aggregate), join activity back on
    user_id, distinct (user, cohort, offset), count per cell. Two shuffles,
    both on user_id until the final cell count; the cohort dimension is
    derived, never stored. At 100 TB the firsts frame is user-dimension
    sized — orders smaller than events — and the join key is the natural
    events partitioning, so no extra exchange on the fact side."""
    from apache_iceberg_demo_spark.io import load as _load

    ev = _load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.to_date(F.date_trunc("day", "ts")), F.col("cohort"))
            .cast("int")
            .alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort").alias("cohort_day"), "day_offset"
    ).agg(F.count("*").cast("bigint").alias("n_users"))
