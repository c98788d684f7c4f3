"""Plan-shape assertions (SURVEY.md §4): the optimizations the reference
observes in its engines must be visible in our Catalyst plans too."""

from __future__ import annotations

from apache_iceberg_demo_spark import registry
from apache_iceberg_demo_spark.plans.explain import (
    count_exchanges,
    has_pushed_filter,
    join_strategies,
    pushed_filters,
    read_schema_columns,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_q1_filter_reaches_scan(spark):
    """Reference Q1's effect (6.55 MB of 2 GB, README.md:162) = pushdown."""
    df = registry.QUERIES["a10_q1_filter_count"](spark, SF)
    assert has_pushed_filter(df, "EqualTo(l_linenumber,3)"), pushed_filters(df)


def test_flagship_prunes_columns(spark):
    """Only the 7 referenced columns reach the scan (11-column table)."""
    df = registry.QUERIES["flagship_pricing_summary"](spark, SF)
    (cols,) = read_schema_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_returnflag"} <= cols


def test_star_join_broadcasts_dimensions(spark):
    """customer/nation/region must hash-join as broadcasts — the fact table
    never shuffles for dimensions."""
    df = registry.QUERIES["b3_join_star_revenue"](spark, SF)
    strategies = join_strategies(df)
    assert strategies.count("BroadcastHashJoin") >= 3, strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_flagship_single_agg_shuffle(spark):
    """Two-level exact-integer aggregate (r15): one shuffle per aggregation
    level — the first carries ~6 pre-aggregated rows per scan task, the
    second ~6 groups — plus one for the tiny ordered result. All shuffles
    are metadata-sized; the scan-level work is codegen'd long arithmetic."""
    df = registry.QUERIES["flagship_pricing_summary"](spark, SF)
    assert count_exchanges(df) <= 3


def test_topk_avoids_global_sort(spark):
    """ORDER BY + LIMIT plans as TakeOrderedAndProject, not a full sort."""
    from apache_iceberg_demo_spark.plans.explain import formatted_plan

    df = registry.QUERIES["b6_topk_limit"](spark, SF)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_semi_join_no_duplicate_blowup(spark):
    df = registry.QUERIES["b3_join_semi"](spark, SF)
    plan_joins = join_strategies(df)
    assert len(plan_joins) == 1  # a single semi join, no extra distinct pass


def test_bucketed_join_zero_exchanges(spark):
    """Bucketed co-located fact-fact join: SMJ with no shuffle exchanges —
    pay the bucketing shuffle at write time, never per query."""
    df = registry.QUERIES["b3_join_bucketed_colocated"](spark, SF)
    assert set(join_strategies(df)) == {"SortMergeJoin"}
    assert count_exchanges(df) == 0


def test_ivf_no_global_window_or_driver_count(spark):
    """IVF must never plan the r01 scale-killer (VERDICT.md r01 "What's
    wrong" #2): an unpartitioned row_number() over EVERY corpus vector to
    pick nearest centroids. Since the r05 trained-quantizer rewrite the
    driver state is the k-means contract (k×dim centroid floats); the
    per-vector assignment is a JVM fold with NO window function at all, and
    the candidate path is corpus ⋈ assignment ⋈ broadcast(query)."""
    from apache_iceberg_demo_spark.plans.explain import formatted_plan

    df = registry.QUERIES["c3_ann_ivf_topk"](spark, SF)
    plan = formatted_plan(df)
    assert "Window" not in plan, "per-vector window function in IVF plan"
    # final top-k must be a per-partition heap, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_dpp_join_prunes_partitions_at_runtime(spark):
    """Partitioned fact ⋈ filtered dim must inject a dynamicpruningexpression
    into the fact scan's PartitionFilters — whole partition dirs skipped at
    runtime from the broadcast side's rows (the 100 TB star-join pattern)."""
    from apache_iceberg_demo_spark.plans.explain import formatted_plan

    df = registry.QUERIES["b3_join_dpp_partitioned"](spark, SF)
    assert "dynamicpruning" in formatted_plan(df).lower()


def test_nation_volume_single_fact_shuffle_pair(spark):
    """Q7-shape 6-table join: only lineitem⋈orders may shuffle; supplier,
    customer, and both nation legs must be broadcast."""
    df = registry.QUERIES["b3_nation_volume_matrix"](spark, SF)
    strategies = join_strategies(df)
    assert strategies.count("BroadcastHashJoin") >= 4, strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_disjunctive_predicates_push_to_scan(spark):
    """Q19-shape OR-of-ANDs: Catalyst must factor the common conjuncts out of
    the disjunction and push brand/size and quantity bounds into their scans."""
    df = registry.QUERIES["b2_disjunctive_pushdown"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "p_brand" in pushed, pushed
    assert "l_quantity" in pushed, pushed


def test_latest_shipper_exchange_reuse(spark):
    """Q21-shape triple self-join on l_orderkey: the semi and anti legs must
    join as hash/sort-merge on the same key — never a nested-loop — so the
    orderkey exchange is reusable."""
    df = registry.QUERIES["b2_latest_shipper_per_order"](spark, SF)
    strategies = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strategies, strategies
    assert "CartesianProduct" not in strategies, strategies


def test_exists_late_shipment_is_semi_join(spark):
    """Q4-shape correlated EXISTS must plan as one semi join, not a
    re-executed subquery or an aggregate+inner-join detour."""
    df = registry.QUERIES["b2_exists_late_shipment"](spark, SF)
    strategies = join_strategies(df)
    assert len(strategies) == 1, strategies


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime bloom-filter join pruning (session.py enables it): a selective
    dim filter must inject `might_contain(bloom_filter_agg(...))` into the
    FACT side's filter — the scan-side reduction that makes non-broadcast
    star joins viable at 100 TB. Forced to a shuffle join here (broadcast
    disabled) because broadcast joins don't need the bloom."""
    from pyspark.sql import functions as F

    from apache_iceberg_demo_spark.io import load
    from apache_iceberg_demo_spark.tuning import scoped_conf

    with scoped_conf(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        },
    ):
        li = load(spark, SF, "lineitem").select("l_partkey", "l_quantity")
        p = load(spark, SF, "part").filter(F.col("p_size") == 1).select("p_partkey")
        df = li.join(p, li.l_partkey == p.p_partkey).agg(
            F.sum("l_quantity").alias("s")
        )
        opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in opt and "bloom_filter_agg" in opt, opt[:500]


def test_unigram_scorer_prunes_to_text_columns(spark):
    """The LM build and the scoring pass must each read only (doc_id, text) —
    a scan dragging lang/source/n_chars through the explode is wrong."""
    df = registry.QUERIES["c5_unigram_logprob_score"](spark, SF)
    for cols in read_schema_columns(df):
        assert cols <= {"doc_id", "text"}, cols


def test_retention_scans_two_columns_only(spark):
    """Cohort retention touches a 6-column events table but may read only
    (user_id, ts) on both the first-touch and activity legs."""
    df = registry.QUERIES["b4_retention_cohorts"](spark, SF)
    for cols in read_schema_columns(df):
        assert cols <= {"user_id", "ts"}, cols


def test_hll_sketch_broadcasts_dims(spark):
    """Nation/region legs of the sketch rollup must broadcast; the customer
    side shuffles only for the sketch aggregates."""
    df = registry.QUERIES["b4_hll_sketch_mergeable"](spark, SF)
    strategies = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in strategies
    assert strategies.count("BroadcastHashJoin") >= 2, strategies


def test_cap_per_source_uses_window_group_limit(spark):
    """The rn<=50 filter must push into the sort as a per-key limit
    (WindowGroupLimit) — rank-then-filter without it buffers whole
    partitions at 100 TB."""
    df = registry.QUERIES["s1_cap_per_source"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    (cols,) = read_schema_columns(df)
    assert cols <= {"doc_id", "source"}  # 2-column scan of a 5-column table


def test_span_dedup_two_shuffles_pruned_scan(spark):
    """Span extraction = window pass + group-by: exactly two exchanges, and
    only (doc_id, text) leave the scan."""
    df = registry.QUERIES["c5_span_dedup_exact"](spark, SF)
    assert count_exchanges(df) == 2
    (cols,) = read_schema_columns(df)
    assert cols <= {"doc_id", "text"}


def test_bm25_broadcasts_stats_and_takes_topk(spark):
    """BM25: the df join carries NO hint (a full inverted index generalizes
    it to vocabulary scale where a forced broadcast OOMs) — AQE still
    broadcasts it here from its observed ≤3-row size. Asserted on the
    post-AQE final plan. Ranking is TakeOrderedAndProject, never a global
    sort of all scored docs."""
    from apache_iceberg_demo_spark.plans.explain import executed_plan, formatted_plan

    df = registry.QUERIES["c5_bm25_search"](spark, SF)
    assert "TakeOrderedAndProject" in formatted_plan(df)
    final = executed_plan(df)
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_tfidf_df_join_broadcasts_by_threshold_not_hint(spark):
    """Regression (VERDICT r05 weak #1): the document-frequency join must
    carry NO broadcast hint — on a 100 TB web corpus the token vocabulary
    runs to hundreds of millions of rows and a forced hint OOMs the
    executors instead of letting AQE fall back to a shuffle join. At this
    SF the threshold/AQE decision still broadcasts it (post-AQE final
    plan); the only hinted frame left is the 1-row corpus-size aggregate."""
    from apache_iceberg_demo_spark.plans.explain import executed_plan

    df = registry.QUERIES["c5_tfidf_top_terms"](spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") <= 1  # n_docs only, never df_
    final = executed_plan(df)
    assert "BroadcastHashJoin" in final  # threshold-driven, not hint-forced
    assert "SortMergeJoin" not in final


def test_weighted_sample_no_global_sort(spark):
    """Efraimidis-Spirakis top-k must plan as per-partition heaps
    (TakeOrderedAndProject), not a full shuffle sort of the table."""
    from apache_iceberg_demo_spark.plans.explain import formatted_plan

    df = registry.QUERIES["s1_weighted_sample_topk"](spark, SF)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_covariance_scan_prunes_to_embedding(spark):
    """The Gram-partial pass must read ONLY the embedding column."""
    df = registry.QUERIES["c3_covariance_matrix"](spark, SF)
    for cols in read_schema_columns(df):
        assert "vec_id" not in cols and "label" not in cols


def test_triangle_count_broadcasts_degree(spark):
    """Degree frames (one row per node) broadcast back onto edges; the
    wedge join is the only big self-join."""
    df = registry.QUERIES["b3_triangle_count_copurchase"](spark, SF)
    assert join_strategies(df).count("BroadcastHashJoin") >= 2
