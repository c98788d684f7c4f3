"""Round-6 surface semantics (operators/round6.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from apache_iceberg_demo_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_sql_scripting_compound_matches_closed_form(spark):
    """The WHILE loop's 3 compounding rounds must equal the closed-form
    ((t*1.05)*1.05)*1.05 on the same DECIMAL-summed base."""
    row = registry.QUERIES["b2_sql_scripting_compound"](spark, SF).first()
    base = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
        .first()[0]
    )
    assert row["n_rounds"] == 3
    assert row["compounded_revenue"] == round(((base * 1.05) * 1.05) * 1.05, 6)


def test_approx_top_k_exact_on_small_domain(spark):
    """k and the tracked-item budget exceed the domain, so the sketch's
    counts must be exactly the group-by counts."""
    got = {
        r["item"]: r["cnt"]
        for r in registry.QUERIES["b4_approx_top_k_events"](spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact


def test_dynamic_gap_purchase_extends_session(spark):
    """A purchase holds the session open 60 min: a follow-up event 40 min
    later merges after a purchase but starts a new session after a view."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 0, 0), "purchase"),
        (1, datetime.datetime(2024, 1, 1, 10, 40, 0), "view"),
        (2, datetime.datetime(2024, 1, 1, 10, 0, 0), "view"),
        (2, datetime.datetime(2024, 1, 1, 10, 40, 0), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("15 minutes")
    )
    got = (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    sessions = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    assert sessions == {1: 1, 2: 2}


def test_cogroup_reconcile_matches_join(spark):
    """The cogrouped-pandas reconciliation must equal the plain join+agg."""
    got = registry.QUERIES["b10_cogroup_apply_reconcile"](spark, SF)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expected = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_extendedprice"), 6).alias("gross"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 6).alias("total_price"),
            "gross",
            F.round(F.col("o_totalprice") - F.col("gross"), 6).alias("delta"),
        )
    )
    assert got.count() == expected.count()
    diff = got.exceptAll(expected)
    assert diff.count() == 0


def test_cogroup_bucket_count_scales_with_input(spark):
    """The cogroup bucket count must grow with the fact side's input splits
    (VERDICT r06 'what's wrong' #1: a fixed 64 caps parallelism and OOMs at
    100 TB); 4 buckets per split, floored at 8 splits."""
    from apache_iceberg_demo_spark.operators.round6 import _cogroup_buckets

    small = spark.range(1000).repartition(2)
    big = spark.range(1000).repartition(64)
    assert _cogroup_buckets(small) == 32  # floor: 4 * max(8, 2)
    assert _cogroup_buckets(big) == 256   # scales: 4 * 64
    assert _cogroup_buckets(big) > _cogroup_buckets(small)


def test_bpe_merge_table_deterministic_and_ranked(spark):
    """Top-5 merge pairs: ranks dense 1..5, frequencies non-increasing,
    ties broken by pair string ascending."""
    rows = (
        registry.QUERIES["c5_bpe_pair_merges"](spark, SF)
        .orderBy("merge_rank")
        .collect()
    )
    assert [r["merge_rank"] for r in rows] == [1, 2, 3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        assert a["freq"] > b["freq"] or (
            a["freq"] == b["freq"] and a["pair"] < b["pair"]
        )
        assert len(a["pair"]) == 2


def test_group_order_by_all_matches_explicit(spark):
    """GROUP BY ALL must group on exactly the non-aggregate select items."""
    got = registry.QUERIES["b6_group_order_by_all"](spark, SF)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    expected_n = o.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert got.count() == expected_n
