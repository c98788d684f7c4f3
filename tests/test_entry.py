"""Smoke: the driver entry contract."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_flagship(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_queries_have_callables(spark):
    qs = e.queries()
    assert len(qs) > 0
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)


def test_system_queries_oracle_is_late_bound(spark):
    """The c6_system_queries oracle must list EXACTLY the final registry —
    one VALUES row per registered query, oracle_paired flags included —
    since it is authored after every module imports (registry.
    _finalize_late_oracles)."""
    from apache_iceberg_demo_spark import registry

    sql = e.oracle_sql()["c6_system_queries"]
    for name in registry.QUERIES:
        assert f"'{name}'" in sql
    # one VALUES tuple per registered query
    assert sql.count("(' ".strip()) >= len(registry.QUERIES)
    # the frame the query serves agrees with the oracle row-for-row
    df = registry.QUERIES["c6_system_queries"](spark, "/root/testdata/sf0.001")
    rows = {(r.query_name, r.inventory_row, r.oracle_paired) for r in df.collect()}
    expected = {
        (n, n.split("_")[0], n in registry.ORACLES) for n in registry.QUERIES
    }
    assert rows == expected


def test_spark_submit_entry_a17():
    """A17: the engine runs under the standard cluster submission tool —
    `spark-submit tools/submit_job.py` with its own driver JVM (only the
    cluster manager differs from a real cluster; the script takes the
    submitter's SparkSession unchanged)."""
    import json
    import os
    import shutil
    import subprocess
    import sys

    submit = shutil.which("spark-submit")
    if submit is None:
        import pyspark

        submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    if not os.path.exists(submit):
        import pytest

        pytest.skip("spark-submit not available")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            os.path.join(repo, "tools", "submit_job.py"),
            "/root/testdata/sf0.001",
            "a12_q3_group_agg_sort",
        ],
        capture_output=True,
        text=True,
        timeout=240,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["query"] == "a12_q3_group_agg_sort" and out["rows"] > 0
    assert len(out["columns"]) >= 2
