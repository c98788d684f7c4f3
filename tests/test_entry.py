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
