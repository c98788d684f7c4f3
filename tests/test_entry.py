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
