"""Local replica of the driver's DuckDB-oracle comparison.

Mimics the driver gate (``__spark_entry__`` docstring): run the Spark query and
the oracle SQL on the same parquet, then compare row-count + column names +
order-insensitive values. This is the reference's DuckDB-vs-Presto
differential method (``/root/reference/README.md:85-211``) automated per
operator, so a green ``test_parity.py`` locally predicts a green
CORRECTNESS_r{N}.json from the driver.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from apache_iceberg_demo_spark.io import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            # Spark-written tables are directories of part files (e.g. the
            # tools/scale_probe.py scaled dirs); DuckDB needs the glob form
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        r = round(v, 6)
        if r == int(r):
            return f"{int(r)}"
        return f"{r:.6f}".rstrip("0")
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def canonical(rows, cols) -> list[tuple]:
    """Sort columns by name, normalize every cell, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare(spark_df, con, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (driver-style)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_can = canonical(s_rows, s_cols)
    d_can = canonical(d_rows, d_cols)
    if s_can != d_can:
        diffs = [
            (a, b) for a, b in zip(s_can, d_can) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, duckdb): {diffs}")
