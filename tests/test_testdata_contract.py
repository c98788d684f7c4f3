"""Full testdata schema contract — the round-4 drift class, made loud.

Round 4 stalled because ``events.ts`` silently flipped TIMESTAMP(NANOS) →
timestamp[us] between rounds and 18 queries broke with confusing hash
mismatches. The events loader now sniffs vintages (tests/test_io_vintages.py),
but the OTHER nine tables have no drift guard, and several oracles assume
layout facts beyond column types (single-file lineitem for the `_metadata`
provenance oracle — ADVICE r06). This module pins the complete contract so any
driver-side testdata regeneration fails pytest with a message naming the
drifted table instead of a downstream value-hash mismatch.

Pure pyarrow footer reads — no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01") if os.path.isdir(d)]

# Column name → type string, per table. events.ts is the one column with a
# known second vintage (timestamp[ns], rounds 1-3) that the loader handles.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": ("timestamp[us]", "timestamp[ns]"),
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_contract(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    assert os.path.exists(path), f"TESTDATA DRIFT: {path} is gone"
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    exp = EXPECTED[table]
    assert list(got) == list(exp), (
        f"TESTDATA DRIFT in {path}: columns {list(got)} != expected {list(exp)} "
        f"— re-run the round-start schema diff checklist (CLAUDE.md)"
    )
    for col, want in exp.items():
        allowed = want if isinstance(want, tuple) else (want,)
        assert got[col] in allowed, (
            f"TESTDATA DRIFT in {path}: {col} is {got[col]}, expected one of "
            f"{allowed} — audit every oracle touching {table}.{col} "
            f"(the round-4 events.ts class of failure)"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lineitem_is_single_file(sf_dir):
    """The b1_metadata_columns oracle derives provenance from a single
    ``lineitem.parquet`` file with dense 0..n-1 row indices (ADVICE r06,
    formats.py). A multi-file or directory-shaped vintage must fail HERE
    with a clear name, not downstream as a value-hash mismatch."""
    path = os.path.join(sf_dir, "lineitem.parquet")
    assert os.path.isfile(path), (
        f"TESTDATA DRIFT: {path} is not a single file — b1_metadata_columns "
        f"and the _metadata provenance oracle assume one-file layout"
    )
