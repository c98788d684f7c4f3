"""Float-discipline audit (CLAUDE.md: money sums >= 1e8 accumulate in DECIMAL).

Runs every registered oracle through DuckDB ONLY (no Spark — fast) at sf0.01
and measures each DOUBLE column's max magnitude. A double whose magnitude can
reach the 5e7 safety band must come from DECIMAL accumulation, otherwise
float64 summation-order error straddles the round-6 boundary and the driver
hash compare becomes a coin flip (root cause of the r01 `b4_filtered_aggs`
failure; see VERDICT.md "What's wrong" #1).

The audit is magnitude-measured, not grep-based: it catches any future oracle
whose data outgrows float64 exactness instead of relying on authors to
remember the rule.
"""

from __future__ import annotations

import os

import pytest

from apache_iceberg_demo_spark import registry
from tests.oracle_utils import duck_connect

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.01")

# Magnitude band: 1e8 is where float64 ULP (~1.5e-8 relative) times a few
# thousand summation terms crosses the 1e-6 round boundary; audit at 5e7 for
# a 2x safety margin (sf scaling, data drift between rounds).
THRESHOLD = 5e7

# Columns allowed to exceed the band WITHOUT decimal accumulation, each with a
# reason. Only non-additive statistics qualify: their error is relative to the
# statistic's own magnitude and both engines use the same two-pass formula, so
# round(x, 2) (variance rule, CLAUDE.md) absorbs the noise.
EXEMPT: dict[str, str] = {
    "b4_agg_stats.variance": "variance rounds to 2 by the float rule; not a sum",
    "b4_agg_stats.stddev": "sqrt of variance; same rule",
    "b4_corr_regression.var_price": "variance; rounds to 2",
    "b4_data_profile.min_v": "MIN is order-insensitive selection, not a sum",
    "b4_data_profile.max_v": "MAX is order-insensitive selection, not a sum",
}


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_money_sums_use_decimal(duck, name):
    sql = registry.ORACLES[name]
    tbl = duck.execute(sql).fetch_arrow_table()
    offenders = []
    for col in tbl.schema.names:
        field = tbl.schema.field(col)
        if str(field.type) != "double":
            continue
        import pyarrow.compute as pc

        arr = tbl.column(col)
        if arr.null_count == len(arr) or len(arr) == 0:
            continue
        mx = pc.max(pc.abs(pc.drop_null(arr))).as_py()
        if mx is not None and mx >= THRESHOLD:
            if f"{name}.{col}" in EXEMPT:
                continue
            if "decimal" not in sql.lower():
                offenders.append((col, mx))
    assert not offenders, (
        f"{name}: double column(s) {offenders} exceed {THRESHOLD:.0e} without "
        "DECIMAL accumulation in the oracle — float discipline violation "
        "(CLAUDE.md); the Spark side must match with .cast('decimal(18,2)')"
    )
