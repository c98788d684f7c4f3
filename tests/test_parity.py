"""Oracle parity for every registered SQL-expressible query (driver replica).

Runs at sf0.001 by default for speed; set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01
to rehearse the driver's exact scale.
"""

from __future__ import annotations

import os

import pytest

from apache_iceberg_demo_spark import registry
from tests.oracle_utils import compare, duck_connect

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    compare(df, duck, registry.ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0
