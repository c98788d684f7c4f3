"""Round-14 probe cycle 5, pinned: type-system edges through partition
routing and the v2 export. All came back CLEAN on first run — pinned so
regressions fail loudly: float identity partitions with NaN/±Infinity
values (no NaN bound lies; contains_nan-compatible summaries), boolean
identity partitions, TIMESTAMP_NTZ fidelity (exports as Iceberg
'timestamp', not 'timestamptz'; days() over ntz), bucket-on-string with
non-BMP unicode + empty string, a THREE-field spec with full lifecycle,
and time travel to a snapshot before a MoR delete (no retroactive
application).
"""
import math

from pyspark.sql import functions as F

from apache_iceberg_demo_spark.sources.iceberg_v2 import (
    export_iceberg_v2,
    read_iceberg_v2,
)
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

from tests.test_iceberg_v2 import _load_meta, _load_validator


def test_float_and_bool_identity_partitions(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    fx = spark.createDataFrame(
        [(1, 1.5), (2, -0.25), (3, float("nan")), (4, float("inf")),
         (5, float("-inf")), (6, None), (7, 1.5)],
        "k int, f double",
    )
    wh.create_or_replace("x", fx, partition_by="f")
    got = {r.k: r.f for r in wh.read("x").collect()}
    assert len(got) == 7 and math.isnan(got[3]) and got[6] is None
    assert got[4] == float("inf") and got[5] == float("-inf")
    loc = export_iceberg_v2(wh, "x", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    g = {r.k: r.f for r in read_iceberg_v2(spark, loc).collect()}
    assert len(g) == 7 and math.isnan(g[3])
    assert g[4] == float("inf") and g[5] == float("-inf")

    bx = spark.createDataFrame(
        [(1, True), (2, False), (3, None), (4, True)], "k int, b boolean"
    )
    wh.create_or_replace("xb", bx, partition_by="b")
    assert sorted(
        r.k for r in wh.read("xb", where="b = true").collect()
    ) == [1, 4]
    locb = export_iceberg_v2(wh, "xb", str(tmp_path / "ice_b"))
    assert mod.validate(locb, deep=True) == []
    assert {
        r.k: r.b for r in read_iceberg_v2(spark, locb).collect()
    } == {1: True, 2: False, 3: None, 4: True}


def test_timestamp_ntz_fidelity(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ny = spark.sql(
        "SELECT id AS k, CAST(timestamp_ntz'2024-03-05 10:00:00' + "
        "make_interval(0,0,0,CAST(id AS INT),0,0,0) AS timestamp_ntz) AS tn "
        "FROM range(0, 6)"
    )
    assert dict(ny.dtypes)["tn"] == "timestamp_ntz"
    wh.create_or_replace("y", ny)
    loc = export_iceberg_v2(wh, "y", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    m = _load_meta(loc)
    cur = next(
        s for s in m["schemas"] if s["schema-id"] == m["current-schema-id"]
    )
    assert next(
        f["type"] for f in cur["fields"] if f["name"] == "tn"
    ) == "timestamp"  # ntz — not timestamptz
    g = read_iceberg_v2(spark, loc)
    assert dict(g.dtypes)["tn"] == "timestamp_ntz"
    assert sorted(str(r.tn) for r in g.collect()) == sorted(
        str(r.tn) for r in ny.collect()
    )
    wh.create_or_replace("yd", ny, partition_by="days(tn)")
    locd = export_iceberg_v2(wh, "yd", str(tmp_path / "ice_d"))
    assert mod.validate(locd, deep=True) == []
    assert read_iceberg_v2(spark, locd).count() == 6


def test_bucket_string_unicode_and_empty(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    combining = "cafe\u0301"   # e + COMBINING ACUTE (NFD)
    nfc = "caf\u00e9"  # precomposed é
    zs = spark.createDataFrame(
        [(1, "crab🦀"), (2, "crab🦀"), (3, combining), (4, nfc),
         (5, ""), (6, None), (7, "plain")],
        "k int, s string",
    )
    wh.create_or_replace("z", zs, partition_by="bucket(8, s)")
    assert sorted(
        r.k for r in wh.read("z", where="s = 'crab🦀'").collect()
    ) == [1, 2]
    # NFC 'café' vs combining-mark 'café' are distinct byte strings —
    # they hash to their own buckets and never conflate
    assert [r.k for r in wh.read("z", where=f"s = '{nfc}'").collect()] == [4]
    assert [r.k for r in wh.read("z", where="s = ''").collect()] == [5]
    loc = export_iceberg_v2(wh, "z", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert sorted(
        r.k
        for r in read_iceberg_v2(spark, loc, where="s = 'crab🦀'").collect()
    ) == [1, 2]
    assert [
        r.k for r in read_iceberg_v2(spark, loc, where="s = ''").collect()
    ] == [5]
    assert read_iceberg_v2(spark, loc).count() == 7


def test_three_field_spec_lifecycle(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ta = spark.sql(
        "SELECT id AS k, timestamp'2024-01-10 00:30:00' + "
        "make_interval(0,0,0,CAST(id % 5 AS INT),0,0,0) AS ts, "
        "CAST(id % 7 AS INT) AS uid, "
        "CONCAT('cat', CAST(id % 3 AS STRING), '-long') AS cat, "
        "CAST(id AS DOUBLE) AS v FROM range(0, 40)"
    )
    wh.create_or_replace(
        "aa", ta, partition_by="days(ts), bucket(4, uid), truncate(4, cat)"
    )
    assert wh.read("aa").count() == 40
    loc = export_iceberg_v2(wh, "aa", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert read_iceberg_v2(spark, loc).count() == 40
    whr = "ts >= '2024-01-12' AND uid = 3 AND cat = 'cat1-long'"
    assert read_iceberg_v2(spark, loc, where=whr).count() == \
        ta.filter(whr).count()
    wh.delete_where_mor("aa", "v >= 35")
    wh.apply_deletes("aa")
    wh.rewrite_data_files("aa")
    assert wh.read("aa").count() == 35
    loc2 = export_iceberg_v2(wh, "aa", str(tmp_path / "ice2"))
    assert mod.validate(loc2, deep=True) == []
    assert read_iceberg_v2(spark, loc2).count() == 35


def test_time_travel_before_mor_delete(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tb = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)],
        "k int, tag string, v double",
    )
    wh.create_or_replace("ab", tb)
    wh.delete_where_mor("ab", "tag = 'x'")
    loc = export_iceberg_v2(wh, "ab", str(tmp_path / "ice"))
    m = _load_meta(loc)
    sids = [e["snapshot-id"] for e in m["snapshot-log"]]
    assert sorted(
        r.k for r in read_iceberg_v2(spark, loc).collect()
    ) == [2]
    assert sorted(
        r.k
        for r in read_iceberg_v2(spark, loc, snapshot_id=sids[0]).collect()
    ) == [1, 2, 3]
