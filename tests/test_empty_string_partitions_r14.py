"""Round-14 differential-fuzzer findings, fixed + pinned: EMPTY-STRING
partition values.

Spark's dynamic-partition writer sends a ''-valued partition to the same
``__HIVE_DEFAULT_PARTITION__`` dir as null (verified — and vanilla Spark
reads BOTH back as null), so the hive layout cannot distinguish them and
one physical file can mix ''-derived and null-derived rows. The engine's
semantics:

- identity partitions: '' is conflated to null at write, exactly like
  vanilla ``partitionBy`` (the value lives only in the dir name);
- transform partitions (truncate-on-string derives ''): the SOURCE data
  is stored in the files, so reads are exact — and the round-14 fixes
  make every consumer agree: routing keys unify '' with the null
  sentinel (DELETE of ''-rows silently skipped and UPDATE *duplicated*
  them before), and the spec reader's manifest-summary prune includes ''
  in a string range whose summary contains_null (a ``tag = ''`` read
  pruned the manifest holding the ''-file before).
"""
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.sources.iceberg_v2 import (
    export_iceberg_v2,
    read_iceberg_v2,
)
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

from tests.test_iceberg_v2 import _load_validator


def test_row_level_ops_on_empty_string_partition_values(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = spark.createDataFrame(
        [(1, ""), (2, None), (3, "xy"), (4, "")], "k int, tag string"
    )
    wh.create_or_replace("t", dd, partition_by="truncate(3, tag)")
    assert sorted(
        [(r.k, r.tag) for r in wh.read("t").collect()], key=str
    ) == sorted([(1, ""), (2, None), (3, "xy"), (4, "")], key=str)
    # pre-fix: silently deleted NOTHING
    wh.delete_where("t", "tag = ''")
    assert sorted(
        [(r.k, r.tag) for r in wh.read("t").collect()], key=str
    ) == sorted([(2, None), (3, "xy")], key=str)

    wh.create_or_replace("u", dd, partition_by="truncate(3, tag)")
    # pre-fix: DUPLICATED the ''-rows (appended updates, kept originals)
    wh.update_where("u", "tag = ''", {"k": "k + 100"})
    assert sorted(
        [(r.k, r.tag) for r in wh.read("u").collect()], key=str
    ) == sorted([(101, ""), (104, ""), (2, None), (3, "xy")], key=str)

    # MoR + merge on the ''-partition
    wh.create_or_replace("m", dd, partition_by="truncate(3, tag)")
    wh.delete_where_mor("m", "tag = '' AND k = 1")
    assert sorted(r.k for r in wh.read("m").collect()) == [2, 3, 4]
    wh.merge_into(
        "m",
        spark.createDataFrame([(4, "", 1), (9, "", 1)], "k int, tag string, x int")
        .drop("x"),
        on=["k"],
    )
    assert sorted(r.k for r in wh.read("m").collect()) == [2, 3, 4, 9]

    # export + spec read: `tag = ''` must return the ''-rows (pre-fix the
    # manifest-summary prune dropped the manifest holding the ''-file)
    loc = export_iceberg_v2(wh, "u", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert read_iceberg_v2(spark, loc).count() == 4
    assert sorted(
        r.k
        for r in read_iceberg_v2(spark, loc, where="tag = ''").collect()
    ) == [101, 104]
    assert [
        r.k
        for r in read_iceberg_v2(spark, loc, where="tag IS NULL").collect()
    ] == [2]


def test_identity_empty_string_conflation_is_consistent(spark, tmp_path):
    """Identity partitions conflate '' to null at write — exactly what
    vanilla Spark partitionBy does (the value exists only as the dir
    name). Pin the CONSISTENCY: native read, ops, export, and spec read
    all agree on the null semantics; no divergence, no crash."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = spark.createDataFrame(
        [(1, ""), (2, None), (3, "xy")], "k int, tag string"
    )
    wh.create_or_replace("i", dd, partition_by="tag")
    got = {r.k: r.tag for r in wh.read("i").collect()}
    assert got == {1: None, 2: None, 3: "xy"}  # '' conflated, like Spark
    assert sorted(
        r.k for r in wh.read("i", where="tag IS NULL").collect()
    ) == [1, 2]
    assert wh.read("i", where="tag = ''").count() == 0
    wh.delete_where("i", "tag IS NULL")
    assert [r.k for r in wh.read("i").collect()] == [3]
    loc = export_iceberg_v2(wh, "i", str(tmp_path / "ice"))
    assert _load_validator().validate(loc, deep=True) == []
    assert [r.k for r in read_iceberg_v2(spark, loc).collect()] == [3]
