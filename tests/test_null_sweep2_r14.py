"""Round-14 probe cycle 2, pinned: partition-routing surfaces the first
null/special-char sweep didn't reach. The probe came back clean on every
surface (update-across-null-partition, MERGE null keys, truncate/days of
null + special values, exotic partition values incl. control chars and
non-BMP unicode, compaction/WAP/branch/rollback on such tables, empty and
delete-everything exports, as-of time travel) — pinned so regressions fail
loudly instead of silently, per the r13 base-rate lesson.
"""
import json
import os
import time

from pyspark.sql import functions as F

from apache_iceberg_demo_spark.sources.iceberg_v2 import (
    export_iceberg_v2,
    read_iceberg_v2,
)
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

from tests.test_iceberg_v2 import _load_validator

SCHEMA = "k int, tag string, v double"


def test_update_moves_across_null_partition(spark, tmp_path):
    """update_where routing INTO and OUT OF the null partition, on
    identity AND bucket-transform tables (the r13 fix re-derives after
    assignments; this pins the null-destination and null-source moves)."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ex = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, None, 3.0), (4, None, 4.0)],
        SCHEMA,
    )
    wh.create_or_replace("e", ex, partition_by="tag")
    wh.update_where("e", "k = 1", {"tag": "NULL"})
    got = {r.k: r.tag for r in wh.read("e").collect()}
    assert got[1] is None and got[2] == "y" and got[3] is None
    wh.update_where("e", "tag IS NULL AND k = 3", {"tag": "'z'"})
    got = {r.k: r.tag for r in wh.read("e").collect()}
    assert got[3] == "z" and got[1] is None and got[4] is None
    assert wh.read("e").count() == 4
    loc = export_iceberg_v2(wh, "e", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert sorted(
        map(tuple, read_iceberg_v2(spark, loc)
            .select("k", "tag", "v").collect()), key=str
    ) == sorted(
        map(tuple, wh.read("e").select("k", "tag", "v").collect()), key=str
    )

    cb = spark.createDataFrame(
        [(1, 100, "x"), (2, 205, "y"), (3, None, "z")],
        "k int, c int, s string",
    )
    wh.create_or_replace("et", cb, partition_by="bucket(4, c)")
    wh.update_where("et", "k = 1", {"c": "NULL"})
    assert sorted(
        r.k for r in wh.read("et", where="c IS NULL").collect()
    ) == [1, 3]
    wh.update_where("et", "c IS NULL AND k = 3", {"c": "77"})
    assert [r.k for r in wh.read("et", where="c = 77").collect()] == [3]


def test_merge_into_null_key_semantics(spark, tmp_path):
    """SQL MERGE: NULL merge keys never match — the target null-key row is
    KEPT and the source null-key row INSERTS (no silent drop, no bogus
    null=null match), on identity and transform tables."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = spark.createDataFrame(
        [(1, "x", 1.0), (None, "y", 2.0), (3, None, 3.0)],
        "id int, tag string, v double",
    )
    wh.create_or_replace("f", t, partition_by="tag")
    src = spark.createDataFrame(
        [(1, "x", 10.0), (None, "n", 20.0), (9, None, 30.0)],
        "id int, tag string, v double",
    )
    wh.merge_into("f", src, on=["id"])
    expect = sorted(
        [(1, "x", 10.0), (None, "y", 2.0), (None, "n", 20.0),
         (3, None, 3.0), (9, None, 30.0)], key=str
    )
    assert sorted(
        map(tuple, wh.read("f").select("id", "tag", "v").collect()), key=str
    ) == expect
    loc = export_iceberg_v2(wh, "f", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert sorted(
        map(tuple, read_iceberg_v2(spark, loc)
            .select("id", "tag", "v").collect()), key=str
    ) == expect

    cb = spark.createDataFrame(
        [(1, 100, 1.0), (2, None, 2.0)], "id int, c int, v double"
    )
    wh.create_or_replace("ft", cb, partition_by="bucket(4, c)")
    wh.merge_into(
        "ft",
        spark.createDataFrame(
            [(2, None, 20.0), (5, None, 50.0)], "id int, c int, v double"
        ),
        on=["id"],
    )
    assert sorted(
        map(tuple, wh.read("ft").select("id", "c", "v").collect()), key=str
    ) == sorted([(1, 100, 1.0), (2, None, 20.0), (5, None, 50.0)], key=str)


def test_truncate_days_transforms_null_and_special(spark, tmp_path):
    """truncate(w, s) over special-char strings + nulls, and days(ts)
    over null timestamps: routing, export, spec-reader pruning (equality
    through the transform, IS NULL, range), validator — all exact."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    tt = spark.createDataFrame(
        [(1, "alpha beta", 1.0), (2, "p%qr", 2.0), (3, None, 3.0),
         (4, "café con leche", 4.0), (5, "x=y=z", 5.0), (6, "al", 6.0)],
        "k int, s string, v double",
    )
    wh.create_or_replace("g", tt, partition_by="truncate(4, s)")
    assert wh.read("g").count() == 6
    assert sorted(
        r.k for r in wh.read("g", where="s = 'alpha beta'").collect()
    ) == [1]
    assert [r.k for r in wh.read("g", where="s IS NULL").collect()] == [3]
    loc = export_iceberg_v2(wh, "g", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert read_iceberg_v2(spark, loc).count() == 6
    assert sorted(
        r.k
        for r in read_iceberg_v2(spark, loc, where="s = 'p%qr'").collect()
    ) == [2]
    assert [
        r.k for r in read_iceberg_v2(spark, loc, where="s IS NULL").collect()
    ] == [3]

    dt = spark.sql(
        "SELECT id AS k, CASE WHEN id % 3 = 0 THEN NULL ELSE "
        "timestamp'2024-03-05 10:00:00' + "
        "make_interval(0,0,0,CAST(id AS INT),0,0,0) END AS ts, "
        "CAST(id AS DOUBLE) AS v FROM range(1, 13)"
    )
    wh.create_or_replace("gd", dt, partition_by="days(ts)")
    assert wh.read("gd", where="ts IS NULL").count() == 4
    locd = export_iceberg_v2(wh, "gd", str(tmp_path / "ice_d"))
    assert mod.validate(locd, deep=True) == []
    assert read_iceberg_v2(spark, locd).count() == 12
    assert read_iceberg_v2(spark, locd, where="ts IS NULL").count() == 4
    assert read_iceberg_v2(
        spark, locd, where="ts >= '2024-03-08'"
    ).count() == dt.filter("ts >= '2024-03-08'").count()


def test_exotic_partition_values_roundtrip(spark, tmp_path):
    """Control chars (newline/tab), quotes, backslash, non-BMP emoji,
    leading/trailing spaces, URI-reserved chars — identity partition
    values must round-trip through create/export/spec-read and row-level
    ops (quoted-literal predicate with doubled '')."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    exo = [
        (1, "line\nbreak"), (2, "tab\there"), (3, "O'Brien"),
        (4, "back\\slash"), (5, "crab🦀claw"), (6, " lead"), (7, "trail "),
        (8, "?q&a#f"), (9, "semi;colon"),
    ]
    hx = spark.createDataFrame(exo, "k int, tag string")
    wh.create_or_replace("h", hx, partition_by="tag")
    assert {r.k: r.tag for r in wh.read("h").collect()} == dict(exo)
    loc = export_iceberg_v2(wh, "h", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert {
        r.k: r.tag for r in read_iceberg_v2(spark, loc).collect()
    } == dict(exo)
    wh.delete_where("h", "tag = 'O''Brien'")
    assert wh.read("h").count() == 8
    wh.update_where("h", "k = 5", {"tag": "'🦀'"})
    assert [r.k for r in wh.read("h", where="tag = '🦀'").collect()] == [5]


def test_empty_and_emptied_table_export(spark, tmp_path):
    """Delete-everything and born-empty tables: native read, export,
    validator, and the spec reader's empty relation (schema preserved)."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ex = spark.createDataFrame([(1, "a b", 1.0), (2, None, 2.0)], SCHEMA)
    wh.create_or_replace("k1", ex, partition_by="tag")
    wh.delete_where("k1", "k >= 0")
    assert wh.read("k1").count() == 0
    loc = export_iceberg_v2(wh, "k1", str(tmp_path / "ice1"))
    assert mod.validate(loc, deep=True) == []
    g = read_iceberg_v2(spark, loc)
    assert g.count() == 0
    assert [c.lower() for c in g.columns] == ["k", "tag", "v"]
    wh.create_or_replace("k2", ex.filter("k < 0"), partition_by="tag")
    loc2 = export_iceberg_v2(wh, "k2", str(tmp_path / "ice2"))
    assert mod.validate(loc2, deep=True) == []
    assert read_iceberg_v2(spark, loc2).count() == 0
