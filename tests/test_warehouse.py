"""Warehouse semantics: snapshots, time travel, compaction, expiry, skipping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _lineitem(spark):
    return (
        load(spark, SF, "lineitem")
        .limit(1000)
        .withColumn("ship_day", F.date_format("l_shipdate", "yyyy-MM"))
    )


def test_replace_then_append_time_travel(spark, wh):
    li = _lineitem(spark)
    first = li.filter(F.col("l_linenumber") == 1)
    rest = li.filter(F.col("l_linenumber") != 1)

    s1 = wh.create_or_replace("t", first, partition_by="ship_day")
    assert s1["snapshot_id"] == 1
    n1 = wh.read("t").count()
    assert n1 == first.count()

    s2 = wh.append("t", rest)
    assert s2["parent_id"] == 1
    assert wh.read("t").count() == li.count()
    # time travel back to v1
    assert wh.read("t", snapshot_id=1).count() == n1
    # as-of timestamp travel
    assert wh.read("t", as_of_ms=s1["timestamp_ms"]).count() == n1


def test_schema_wins_on_replace(spark, wh):
    """The reference's replace-wins quirk (SURVEY.md §1.3) made explicit."""
    li = _lineitem(spark)
    wh.create_or_replace("t", li.select("l_orderkey", "ship_day"), partition_by="ship_day")
    wh.create_or_replace("t", li.select("l_orderkey", "l_quantity"))  # new schema
    got = wh.read("t")
    assert set(got.columns) == {"l_orderkey", "l_quantity"}


def test_compaction_preserves_data_and_reduces_files(spark, wh):
    li = _lineitem(spark).repartition(8)
    wh.create_or_replace("t", li)
    before = wh.files("t").count()
    total_before = wh.read("t").agg(F.sum("l_orderkey")).collect()[0][0]
    wh.rewrite_data_files("t", target_file_mb=512)
    after = wh.files("t").count()
    total_after = wh.read("t").agg(F.sum("l_orderkey")).collect()[0][0]
    assert total_after == total_before
    assert after <= before


def test_expire_snapshots_gc(spark, wh):
    li = _lineitem(spark)
    wh.create_or_replace("t", li.limit(100))
    wh.create_or_replace("t", li.limit(200))
    old_files = [f["path"] for f in wh._snapshot(wh._load_meta("t"), 1)["manifest"]]
    removed = wh.expire_snapshots("t", keep_last=1)
    assert removed == len([p for p in old_files])
    assert all(not os.path.exists(p) for p in old_files)
    assert wh.read("t").count() == 200
    with pytest.raises(KeyError):
        wh.read("t", snapshot_id=1)


def test_file_skipping_correctness(spark, wh):
    li = _lineitem(spark)
    wh.create_or_replace("t", li, partition_by="ship_day")
    meta = wh._load_meta("t")
    month = meta["snapshots"][-1]["manifest"][0]["partition"]["ship_day"]
    pred = f"ship_day = '{month}'"
    pruned = wh.read("t", where=pred)
    full = wh.read("t").filter(pred)
    assert pruned.count() == full.count() > 0
    # stats-based skipping on a data column min/max
    kept = [
        f
        for f in meta["snapshots"][-1]["manifest"]
        if not wh._can_skip(f, "l_orderkey < -1")
    ]
    assert kept == []  # impossible predicate skips every file


def test_merge_into_semantics(spark, wh):
    """MERGE INTO: updates replace, inserts append, untouched rows survive,
    and the pre-merge snapshot remains time-travelable."""
    li = _lineitem(spark)
    base = li.filter(F.col("l_linenumber") <= 3).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    wh.create_or_replace("t", base)
    n_base = base.count()

    changes = (
        li.filter(F.col("l_linenumber").isin(3, 4))
        .select("l_orderkey", "l_linenumber")
        .withColumn("l_quantity", F.lit(-1.0))
    )
    wh.merge_into("t", changes, on=["l_orderkey", "l_linenumber"])

    merged = wh.read("t")
    n3 = li.filter(F.col("l_linenumber") == 3).count()
    n4 = li.filter(F.col("l_linenumber") == 4).count()
    assert merged.count() == n_base + n4  # inserts added, updates in place
    assert merged.filter(F.col("l_quantity") == -1.0).count() == n3 + n4
    # untouched rows unchanged
    assert merged.filter((F.col("l_linenumber") <= 2) & (F.col("l_quantity") == -1.0)).count() == 0
    # pre-merge state still reachable
    assert wh.read("t", snapshot_id=1).filter(F.col("l_quantity") == -1.0).count() == 0


def test_hidden_partitioning_transforms(spark, wh):
    """Iceberg-style hidden partitioning: days(ts)/months(ts)/bucket(n,col)
    derived by the writer, pruned on read, re-derived on append."""
    li = load(spark, SF, "lineitem").limit(800)
    wh.create_or_replace("t", li.limit(400), partition_by="months(l_shipdate)")
    # writer derived the partition column; user never supplied it
    assert "l_shipdate_months" in wh.read("t").columns
    # append a batch WITHOUT the derived column — writer re-derives
    wh.append("t", li.offset(400) if hasattr(li, "offset") else li.subtract(li.limit(400)))
    assert wh.read("t").count() == 800
    # partition pruning on the hidden column
    meta = wh._load_meta("t")
    month = meta["snapshots"][-1]["manifest"][0]["partition"]["l_shipdate_months"]
    pred = f"l_shipdate_months = '{month}'"
    assert wh.read("t", where=pred).count() == wh.read("t").filter(pred).count() > 0

    # bucket transform
    wh.create_or_replace("tb", li, partition_by="bucket(8, l_orderkey)")
    parts = {f["partition"]["l_orderkey_bucket"]
             for f in wh._load_meta("tb")["snapshots"][-1]["manifest"]}
    assert len(parts) <= 8 and len(parts) > 1


def test_scd2_history_tracking(spark, wh):
    """SCD2: changed keys get closed-out history rows + a new current row;
    unchanged keys stay current; full history preserved."""
    c = load(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    base = (
        c.withColumn("valid_from", F.lit("2020-01-01").cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    wh.create_or_replace("dim", base)
    n = c.count()

    changes = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .withColumn("c_mktsegment", F.lit("CHANGED"))
        .withColumn("eff", F.lit("2021-06-01").cast("timestamp"))
    )
    n_changed = changes.count()
    wh.apply_scd2("dim", changes, key=["c_custkey"], effective_ts_col="eff")

    out = wh.read("dim")
    assert out.count() == n + n_changed  # history row per change
    cur = out.filter(F.col("valid_to").isNull())
    assert cur.count() == n  # exactly one current row per key
    assert cur.filter(F.col("c_mktsegment") == "CHANGED").count() == n_changed
    closed = out.filter(F.col("valid_to").isNotNull())
    assert closed.count() == n_changed
    assert closed.filter(F.col("c_mktsegment") == "CHANGED").count() == 0


def test_iceberg_fallback_chain(spark, tmp_path):
    """The engineered Iceberg fallback: runtime jar absent here, so the
    write lands in the snapshot warehouse with identical results."""
    from apache_iceberg_demo_spark.sources.iceberg_catalog import (
        iceberg_available,
        iceberg_write_or_fallback,
    )

    assert iceberg_available(spark) is False  # offline environment
    li = load(spark, SF, "lineitem").limit(100)
    backend = iceberg_write_or_fallback(
        spark, li, "cat.db.li_fallback", str(tmp_path / "wh")
    )
    assert backend == "warehouse"
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.read("li_fallback").count() == 100
