"""Round-14 probe cycle 4, pinned: numeric/temporal edge values through
the partition-transform stack. Two real bugs found and fixed:

1. ANY warehouse write containing a DECIMAL column crashed —
   ``_manifest_for_dir`` read parquet footer min/max via pyarrow, which
   raises ArrowNotImplementedError casting statistics for
   decimal-annotated INT64; stats are optional, so the column's stats are
   now skipped instead (pruning simply doesn't use them).
2. The declared sort order (``cluster_by``) didn't follow
   ``rename_column`` — the stale name silently DROPPED the field from the
   v2 export's sort-orders; it now follows renames and removes dropped
   columns.

Also pins the clean surfaces: pre-1970 (negative-epoch) days/months/hours
transforms, bucket of negative ints, truncate flooring negatives
(Iceberg: -7 trunc 4 = -8, floor-to-multiple not toward-zero), date and
decimal identity partitions, and day-boundary exactness at the epoch
(floorDiv: 1969-12-31T23:59:59.999999 -> day -1).
"""
import json
import os

from pyspark.sql import functions as F

from apache_iceberg_demo_spark.sources.iceberg_v2 import (
    _from_uri,
    export_iceberg_v2,
    read_iceberg_v2,
    read_ocf,
)
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

from tests.test_iceberg_v2 import _load_validator


def _load_meta(loc):
    mdir = os.path.join(loc, "metadata")
    hint = open(os.path.join(mdir, "version-hint.text")).read().strip()
    return json.load(open(os.path.join(mdir, f"v{hint}.metadata.json")))


def _partition_values(loc, field):
    meta = _load_meta(loc)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, mfs = read_ocf(_from_uri(cur["manifest-list"]))
    vals = []
    for m in mfs:
        _, _, es = read_ocf(_from_uri(m["manifest_path"]))
        vals.extend(e["data_file"]["partition"][field] for e in es)
    return vals


def test_pre_epoch_temporal_transforms(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dt = spark.sql(
        "SELECT id AS k, timestamp'1969-12-25 06:00:00' + "
        "make_interval(0,0,0,CAST(id * 3 AS INT),0,0,0) AS ts, "
        "CAST(id AS DOUBLE) AS v FROM range(0, 8)"
    )
    wh.create_or_replace("s", dt, partition_by="days(ts)")
    assert wh.read("s").count() == 8
    n_pre = dt.filter("ts < '1970-01-01'").count()
    assert wh.read("s", where="ts < '1970-01-01'").count() == n_pre
    loc = export_iceberg_v2(wh, "s", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    pvals = _partition_values(loc, "ts_days")
    assert any(p < 0 for p in pvals) and any(p >= 0 for p in pvals)
    assert read_iceberg_v2(spark, loc).count() == 8
    assert read_iceberg_v2(
        spark, loc, where="ts < '1970-01-01'"
    ).count() == n_pre
    for spec in ("months(ts)", "hours(ts)"):
        wh.create_or_replace("sx", dt, partition_by=spec)
        locx = export_iceberg_v2(
            wh, "sx", str(tmp_path / f"ice_{spec[:5]}")
        )
        assert mod.validate(locx, deep=True) == []
        assert read_iceberg_v2(spark, locx).count() == 8


def test_epoch_day_boundary_floordiv(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wb = spark.sql(
        "SELECT 1 AS k, timestamp'1969-12-31 23:59:59.999999' AS ts "
        "UNION ALL SELECT 2, timestamp'1970-01-01 00:00:00' "
        "UNION ALL SELECT 3, timestamp'1970-01-01 23:59:59.999999'"
    )
    wh.create_or_replace("w", wb, partition_by="days(ts)")
    loc = export_iceberg_v2(wh, "w", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert sorted(set(_partition_values(loc, "ts_days"))) == [-1, 0]
    assert read_iceberg_v2(
        spark, loc, where="ts < '1970-01-01'"
    ).count() == 1


def test_bucket_truncate_negative_sources(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    nb = spark.createDataFrame(
        [(1, -5), (2, -5), (3, 7), (4, -1000000), (5, 0), (6, None)],
        "k int, c int",
    )
    wh.create_or_replace("t", nb, partition_by="bucket(8, c)")
    assert sorted(
        r.k for r in wh.read("t", where="c = -5").collect()
    ) == [1, 2]
    loc = export_iceberg_v2(wh, "t", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert sorted(
        r.k for r in read_iceberg_v2(spark, loc, where="c = -5").collect()
    ) == [1, 2]
    assert [
        r.k
        for r in read_iceberg_v2(
            spark, loc, where="c = -1000000"
        ).collect()
    ] == [4]

    tn = spark.createDataFrame(
        [(1, -7), (2, -8), (3, -1), (4, 5), (5, 0)], "k int, c int"
    )
    wh.create_or_replace("tn", tn, partition_by="truncate(4, c)")
    meta = wh._load_meta("tn")
    snap = wh._snapshot(meta, meta["current_snapshot_id"])
    pv = {str(f["partition"]["c_trunc"]) for f in snap["manifest"]}
    assert pv == {"-8", "-4", "0", "4"}  # floor-to-multiple
    assert [r.k for r in wh.read("tn", where="c = -7").collect()] == [1]
    loctn = export_iceberg_v2(wh, "tn", str(tmp_path / "ice_tn"))
    assert mod.validate(loctn, deep=True) == []
    assert [
        r.k
        for r in read_iceberg_v2(spark, loctn, where="c = -7").collect()
    ] == [1]


def test_decimal_column_write_and_identity_partitions(spark, tmp_path):
    """The decimal-stats crash (bug 1 above) plus DATE and DECIMAL
    identity partitions end to end."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = spark.sql(
        "SELECT id AS k, DATE'1969-06-15' + make_interval(0,0,0,"
        "CAST(id * 200 AS INT),0,0,0) AS d, "
        "CAST(id * 1.25 - 1.25 AS DECIMAL(10,2)) AS m FROM range(0, 4)"
    )
    # unpartitioned write with a decimal column (the crash case)
    wh.create_or_replace("plain", dd)
    assert wh.read("plain").count() == 4
    wh.create_or_replace("u", dd, partition_by="d")
    assert wh.read("u").count() == 4
    assert wh.read("u", where="d = '1969-06-15'").count() == 1
    loc = export_iceberg_v2(wh, "u", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    g = read_iceberg_v2(spark, loc)
    assert g.schema["d"].dataType.simpleString() == "date"
    assert sorted(str(r.d) for r in g.collect()) == sorted(
        str(r.d) for r in dd.collect()
    )
    wh.create_or_replace("ud", dd, partition_by="m")
    locd = export_iceberg_v2(wh, "ud", str(tmp_path / "ice_d"))
    assert mod.validate(locd, deep=True) == []
    assert sorted(
        str(r.m) for r in read_iceberg_v2(spark, locd).collect()
    ) == sorted(str(r.m) for r in dd.collect())


def test_int64_above_2_53_no_float_collapse_skip(spark, tmp_path):
    """r14 probe cycle 8 finding, fixed + pinned: `_can_skip` (and
    `simple_conjuncts`) parsed numeric literals with float(), and stats /
    partition values were float()-ed for comparison — above 2^53 the
    collapse made strict < / > comparisons WRONGLY SKIP files holding
    matching rows (k < 2^53+1 skipped the file whose min was 2^53 —
    silent row loss on bigint keys). All numeric parsing is now exact
    (int when integral; Python's int-vs-float comparison is mathematically
    exact at any magnitude)."""
    base = 9007199254740992  # 2^53
    # unit-level: the exact probe cases
    f = {"partition": {}, "stats": {"k": [base, base]}}
    assert not Warehouse._can_skip(f, f"k < {base + 1}")
    assert Warehouse._can_skip(f, f"k < {base}")
    assert not Warehouse._can_skip(f, f"k = {base}")
    f2 = {"partition": {"k": str(base)}, "stats": {}}
    assert not Warehouse._can_skip(f2, f"k < {base + 1}")
    assert Warehouse._can_skip(f2, f"k > {base}")
    # int64 extremes stay exact
    f3 = {"partition": {}, "stats": {"k": [-(2**63), 2**63 - 1]}}
    assert not Warehouse._can_skip(f3, f"k = {2**63 - 1}")

    # end to end: a file-per-group table with 2^53-adjacent bigints; the
    # strict-< read must return the boundary row
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = spark.createDataFrame(
        [(1, base, "lo"), (2, base + 2, "hi")], "i int, k long, g string"
    )
    wh.create_or_replace("big", dd, partition_by="g")
    assert [
        r.i for r in wh.read("big", where=f"k < {base + 1}").collect()
    ] == [1]
    assert sorted(
        r.i for r in wh.read("big", where=f"k >= {base + 1}").collect()
    ) == [2]


def test_bucket_udf_exact_with_nulls_in_batch(spark, tmp_path):
    """r14 probe cycle 8 finding #2, fixed + pinned: the bucket transform
    used a pandas UDF, and Arrow→pandas turns a nullable int64 batch into
    float64 — an int source ≥ 2^53 sharing a batch with a NULL collapsed
    one ulp BEFORE hashing, routed to the wrong bucket, and equality
    reads silently returned nothing. The write path now uses an
    Arrow-OPTIMIZED udf (exact Python values). coalesce(1) forces the
    null into the same batch as the big value."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    IMIN, IMAX, V = -(2**63), 2**63 - 1, 9007199254740993
    dd = spark.createDataFrame(
        [(1, IMIN), (2, IMAX), (3, 0), (4, V), (5, None)], "i int, k long"
    ).coalesce(1)
    wh.create_or_replace("x", dd, partition_by="bucket(8, k)")
    assert [r.i for r in wh.read("x", where=f"k = {IMIN}").collect()] == [1]
    assert [r.i for r in wh.read("x", where=f"k = {IMAX}").collect()] == [2]
    assert [r.i for r in wh.read("x", where=f"k = {V}").collect()] == [4]
    assert wh.read("x", where=f"k = {V - 1}").count() == 0
    loc = export_iceberg_v2(wh, "x", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    assert [
        r.i for r in read_iceberg_v2(spark, loc, where=f"k = {V}").collect()
    ] == [4]
    assert [
        r.i
        for r in read_iceberg_v2(spark, loc, where="k IS NULL").collect()
    ] == [5]
    # timestamp source sharing a batch with NULL (datetime delivery path)
    ts = spark.sql(
        "SELECT 1 AS i, timestamp'2024-03-05 10:11:12.123456' AS t "
        "UNION ALL SELECT 2, NULL"
    ).coalesce(1)
    wh.create_or_replace("ts", ts, partition_by="bucket(4, t)")
    assert [
        r.i
        for r in wh.read(
            "ts", where="t = '2024-03-05 10:11:12.123456'"
        ).collect()
    ] == [1]


def test_sort_order_follows_rename_and_drop(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    so = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k int, s string, v double"
    )
    wh.create_or_replace("v", so, cluster_by=["s", "k"])
    wh.rename_column("v", "s", "s2")
    assert wh._load_meta("v").get("sort_order") == ["s2", "k"]
    loc = export_iceberg_v2(wh, "v", str(tmp_path / "ice"))
    m = _load_meta(loc)
    flds = m["sort-orders"][m["default-sort-order-id"]]["fields"]
    assert len(flds) == 2  # pre-fix: the renamed field silently dropped
    wh.drop_column("v", "s2")
    assert wh._load_meta("v").get("sort_order") == ["k"]
    loc2 = export_iceberg_v2(wh, "v", str(tmp_path / "ice2"))
    m2 = _load_meta(loc2)
    assert len(
        m2["sort-orders"][m2["default-sort-order-id"]]["fields"]
    ) == 1
