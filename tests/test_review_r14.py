"""Round-14 /code-review findings over the round diff, fixed + pinned.

1. Dropped-fid equality-delete resolution ignored data_shadow'd physical
   columns: identity-partitioned by cat -> evolve the spec off cat ->
   append (cat now stored as DATA; the reader shadow-renames it because
   the name is also a historical partition field) -> MoR equality delete
   on cat -> drop cat -> export. The delete silently missed the
   post-evolution rows; the resolver now falls back to the shadow column
   exactly like the typed projection.
2. __eqdrop aliases were listed in BOTH proj and the select's extras —
   Spark's lateral-column-alias fallback produced a duplicate column
   (df.select(lit(7).alias('x'), 'x').columns == ['x','x']); they now
   ride only proj and join extras after the select, for the final drop.
3. rename_column/drop_column performed the schema change and the
   spec/sort-order follow-up as separate CAS commits — a crash between
   them stranded the spec on the old name. Both now apply through
   _evolve's meta_extra hook INSIDE the single commit.
4. The decimal-stats crash fix was over-broad (dropped the stats
   entirely): decimal min/max are now recovered EXACTLY from the raw
   unscaled footer stats + schema scale, stored under a typed
   {"dec": str} marker, compared exactly in _can_skip (never float-
   rounded, never lexicographic), and exported as exact v2 decimal
   bounds.
"""
import decimal

from pyspark.sql import functions as F

from apache_iceberg_demo_spark.sources.iceberg_v2 import (
    _from_uri,
    bound_value,
    export_iceberg_v2,
    read_iceberg_v2,
    read_ocf,
)
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

from tests.test_iceberg_v2 import _load_meta, _load_validator


def test_dropped_fid_delete_reaches_shadowed_data_columns(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    S = "k int, cat string, v double"
    wh.create_or_replace(
        "sh", spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0)], S),
        partition_by="cat",
    )
    wh.evolve_partition_spec("sh", None)
    wh.append("sh", spark.createDataFrame([(3, "x", 3.0), (4, "z", 4.0)], S))
    wh.delete_where_mor("sh", "cat = 'x'")
    wh.drop_column("sh", "cat")
    assert sorted(r.k for r in wh.read("sh").collect()) == [2, 4]
    loc = export_iceberg_v2(wh, "sh", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    g = read_iceberg_v2(spark, loc)
    # pre-fix: k=3 (cat='x' stored as data in a post-evolution file)
    # silently survived the delete
    assert sorted(r.k for r in g.collect()) == [2, 4]
    # and no duplicate/synthetic columns leak out (finding 2)
    assert [c.lower() for c in g.columns] == ["k", "v"]
    assert len(g.columns) == len(set(g.columns))


def test_rename_spec_follow_is_one_commit(spark, tmp_path):
    """The schema rename, the spec-string follow, and the sort-order
    follow land in ONE commit — no intermediate metadata state exists
    where the schema is renamed but the spec/sort-order still bind the
    old name."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dt = spark.sql(
        "SELECT id AS k, timestamp'2024-03-05 10:00:00' + "
        "make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts, "
        "CAST(id AS DOUBLE) AS v FROM range(0, 6)"
    )
    wh.create_or_replace("r", dt, partition_by="days(ts)", cluster_by=["ts"])
    n_before = len(wh._load_meta("r")["snapshots"])
    wh.rename_column("r", "ts", "event_ts")
    meta = wh._load_meta("r")
    # exactly one new snapshot carries all three edits
    assert len(meta["snapshots"]) == n_before + 1
    assert meta["partition_spec"] == "days(event_ts)"
    assert meta["partition_by"] == "event_ts_days"
    assert meta.get("sort_order") == ["event_ts"]
    cur = wh._snapshot(meta, meta["current_snapshot_id"])
    assert cur["operation"] == "rename-column"
    # appends keep working against the renamed source
    wh.append("r", dt.withColumnRenamed("ts", "event_ts"))
    assert wh.read("r").count() == 12


def test_validator_flags_lying_data_file_bounds(spark, tmp_path):
    """r14 validator deepening: a data file's decoded lower/upper bounds
    must CONTAIN the footer's recomputed min/max (int/long/float/double/
    string/decimal; decimal recovered from raw unscaled stats). A bound
    that excludes a stored value makes conformant readers silently skip
    matching rows — the validator now catches a tampered (lying) bound."""
    from apache_iceberg_demo_spark.sources.avro_ocf import write_ocf
    from apache_iceberg_demo_spark.sources.iceberg_v2 import bound_bytes

    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = spark.sql(
        "SELECT id AS k, CAST(id * 1.25 AS DECIMAL(10,2)) AS m, "
        "CONCAT('s', id) AS s FROM range(0, 8)"
    )
    wh.create_or_replace("t", dd)
    loc = export_iceberg_v2(wh, "t", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []

    meta = _load_meta(loc)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, mfs = read_ocf(_from_uri(snap["manifest-list"]))
    dm = next(m for m in mfs if m.get("content", 0) == 0)
    mp = _from_uri(dm["manifest_path"])
    schema, hdr, entries = read_ocf(mp)
    fid_k = next(
        f["id"] for s in meta["schemas"] for f in s["fields"]
        if f["name"] == "k"
    )
    # lie: shrink k's upper bound below the stored max
    for e in entries:
        ub = e["data_file"].get("upper_bounds") or []
        for kv in ub:
            if kv["key"] == fid_k:
                kv["value"] = bound_bytes("long", 1)
    extra = {k: v for k, v in hdr.items() if not k.startswith("avro.")}
    write_ocf(mp, schema, entries, metadata=extra)
    bad = mod.validate(loc, deep=True)
    assert any(
        "do not contain footer min/max" in b and "fid " + str(fid_k) in b
        for b in bad
    ), bad


def test_decimal_stats_exact_skip_and_bounds(spark, tmp_path):
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dd = spark.sql(
        "SELECT id AS k, CAST(id * 1.25 - 1.25 AS DECIMAL(10,2)) AS m, "
        "CASE WHEN id < 3 THEN 'lo' ELSE 'hi' END AS g FROM range(0, 6)"
    )
    wh.create_or_replace("d", dd, partition_by="g")
    meta = wh._load_meta("d")
    snap = wh._snapshot(meta, meta["current_snapshot_id"])
    lo_f = next(f for f in snap["manifest"] if f["partition"]["g"] == "lo")
    hi_f = next(f for f in snap["manifest"] if f["partition"]["g"] == "hi")
    # typed marker, exact values (r14: pre-fix the whole WRITE crashed,
    # then the first fix dropped the stats entirely)
    assert lo_f["stats"]["m"] == [{"dec": "-1.25"}, {"dec": "1.25"}]
    assert hi_f["stats"]["m"] == [{"dec": "2.50"}, {"dec": "5.00"}]
    # exact skip in decimal space — boundaries respected both ways
    assert Warehouse._can_skip(lo_f, "m >= 4.00")
    assert not Warehouse._can_skip(hi_f, "m >= 4.00")
    assert not Warehouse._can_skip(lo_f, "m = 1.25")  # boundary kept
    assert Warehouse._can_skip(lo_f, "m = 2.50")  # 2.50 > lo's max
    assert not Warehouse._can_skip(hi_f, "m = '2.50'")  # quoted numeric
    assert not Warehouse._can_skip(hi_f, "m = 'junk'")  # never crash
    assert sorted(
        float(r.m) for r in wh.read("d", where="m >= 4.00").collect()
    ) == [5.0]

    # export carries EXACT decimal bounds the reader prunes with
    loc = export_iceberg_v2(wh, "d", str(tmp_path / "ice"))
    assert mod.validate(loc, deep=True) == []
    m2 = _load_meta(loc)
    cur = next(
        s for s in m2["snapshots"]
        if s["snapshot-id"] == m2["current-snapshot-id"]
    )
    fid_m = next(
        f["id"] for s in m2["schemas"] for f in s["fields"]
        if f["name"] == "m"
    )
    _, _, mfs = read_ocf(_from_uri(cur["manifest-list"]))
    bnds = []
    for mm in mfs:
        _, _, es = read_ocf(_from_uri(mm["manifest_path"]))
        for e in es:
            lo = {
                kv["key"]: kv["value"]
                for kv in e["data_file"].get("lower_bounds") or []
            }
            hi = {
                kv["key"]: kv["value"]
                for kv in e["data_file"].get("upper_bounds") or []
            }
            if fid_m in lo:
                bnds.append(
                    (
                        bound_value("decimal(10,2)", lo[fid_m]),
                        bound_value("decimal(10,2)", hi[fid_m]),
                    )
                )
    assert sorted(bnds, key=str) == [
        (decimal.Decimal("-1.25"), decimal.Decimal("1.25")),
        (decimal.Decimal("2.50"), decimal.Decimal("5.00")),
    ]
    assert sorted(
        float(r.m)
        for r in read_iceberg_v2(spark, loc, where="m >= 4.00").collect()
    ) == [5.0]
