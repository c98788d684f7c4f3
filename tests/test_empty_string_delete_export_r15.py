"""Round-15 probe (VERDICT r14 item 4): the ''/null unification through the
MERGE-ON-READ delete-file EXPORT path.

r14 unified '' with null in routing and manifest-summary pruning; the open
question was whether an equality-shaped ``delete_where_mor("tag = ''")``
stays consistent once it exports a v2 delete file whose key tuple contains
``''`` while identity-partitioned data reads back as null. Probed live
(round 15) and pinned here — the semantics hold with no code change:

- identity tables conflate '' to null AT WRITE (r14 design: the value
  lives only in the hive dir name, which cannot represent ''), so a
  ``tag = ''`` MoR delete is a consistent NO-OP on both the native read
  (NULL never equals '') and the exported equality-delete file (the spec
  says equality deletes never match NULL data values), while
  ``tag IS NULL`` — exported as a POSITION delete, it is not
  equality-shaped — drops every conflated row in both readers;
- truncate tables store the source column in the data files, so '' is
  exact: ``tag = ''`` drops exactly the ''-rows via the equality-delete
  file (its key tuple holds the real '') and ``tag IS NULL`` drops only
  true nulls, in the native read AND through export→``read_iceberg_v2``;
- equality deletes export GLOBALLY scoped (unpartitioned spec), so the
  ''-vs-null manifest-summary ambiguity can never prune a delete
  manifest;
- sequence-number semantics survive: a ''-row appended AFTER the delete
  outlives it in both readers, a multi-column key tuple containing ''
  deletes only its tuple, and ``apply_deletes`` materializes to the same
  final rows with a clean re-export.

Every export validates clean under the standalone spec validator's deep
mode.
"""
import os

from apache_iceberg_demo_spark.sources.iceberg_v2 import (
    export_iceberg_v2,
    read_iceberg_v2,
)
from apache_iceberg_demo_spark.sources.warehouse import Warehouse

from tests.test_iceberg_v2 import _load_validator

ROWS = [(1, ""), (2, None), (3, "xy"), (4, ""), (5, "x")]
SCHEMA = "k int, tag string"


def _show(df):
    return sorted([(r.k, r.tag) for r in df.collect()], key=str)


def _roundtrip(spark, tmp_path, tag, partition_by, predicate):
    """create → MoR-delete → (native rows, spec-read rows, validator)."""
    mod = _load_validator()
    wh = Warehouse(spark, str(tmp_path / f"wh_{tag}"))
    wh.create_or_replace(
        "t", spark.createDataFrame(ROWS, SCHEMA), partition_by=partition_by
    )
    wh.delete_where_mor("t", predicate)
    native = _show(wh.read("t"))
    loc = export_iceberg_v2(wh, "t", str(tmp_path / f"ice_{tag}"))
    issues = mod.validate(loc, deep=True)
    return native, _show(read_iceberg_v2(spark, loc)), issues


def test_identity_empty_string_equality_delete_is_consistent_noop(
    spark, tmp_path
):
    # identity write conflated '' to null, so the equality delete file's
    # '' key matches nothing — in OUR reader and per the spec's
    # "equality never matches NULL" rule in any conformant reader.
    native, specread, issues = _roundtrip(
        spark, tmp_path, "id_eq", "tag", "tag = ''"
    )
    expect = sorted(
        [(1, None), (2, None), (3, "xy"), (4, None), (5, "x")], key=str
    )
    assert native == expect
    assert specread == expect
    assert issues == []


def test_identity_is_null_position_delete_drops_conflated_rows(
    spark, tmp_path
):
    native, specread, issues = _roundtrip(
        spark, tmp_path, "id_null", "tag", "tag IS NULL"
    )
    expect = sorted([(3, "xy"), (5, "x")], key=str)
    assert native == expect
    assert specread == expect
    assert issues == []


def test_truncate_empty_string_equality_delete_drops_exact_rows(
    spark, tmp_path
):
    # source column stored in data: '' is exact, the equality-delete key
    # tuple carries the real '' and drops exactly the ''-rows.
    native, specread, issues = _roundtrip(
        spark, tmp_path, "tr_eq", "truncate(2, tag)", "tag = ''"
    )
    expect = sorted([(2, None), (3, "xy"), (5, "x")], key=str)
    assert native == expect
    assert specread == expect
    assert issues == []


def test_truncate_is_null_delete_spares_empty_string_rows(spark, tmp_path):
    native, specread, issues = _roundtrip(
        spark, tmp_path, "tr_null", "truncate(2, tag)", "tag IS NULL"
    )
    expect = sorted([(1, ""), (3, "xy"), (4, ""), (5, "x")], key=str)
    assert native == expect
    assert specread == expect
    assert issues == []


def test_empty_string_delete_sequence_semantics_through_export(
    spark, tmp_path
):
    """A ''-row appended AFTER the MoR delete survives it (spec
    sequence-number rule), a multi-column key tuple containing ''
    deletes only its own tuple, and apply_deletes materializes to the
    same rows with a clean re-export."""
    mod = _load_validator()

    # post-delete append survives, incl. under a pushed `tag = ''` read
    wh = Warehouse(spark, str(tmp_path / "wh_seq"))
    wh.create_or_replace(
        "t",
        spark.createDataFrame([(1, ""), (2, None), (3, "xy")], SCHEMA),
        partition_by="truncate(2, tag)",
    )
    wh.delete_where_mor("t", "tag = ''")
    wh.append("t", spark.createDataFrame([(9, "")], SCHEMA))
    expect = sorted([(2, None), (3, "xy"), (9, "")], key=str)
    assert _show(wh.read("t")) == expect
    loc = export_iceberg_v2(wh, "t", str(tmp_path / "ice_seq"))
    assert mod.validate(loc, deep=True) == []
    assert _show(read_iceberg_v2(spark, loc)) == expect
    assert _show(read_iceberg_v2(spark, loc, where="tag = ''")) == [(9, "")]

    # multi-column equality tuple containing ''
    wh2 = Warehouse(spark, str(tmp_path / "wh_tuple"))
    wh2.create_or_replace(
        "t",
        spark.createDataFrame(
            [(1, ""), (2, ""), (3, None), (4, "xy")], SCHEMA
        ),
        partition_by="truncate(2, tag)",
    )
    wh2.delete_where_mor("t", "tag = '' AND k = 1")
    expect2 = sorted([(2, ""), (3, None), (4, "xy")], key=str)
    assert _show(wh2.read("t")) == expect2
    loc2 = export_iceberg_v2(wh2, "t", str(tmp_path / "ice_tuple"))
    assert mod.validate(loc2, deep=True) == []
    assert _show(read_iceberg_v2(spark, loc2)) == expect2

    # apply_deletes materializes the same final rows; re-export clean
    wh3 = Warehouse(spark, str(tmp_path / "wh_apply"))
    wh3.create_or_replace(
        "t",
        spark.createDataFrame([(1, ""), (2, None), (3, "xy")], SCHEMA),
        partition_by="truncate(2, tag)",
    )
    wh3.delete_where_mor("t", "tag = ''")
    wh3.apply_deletes("t")
    expect3 = sorted([(2, None), (3, "xy")], key=str)
    assert _show(wh3.read("t")) == expect3
    loc3 = export_iceberg_v2(wh3, "t", str(tmp_path / "ice_apply"))
    assert mod.validate(loc3, deep=True) == []
    assert _show(read_iceberg_v2(spark, loc3)) == expect3
