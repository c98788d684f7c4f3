"""Iceberg-v2-spec metadata export + an independent spec-path reader.

The reference demo's load-bearing idea is ENGINE-NEUTRAL tables: Spark
writes an Iceberg table, DuckDB reads it via ``iceberg_scan``, Presto via
its connector (``/root/reference/README.md:52-53,78``). Our bespoke
warehouse (``warehouse.py``) reproduces Iceberg *semantics* in a private
JSON format; this module closes the interop gap by exporting any warehouse
table as a REAL Apache Iceberg v2 table per the public spec
(https://iceberg.apache.org/spec/):

- ``metadata/vN.metadata.json`` — format-version 2, table-uuid, schemas
  with stable field ids, partition-specs, sort-orders, snapshot log, refs;
  re-exports version the metadata (v2, v3, ...) with a metadata-log and an
  atomically-replaced version-hint, per HadoopTableOperations;
- one Avro manifest-list per snapshot (``snap-<id>-1-<uuid>.avro``) with
  the spec's ``manifest_file`` record (field-ids 500-519);
- one Avro manifest per snapshot with ``manifest_entry`` records
  (status / data sequence numbers / ``data_file`` with field-ids 100-143),
  including per-column lower/upper bounds in the spec's single-value
  binary serialization;
- ``version-hint.text`` for HadoopCatalog-style discovery.

Data files are NOT copied: manifests carry ``file://`` URIs pointing at
the warehouse's existing parquet, exactly how Iceberg decouples metadata
from data placement (the reference stores data on ``s3a://`` MinIO,
``scripts/csv_to_ice.py:6-13`` — same indirection, different scheme).

Why no end-to-end foreign-engine read: DuckDB 1.0 is present but its
``iceberg`` extension cannot be installed offline (verified:
``INSTALL iceberg`` fails with an extension-download IOException), and no
iceberg-spark-runtime jar ships with this container, and no pyiceberg
wheel is downloadable (re-verified r15: pip retries exhaust on
DNS resolution failure; the DuckDB extension download fails ERROR
Connection). Conformance is instead
proven one layer down on BOTH metadata layers: the Avro bytes are read
back by the JVM's REFERENCE Avro implementation (``avro-1.12.1.jar`` via
py4j), and the JSON layer is checked by a standalone spec validator
written from the public spec rules with no exporter imports
(``tools/validate_iceberg_metadata.py``) plus the spec-conformance tests
(tests/test_iceberg_v2.py).

``read_iceberg_v2`` is a deliberately independent reader: it resolves
version-hint → metadata.json → manifest list (Avro) → manifests (Avro) →
data-file URIs and partition tuples, never touching the warehouse's own
JSON metadata — the registered query ``a7_iceberg_v2_spec_scan`` proves a
table survives the spec-shaped round trip with a DuckDB value-hash oracle.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import re
import struct
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from apache_iceberg_demo_spark.registry import register
from apache_iceberg_demo_spark.sources.avro_ocf import read_ocf, write_ocf

# ---------------------------------------------------------------- errors


class CursorExpiredError(KeyError):
    """A change-feed cursor names a snapshot no longer in table metadata —
    ``expire_snapshots`` ran past it (or the id never existed; the two are
    indistinguishable once history is gone, and the recovery is the same).

    Recovery contract (keeps the feed at-least-once): call
    :func:`reset_change_feed` on the cursor path — the next
    :func:`iceberg_v2_change_feed` poll performs a full initial load of
    the table as of current, replaying rows the consumer may have seen
    but never skipping one. Consumers that tolerate a bounded gap may
    instead ``advance_change_feed(cursor_path, err.oldest_available)``
    and resume incrementally — rows appended between the expired cursor
    and ``oldest_available`` are then skipped (at-most-once across the
    expiry horizon), which is why reset-to-full-load is the default
    recommendation and this path is opt-in.

    Subclasses :class:`KeyError` so pre-r12 callers that caught the bare
    ``KeyError`` keep working.
    """

    def __init__(
        self, from_snapshot_id: int, oldest_available: "int | None"
    ) -> None:
        super().__init__(
            f"from_snapshot_id {from_snapshot_id} is not in table metadata "
            f"(expired or never existed); oldest available snapshot is "
            f"{oldest_available} — reset_change_feed() for a full-reload "
            f"resume, or advance_change_feed(cursor, {oldest_available}) "
            f"to accept the gap"
        )
        self.from_snapshot_id = int(from_snapshot_id)
        # None on degenerate metadata (empty table / null current-snapshot-
        # id): there is no resume point, reset_change_feed() is the only
        # recovery — keep the typed error typed instead of TypeError-ing.
        self.oldest_available = (
            None if oldest_available is None else int(oldest_available)
        )

    def __str__(self) -> str:  # KeyError.__str__ would repr() the message
        return self.args[0]


# ---------------------------------------------------------------- types

#: Spark simpleString → Iceberg primitive type (public spec, "Schemas and
#: Data Types"). Spark TimestampType is session-zoned UTC → timestamptz.
_SPARK_TO_ICEBERG = {
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "smallint": "int",
    "tinyint": "int",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _iceberg_type(simple: str) -> str:
    if simple in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[simple]
    if simple.startswith("decimal("):
        return "decimal" + simple[len("decimal"):]
    raise ValueError(f"no Iceberg mapping for Spark type {simple!r}")


def _iceberg_schema(schema_id: int, struct: StructType, fids: dict) -> dict:
    fields = []
    for f in struct.fields:
        if f.name not in fids:
            raise ValueError(f"column {f.name!r} has no stable field id")
        fields.append(
            {
                "id": int(fids[f.name]),
                "name": f.name,
                "required": False,
                "type": _iceberg_type(f.dataType.simpleString()),
            }
        )
    return {"type": "struct", "schema-id": schema_id, "fields": fields}


#: single-value binary serialization for bounds (spec "Binary single-value
#: serialization"): int = 4-byte little-endian, long = 8 LE, float/double =
#: IEEE LE, string = UTF-8, date = 4-byte LE days from epoch, boolean =
#: one byte 0x00/0x01, decimal(p,s) = minimal-length big-endian
#: two's-complement unscaled value. Timestamps stay unserialized (their
#: warehouse stats arrive as engine-formatted strings whose round-trip is
#: not bit-stable; absent bounds are spec-legal and never unsound).
_BOUND_PACK = {"int": "<i", "long": "<q", "float": "<f", "double": "<d"}

_EPOCH_DATE = datetime.date(1970, 1, 1)


def _decimal_scale(ice_type: str) -> int:
    return int(ice_type[len("decimal("):-1].split(",")[1].strip())


def bound_bytes(ice_type: str, value) -> Optional[bytes]:
    if ice_type == "string" and isinstance(value, str):
        return value.encode("utf-8")
    if ice_type == "date":
        # warehouse stats/partition values carry dates as ISO strings
        if isinstance(value, str):
            try:
                value = datetime.date.fromisoformat(value)
            except ValueError:
                return None
        if isinstance(value, datetime.datetime):
            return None
        if isinstance(value, datetime.date):
            return struct.pack("<i", (value - _EPOCH_DATE).days)
        if isinstance(value, int) and not isinstance(value, bool):
            return struct.pack("<i", value)  # already days-from-epoch
        return None
    if ice_type == "boolean":
        if isinstance(value, str):
            if value.lower() not in ("true", "false"):
                return None
            value = value.lower() == "true"
        if not isinstance(value, bool):
            return None
        return b"\x01" if value else b"\x00"
    if ice_type.startswith("decimal("):
        from apache_iceberg_demo_spark.sources.transforms import (
            min_signed_bytes,
        )

        if isinstance(value, dict):
            # warehouse decimal stats carry the typed {"dec": str} marker
            # (exact value recovered from raw unscaled footer stats)
            value = value.get("dec")
            if value is None:
                return None
        try:
            unscaled = decimal.Decimal(str(value)).scaleb(
                _decimal_scale(ice_type)
            )
        except decimal.InvalidOperation:
            return None
        if unscaled != int(unscaled):  # not exactly representable: no bound
            return None
        return min_signed_bytes(int(unscaled))
    fmt = _BOUND_PACK.get(ice_type)
    if fmt is None or isinstance(value, (str, bool)):
        return None
    try:
        return struct.pack(fmt, value)
    except (struct.error, TypeError):
        return None


def bound_value(ice_type: str, raw: bytes):
    """Decode a single-value-serialized bound. Dates come back as ISO
    strings — the engine stores and compares date stats in ISO-string
    space (lexicographic == chronological), so the decoded form plugs
    straight into ``Warehouse._can_skip``. Raises for types this exporter
    never serializes; prune/validator paths use :func:`try_bound_value`."""
    if ice_type == "string":
        return raw.decode("utf-8")
    if ice_type == "date":
        days = struct.unpack("<i", raw)[0]
        return (_EPOCH_DATE + datetime.timedelta(days=days)).isoformat()
    if ice_type == "boolean":
        return raw != b"\x00"
    if ice_type.startswith("decimal("):
        n = int.from_bytes(raw, "big", signed=True)
        return decimal.Decimal(n).scaleb(-_decimal_scale(ice_type))
    return struct.unpack(_BOUND_PACK[ice_type], raw)[0]


def try_bound_value(ice_type: str, raw: bytes):
    """`bound_value` that returns None for undecodable/foreign types
    instead of raising — an external table whose bounds use a
    serialization this reader doesn't know must lose the pruning
    opportunity, never abort the read (ADVICE r11)."""
    try:
        return bound_value(ice_type, raw)
    except (KeyError, struct.error, ValueError, IndexError):
        return None


def _simple_conjuncts(where: Optional[str]) -> list[tuple]:
    """Shared with the warehouse-native transform pruner — see
    ``transforms.simple_conjuncts``."""
    from apache_iceberg_demo_spark.sources.transforms import simple_conjuncts

    return simple_conjuncts(where)


def _decode_transformed_bound(result_type: str, raw: Optional[bytes]):
    """Decode a transformed-space bound for PRUNING comparisons: day
    bounds come back as int days (matching ``transforms.apply_py``), not
    the ISO string `bound_value` returns for identity date stats."""
    if raw is None:
        return None
    if result_type == "date":
        try:
            return struct.unpack("<i", raw)[0]
        except struct.error:
            return None
    return try_bound_value(result_type, raw)


def _transform_skip(
    spec_fields: list[dict],
    fields_by_id: dict[int, dict],
    conjuncts: list[tuple],
    range_of,
) -> bool:
    """True iff a NON-identity spec field's transformed value range is
    provably disjoint with a conjunct on its SOURCE column — the hidden-
    partitioning pruning step (manifest summaries and file entries share
    it via ``range_of(field, result_type) -> (lo, hi) | None``).
    Conservative: unknown transform / missing range / no matching
    conjunct → False."""
    from apache_iceberg_demo_spark.sources import transforms as _T

    if not conjuncts:
        return False
    for pf in spec_fields:
        tname = pf.get("transform", "identity")
        if tname == "identity":
            continue
        src = fields_by_id.get(pf["source-id"])
        if src is None:
            continue
        tr = _T.spec_name_to_transform(
            tname, source=src["name"], derived=pf["name"]
        )
        if tr is None:
            continue  # void/foreign transform: never prune
        rng = range_of(pf, tr.result_type(src["type"]))
        if rng is None:
            continue
        lo, hi = rng
        for col, op, lit in conjuncts:
            if col == src["name"] and _T.prune_disjoint(
                tr, op, lit, lo, hi, src["type"]
            ):
                return True
    return False


# ---------------------------------------------------------------- avro schemas


def _kv_map(
    name_prefix: str, key_id: int, val_id: int, fid: int, fname: str,
    value_type: str = "bytes",
) -> dict:
    """Iceberg's map-with-int-keys form: array<record{key,value}> with
    logicalType map (Avro maps require string keys). Bounds maps carry
    bytes values; the column-metric maps carry longs."""
    return {
        "name": fname,
        "type": [
            "null",
            {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": f"k{key_id}_v{val_id}",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": key_id},
                        {"name": "value", "type": value_type, "field-id": val_id},
                    ],
                },
                "logicalType": "map",
            },
        ],
        "default": None,
        "field-id": fid,
    }


#: spec "Manifest Lists": the manifest_file record, v2 field set.
MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean", "field-id": 509},
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "default": None,
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 511,
                            },
                        ],
                    },
                    "element-id": 508,
                },
            ],
            "default": None,
            "field-id": 507,
        },
        {
            "name": "key_metadata",
            "type": ["null", "bytes"],
            "default": None,
            "field-id": 519,
        },
    ],
}


def _manifest_entry_schema(partition_fields: list[dict]) -> dict:
    """spec "Manifests": manifest_entry with the v2 data_file record. The
    ``partition`` struct (field-id 102) is spec-specific — built from the
    table's partition fields (ids 1000+)."""
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": partition_fields,
                            },
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        _kv_map("colsz", 117, 118, 108, "column_sizes", "long"),
                        _kv_map("valct", 119, 120, 109, "value_counts", "long"),
                        _kv_map(
                            "nullct", 121, 122, 110, "null_value_counts", "long"
                        ),
                        {
                            "name": "split_offsets",
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "items": "long",
                                    "element-id": 133,
                                },
                            ],
                            "default": None,
                            "field-id": 132,
                        },
                        _kv_map("lower", 126, 127, 125, "lower_bounds"),
                        _kv_map("upper", 129, 130, 128, "upper_bounds"),
                        {
                            "name": "equality_ids",
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "items": "int",
                                    "element-id": 136,
                                },
                            ],
                            "default": None,
                            "field-id": 135,
                        },
                    ],
                },
            },
        ],
    }


#: Avro branch type for a partition value, by Iceberg source-column type.
_PARTITION_AVRO = {"int": "int", "long": "long", "string": "string", "double": "double"}


def _typed_partition_value(ice_type: str, raw: str):
    """Hive-dir partition string → typed value per the source column."""
    if raw is None:
        return None
    if ice_type in ("int", "long"):
        return int(raw)
    if ice_type == "double":
        return float(raw)
    return raw


#: equality-delete predicate forms the export can express as spec delete
#: files: a conjunction of ``col = lit`` / ``col IN (l1, l2)`` terms
_EQ_RE = re.compile(r"^\s*([A-Za-z_]\w*)\s*==?\s*(.+?)\s*$", re.DOTALL)
_IN_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s+in\s*\((.+)\)\s*$", re.IGNORECASE | re.DOTALL
)

#: sentinel: "this text is not a single literal"
_NOT_A_LITERAL = object()


def _parse_literal(text: str):
    """One SQL literal, strictly: a fully quoted string (Spark's doubled
    ``''`` escape unescaped) or a number. Anything else — including a
    quoted span with trailing text like ``'x' OR name = 'y'``, embedded
    un-doubled quotes, or backslash escapes — is rejected so a compound
    predicate can never masquerade as an equality value (it would export a
    delete file that deletes nothing and silently resurrect rows)."""
    text = text.strip()
    if len(text) >= 2 and text[0] in "'\"":
        q = text[0]
        if text[-1] != q:
            return _NOT_A_LITERAL
        # doubled-quote escapes only; any leftover quote char means the
        # closing quote we matched was interior (compound predicate)
        inner = text[1:-1].replace(q * 2, "\x00")
        if q in inner or "\\" in inner or "\x00" in text[1:-1].replace(q * 2, ""):
            return _NOT_A_LITERAL
        return inner.replace("\x00", q)
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return _NOT_A_LITERAL


def _split_outside_quotes(pred: str, sep_word: Optional[str]):
    """Split ``pred`` on top-level ``AND`` (word match, outside quotes and
    parens) or on commas (``sep_word=None``). Returns None on unterminated
    quotes."""
    parts, buf, depth, i, n = [], [], 0, 0, len(pred)
    while i < n:
        c = pred[i]
        if c in "'\"":
            j = i + 1
            while j < n:
                if pred[j] == c:
                    if j + 1 < n and pred[j + 1] == c:  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            else:
                return None  # unterminated string
            buf.append(pred[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0:
            if sep_word is None and c == ",":
                parts.append("".join(buf))
                buf = []
                i += 1
                continue
            if (
                sep_word is not None
                and pred[i : i + len(sep_word)].upper() == sep_word
                and (i == 0 or not (pred[i - 1].isalnum() or pred[i - 1] == "_"))
                and (
                    i + len(sep_word) >= n
                    or not (
                        pred[i + len(sep_word)].isalnum()
                        or pred[i + len(sep_word)] == "_"
                    )
                )
            ):
                parts.append("".join(buf))
                buf = []
                i += len(sep_word)
                continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _null_conjuncts(where: Optional[str]) -> list[tuple[str, bool]]:
    """Top-level ``col IS [NOT] NULL`` conjuncts of ``where`` as
    (column, is_not_null) pairs — the metric-pruning hooks."""
    out: list[tuple[str, bool]] = []
    if where is not None:
        for conj in _split_outside_quotes(where, "AND") or []:
            m = re.match(
                r"^\s*([A-Za-z_]\w*)\s+IS\s+(NOT\s+)?NULL\s*$", conj, re.I
            )
            if m:
                out.append((m.group(1), bool(m.group(2))))
    return out


def _parse_equality_predicate(pred: str):
    """Conjunction of ``col = lit`` / ``col IN (l1, l2)`` terms →
    ``(cols, rows)``: the ordered equality columns and the deleted key
    tuples (cartesian product across terms, matching AND-of-IN semantics).
    None if the predicate isn't equality-shaped — OR anywhere, a repeated
    column, comparison operators, or any literal the strict parser rejects
    (caller falls back to a POSITION-delete file or apply_deletes)."""
    terms = _split_outside_quotes(pred, "AND")
    if terms is None:
        return None
    cols: list[str] = []
    val_lists: list[list] = []
    for term in terms:
        term = term.strip()
        # a parenthesized term: unwrap one level ( (a = 1) AND b = 2 )
        while term.startswith("(") and term.endswith(")"):
            inner = term[1:-1].strip()
            if _split_outside_quotes(inner, "AND") is None:
                break
            term = inner
        m = _IN_RE.match(term)
        if m:
            col, lit_texts = m.group(1), _split_outside_quotes(m.group(2), None)
            if lit_texts is None:
                return None
        else:
            m = _EQ_RE.match(term)
            if not m:
                return None
            col, lit_texts = m.group(1), [m.group(2)]
        vals = []
        for lt in lit_texts:
            v = _parse_literal(lt)
            if v is _NOT_A_LITERAL:
                return None
            vals.append(v)
        if col in cols or not vals:
            return None  # col = 1 AND col = 2 → contradiction, not a tuple
        cols.append(col)
        val_lists.append(vals)
    if not cols:
        return None
    rows: list[tuple] = [()]
    for vals in val_lists:
        rows = [r + (v,) for r in rows for v in vals]
    return cols, rows


_PA_TYPE = {"int": "int32", "long": "int64", "string": "string", "double": "float64"}

#: spec "Position Delete Files": reserved field ids for the delete schema
_POS_DELETE_PATH_FID = 2147483546
_POS_DELETE_POS_FID = 2147483545


def _write_equality_delete_file(
    mdir: str, cols: list[str], ice_types: list[str], fids: list[int],
    rows: list[tuple]
) -> Optional[str]:
    """Materialize an equality-delete parquet (spec: a delete file holds
    the equality columns' values; rows matching any value tuple are
    deleted). Multi-column tuples = AND-of-equality semantics. Columns
    carry their Iceberg field ids as parquet field-id metadata (the delete
    files are OURS to write, unlike the migrated data files that need the
    name-mapping)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    caster = {"int32": int, "int64": int, "string": str, "float64": float}
    fields, arrays = [], []
    for i, (col, t, fid) in enumerate(zip(cols, ice_types, fids)):
        pa_name = _PA_TYPE.get(t)
        if pa_name is None:
            return None
        fields.append(
            pa.field(
                col,
                getattr(pa, pa_name)(),
                metadata={b"PARQUET:field_id": str(fid).encode()},
            )
        )
        arrays.append(
            pa.array(
                [caster[pa_name](r[i]) for r in rows], getattr(pa, pa_name)()
            )
        )
    path = os.path.join(mdir, f"eq-delete-{uuid.uuid4().hex}.parquet")
    pq.write_table(pa.Table.from_arrays(arrays, schema=pa.schema(fields)), path)
    return path


def _write_positional_delete_file(wh, name: str, mdir: str, dp: dict):
    """Materialize a POSITION delete parquet (spec: ``file_path`` +
    ``pos``, reserved field ids 2147483546/2147483545, sorted by path then
    position) for a non-equality-shaped MoR predicate.

    Positions come from scanning exactly the predicate's scoped data files
    with ``_metadata.row_index`` (the parquet row ordinal — Iceberg's
    ``pos``) and evaluating the predicate distributed; only the MATCHING
    (file, pos) pairs ever reach the driver. That is predicate-match-sized
    — the same bound real Iceberg writers accept before compacting delete
    files; a predicate matching a large fraction of the table should be
    ``apply_deletes``-materialized instead, exactly as before.

    Known limitation (loud, never silent): a non-equality predicate
    recorded AFTER a column rename, scoped to files that physically carry
    the OLD spelling, raises AnalysisException here (each scoped vintage
    is scanned separately, so the missing column never NULL-coalesces) —
    run ``apply_deletes()`` first in that lineage.

    Returns ``(path, row_count)``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = wh.spark
    data_root = os.path.join(wh._table_dir(name), "data")
    groups: dict[str, list[str]] = {}
    for rel in dp["files"]:
        p = wh._abs_path(name, rel)
        tag = os.path.relpath(p, data_root).split(os.sep)[0]
        groups.setdefault(os.path.join(data_root, tag), []).append(p)
    pairs: list[tuple[str, int]] = []
    for base, ps in groups.items():
        # basePath surfaces hive partition columns the predicate may use
        df = (
            spark.read.option("basePath", base)
            .option("mergeSchema", "true")
            .parquet(*ps)
        )
        hits = (
            df.filter(F.coalesce(F.expr(dp["predicate"]), F.lit(False)))
            .select(
                F.col("_metadata.file_path").alias("fp"),
                F.col("_metadata.row_index").alias("pos"),
            )
            .collect()
        )
        pairs.extend(
            # decode java.net.URI escapes so the stored file_path is the
            # spec-exact raw form matching the manifest's data_file.file_path
            # (the reader re-quotes ONCE when joining against __file)
            (
                "file://"
                + _uri_path_unquote(re.sub("^file:/+", "/", r["fp"])),
                int(r["pos"]),
            )
            for r in hits
        )
    pairs.sort()
    schema = pa.schema(
        [
            pa.field(
                "file_path",
                pa.string(),
                metadata={b"PARQUET:field_id": str(_POS_DELETE_PATH_FID).encode()},
            ),
            pa.field(
                "pos",
                pa.int64(),
                metadata={b"PARQUET:field_id": str(_POS_DELETE_POS_FID).encode()},
            ),
        ]
    )
    path = os.path.join(mdir, f"pos-delete-{uuid.uuid4().hex}.parquet")
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array([p for p, _ in pairs], pa.string()),
                pa.array([x for _, x in pairs], pa.int64()),
            ],
            schema=schema,
        ),
        path,
    )
    return path, len(pairs)


def _footer_metrics(
    path: str,
) -> tuple[dict[str, tuple[int, int, Optional[int]]], list[int]]:
    """Per-column (compressed_size, value_count, null_count-or-None) from
    the parquet footer — the source for the spec's column_sizes /
    value_counts / null_value_counts data-file metrics (fids 108/109/110).
    Name-keyed so each snapshot binds its OWN field-id mapping (a renamed
    column's old files carry the old spelling). Flat columns only — the
    warehouse's tables are relational; nested paths are skipped. Parquet's
    per-chunk num_values includes nulls, exactly Iceberg's value_counts
    semantics; a row group without statistics makes the file's null count
    unknown (None → omitted from the map, the metrics are optional
    per-column). Also returns the spec's split_offsets (fid 132): each
    row group's starting byte position — the first column chunk's
    dictionary-page offset when present, else its data-page offset,
    exactly Java Iceberg's ParquetUtil.getSplitOffsets."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    agg: dict[str, list] = {}
    offsets: list[int] = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        if g.num_columns:
            c0 = g.column(0)
            off = c0.dictionary_page_offset
            offsets.append(
                int(off if off is not None else c0.data_page_offset)
            )
        for ci in range(g.num_columns):
            c = g.column(ci)
            nm = c.path_in_schema
            if "." in nm:
                continue
            st = c.statistics
            nn = (
                st.null_count
                if st is not None and st.null_count is not None
                else None
            )
            sz, nv, prev_nn = agg.get(nm, (0, 0, 0))
            agg[nm] = [
                sz + c.total_compressed_size,
                nv + c.num_values,
                None if (nn is None or prev_nn is None) else prev_nn + nn,
            ]
    return {k: tuple(v) for k, v in agg.items()}, sorted(offsets)


def _partition_summaries(entries: list[dict], pkey: tuple) -> Optional[list]:
    """spec "Manifest Lists" field summaries for one manifest's entries:
    exact contains_null plus single-value-serialized bounds per partition
    field, in spec-field order."""
    if not pkey:
        return None
    out = []
    for c, t in pkey:
        pvals = [e["data_file"]["partition"].get(c) for e in entries]
        nn = [v for v in pvals if v is not None]
        out.append(
            {
                "contains_null": any(v is None for v in pvals),
                "contains_nan": None,
                "lower_bound": bound_bytes(t, min(nn)) if nn else None,
                "upper_bound": bound_bytes(t, max(nn)) if nn else None,
            }
        )
    return out


#: RFC 3986 path characters java.net.URI leaves unescaped: unreserved +
#: sub-delims + ``:@/``. NON-ASCII is also left RAW (URI.toString quotes
#: only in toASCIIString — measured: a ``café`` dir renders unencoded in
#: ``_metadata.file_path`` while a space renders ``%20``).
_URI_PATH_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~!$&'()*+,;=:@/"
)


def _uri_path_quote(path: str) -> str:
    """Percent-encode a filesystem path the way ``java.net.URI`` renders
    it — the form Spark's ``_metadata.file_path`` exposes. A partition
    VALUE containing a space (or any URI-illegal ASCII char) puts that
    char in the hive dir name on disk, but the scan metadata shows
    ``%20`` — joining manifest paths against ``_metadata.file_path``
    without this normalization silently DROPS every row of such files
    (round-13 probe: the '4-NOT SPECIFIED' partition vanished)."""
    return "".join(
        ch
        if ord(ch) > 127 or ch in _URI_PATH_SAFE
        else "".join(f"%{b:02X}" for b in ch.encode("utf-8"))
        for ch in path
    )


def _uri_path_unquote(path: str) -> str:
    """Inverse of :func:`_uri_path_quote`: collapse ``%XX`` escapes back to
    the raw filesystem path. ``_metadata.file_path`` is java.net.URI-quoted
    (space → ``%20``, and an on-disk ``%`` always arrives as ``%25``), so a
    single decode yields the true on-disk path — including hive-escaped dir
    names, whose literal ``%`` round-trips through ``%25``. Position-delete
    files must store THIS form: the spec requires their ``file_path`` to be
    an exact string match of the manifest's raw ``data_file.file_path``
    (r13 stored the quoted form verbatim and the reader quoted again —
    %2520 — silently skipping deletes on special-char partition paths)."""
    from urllib.parse import unquote

    return unquote(path, errors="strict")


def _to_uri(path: str) -> str:
    return path if "://" in path else "file://" + os.path.abspath(path)


def _from_uri(uri: str) -> str:
    """file: URI → plain path. Tolerates both RFC-form ``file:///p`` and
    Hadoop Path's ``file:/p`` single-slash rendering."""
    if uri.startswith("file:"):
        return "/" + uri[len("file:"):].lstrip("/")
    return uri


# ---------------------------------------------------------------- export


def export_iceberg_v2(wh, name: str, location: Optional[str] = None) -> str:
    """Export a warehouse table's current-snapshot ancestry as an Iceberg v2
    table; returns the new table location (containing ``metadata/``).

    Data files are referenced in place by URI — metadata-only, no data
    copy/move (like Iceberg's own register_table). UNAPPLIED merge-on-read
    delete predicates export as v2 EQUALITY DELETE files when they are
    equality-shaped (a conjunction of ``col = lit`` / ``col IN (...)``
    terms — multi-column tuples carry the full ``equality_ids`` list): a
    tiny parquet of the deleted key tuples plus a content=1 delete manifest
    whose entry carries ``equality_ids`` and the deleting snapshot's
    sequence number — the spec's strictly-less sequence rule then scopes it
    to exactly the files our file-path-scoped entry covered (both equal
    "files live at delete time"). Any OTHER predicate exports as a v2
    POSITION DELETE file (``file_path`` + ``pos``, reserved field ids),
    computed by scanning the predicate's scoped files with
    ``_metadata.row_index`` — so the export is faithful for every
    warehouse state and never refuses or truncates history on MoR grounds.
    """
    from apache_iceberg_demo_spark.io import scratch_dir
    from apache_iceberg_demo_spark.sources import transforms as _T

    meta = wh._load_meta(name)
    # hidden partitioning (spec "Partition Transforms"): a table created
    # with days(ts)/bucket(n,c)/truncate(w,c)/months|years|hours(ts) has a
    # WRITER-DERIVED partition column that is NOT part of the user schema.
    # The export drops it from the exported schemas, declares the spec
    # field with the real transform (source-id = the SOURCE column's fid),
    # and writes manifest partition values in the transform's RESULT type
    # (day → int days since epoch, month/year/hour/bucket → int,
    # truncate → source type). If the spec string names a transform whose
    # derived column a historical snapshot doesn't carry (pre-evolution
    # plain-column specs), those historical fields export identity as
    # before — only the current transform's derived column is hidden.
    # derived column name -> Transform, one entry per NON-identity spec
    # term (multi-field specs — days(ts), bucket(16, key) — carry several)
    trs: dict[str, _T.Transform] = {}
    _spec_str = meta.get("partition_spec")
    if _spec_str and "(" in str(_spec_str):
        trs = {
            t.derived: t
            for t in _T.parse_spec_list(_spec_str)
            if t.kind != "identity"
        }
    # defense in depth behind Warehouse._check_spec_compat: historical
    # files laid out under a DIFFERENT transform for the same derived
    # name (bucket/truncate width change) would export with wrong-space
    # partition values that a conformant reader prunes incorrectly —
    # refuse rather than emit silently-lossy metadata
    for h in meta.get("spec_history", []):
        hs = h.get("spec")
        if not hs:
            continue
        try:
            hist_terms = _T.parse_spec_list(hs)
        except ValueError:
            continue
        for t in hist_terms:
            cur = trs.get(t.derived)
            if cur is not None and cur.spec_name != t.spec_name:
                raise ValueError(
                    f"table {name!r}: derived column {t.derived!r} was "
                    f"written under {t.spec_name} historically but the "
                    f"current spec declares {cur.spec_name}; exporting "
                    f"would mislabel old files' partition values — "
                    f"replace into a new table name to migrate"
                )
    by_id = {s["snapshot_id"]: s for s in meta["snapshots"]}
    # ancestry of current, oldest first
    chain: list[dict] = []
    sid: Optional[int] = meta["current_snapshot_id"]
    while sid is not None and sid in by_id:
        # an expired parent simply truncates the exported history, exactly
        # as expire_snapshots truncates Iceberg's own snapshot log
        snap = by_id[sid]
        chain.append(snap)
        sid = snap.get("parent_id")
    chain.reverse()
    # Foreign Iceberg readers bind parquet columns by the field-id metadata
    # the Iceberg WRITER embeds — our parquet was written by plain Spark and
    # has none. The spec's answer for exactly this case (files migrated
    # from a non-Iceberg writer) is the `schema.name-mapping.default` table
    # property: per field id, the list of physical names that may carry it.
    # Collect every name each fid ever had across the lineage (renames move
    # the name, keep the fid — warehouse.rename_column) so old files'
    # spellings resolve. One case stays refused: a name bound to two
    # DIFFERENT fids (drop-then-re-add) — name-based resolution would
    # resurrect dropped values; rewrite_data_files() materializes current
    # names and clears it.
    seen_fids: dict[str, int] = {}
    names_by_fid: dict[int, list[str]] = {}

    def _record(col: str, fid: int) -> None:
        if col in trs:
            return  # hidden partition column: not a schema/mapping column
        if seen_fids.setdefault(col, fid) != fid:
            raise ValueError(
                f"table {name!r}: column {col!r} was dropped and "
                "re-added (two field ids in lineage); name-binding "
                "export would resurrect dropped values — run "
                "rewrite_data_files() first"
            )
        names = names_by_fid.setdefault(fid, [])
        if col not in names:
            names.append(col)

    for snap in meta["snapshots"]:
        fids_snap = snap.get("fids") or {}
        for col, fid in fids_snap.items():
            _record(col, int(fid))
        for logical, physical in (snap.get("field_map") or {}).items():
            if logical in fids_snap:
                _record(physical, int(fids_snap[logical]))

    # Every MoR predicate now has a spec-shaped delete-file form:
    # equality-shaped conjunctions (single- or multi-column, = / IN)
    # export as EQUALITY delete files; anything else exports as a
    # POSITION delete file computed from the scoped data files — so no
    # predicate forces a refusal or history truncation anymore.

    # named refs (Iceberg branches advance, tags pin). Each exported ref
    # needs its head's ancestry in the snapshot list; a ref whose head
    # expired is OMITTED from the export rather than exported wrong —
    # main-chain content is never affected.
    main_ids = {s["snapshot_id"] for s in chain}
    extra_snaps: dict[int, dict] = {}
    refs_json: dict[str, dict] = {}

    def _try_add_ref(refname: str, head: int, ref_type: str) -> None:
        if refname == "main":
            return
        walk, sid2 = [], head
        while sid2 is not None and sid2 in by_id:
            if sid2 in main_ids or sid2 in extra_snaps:
                break  # joins an already-exported line
            walk.append(by_id[sid2])
            sid2 = by_id[sid2].get("parent_id")
        if head not in by_id:
            return  # expired head
        for sn in walk:
            extra_snaps[sn["snapshot_id"]] = sn
        refs_json[refname] = {"snapshot-id": int(head), "type": ref_type}

    for refname, head in (meta.get("branches") or {}).items():
        _try_add_ref(refname, head, "branch")
    for refname, head in (meta.get("refs") or {}).items():
        _try_add_ref(refname, head, "tag")
    # global commit order: snapshot ids are allocated max+1 across ALL
    # lines (warehouse._next_snap_id), so id order = commit order and
    # every child sorts after its parent on any branch
    all_snaps = sorted(
        list(chain) + list(extra_snaps.values()),
        key=lambda sn: sn["snapshot_id"],
    )

    if location is None:
        location = scratch_dir(f"iceberg_{name}_", unique=True)
    mdir = os.path.join(_from_uri(location), "metadata")
    os.makedirs(mdir, exist_ok=True)
    # metadata versioning (HadoopTableOperations): re-exporting an evolved
    # table writes v{N+1}.metadata.json, carries the prior versions in
    # metadata-log, and bumps version-hint.text last (readers resolving the
    # hint never see a half-written version)
    hint = os.path.join(mdir, "version-hint.text")
    prev_version, metadata_log = 0, []
    if os.path.exists(hint):
        with open(hint) as f:
            prev_version = int(f.read().strip())
        with open(os.path.join(mdir, f"v{prev_version}.metadata.json")) as f:
            prev_meta = json.load(f)
        metadata_log = list(prev_meta.get("metadata-log", []))
        metadata_log.append(
            {
                "timestamp-ms": int(prev_meta["last-updated-ms"]),
                "metadata-file": _to_uri(
                    os.path.join(mdir, f"v{prev_version}.metadata.json")
                ),
            }
        )
    version = prev_version + 1

    # schemas: unique per snapshot lineage, interned in first-seen order
    schemas: list[dict] = []
    schema_ids: dict[str, int] = {}
    # partition specs: unique partition-column tuples, interned likewise.
    # Partition FIELD ids are allocated from ONE monotonically increasing
    # counter across all specs (Java Iceberg's lastAssignedPartitionId) —
    # the spec requires them unique table-wide, not per-spec, or a
    # spec-evolved table's manifests would alias two different fields.
    specs: list[dict] = []
    spec_ids: dict[tuple, int] = {}
    spec_field_ids: dict[tuple, list[int]] = {}
    last_pfid = 999  # Java: PARTITION_DATA_ID_START - 1 when unpartitioned
    #: abs data-file path -> name-keyed footer metrics (a file re-listed by
    #: later snapshots reads its footer once per export)
    footer_cache: dict[str, dict] = {}
    # fast-append manifest chain (Iceberg's actual commit shape): each
    # snapshot re-lists its parent's data manifests UNCHANGED, writes ONE
    # new manifest for the files it added, and filter-rewrites only the
    # manifests whose files it removed — per-commit metadata cost is
    # O(added files), not O(total files), which is what keeps commits
    # cheap when a 100 TB table carries millions of files
    minfo: dict[str, dict] = {}  # manifest path -> {entry, files, pkey}
    data_mfs_by_sid: dict[int, list[str]] = {}  # snapshot id -> paths
    snap_spec_id: dict[int, int] = {}
    #: (predicate, file-scope) -> written delete-manifest info; a predicate
    #: first seen at sequence d keeps that sequence in every later
    #: snapshot's manifest list (inheritance = re-listing the same manifest)
    delete_artifacts: dict[tuple, dict] = {}
    snapshots_json: list[dict] = []
    snapshot_log: list[dict] = []

    sid_info: dict[int, dict] = {}
    for seq, snap in enumerate(all_snaps, start=1):
        struct = StructType.fromJson(json.loads(snap["schema"]))
        if trs:
            # derived partition columns are hidden: not in the exported
            # schema (they are not stored in the data files either —
            # partitionBy drops them at write)
            struct = StructType(
                [f for f in struct.fields if f.name not in trs]
            )
        fids = dict(snap.get("fids") or meta.get("fids") or {})
        skey = json.dumps(
            [(f.name, f.dataType.simpleString()) for f in struct.fields]
        )
        if skey not in schema_ids:
            schema_ids[skey] = len(schemas)
            schemas.append(_iceberg_schema(len(schemas), struct, fids))
        schema_id = schema_ids[skey]
        ice_types = {
            f["name"]: f["type"] for f in schemas[schema_id]["fields"]
        }

        # parent delta in file-URI space: what THIS snapshot added/removed
        # relative to its exported parent (an expired parent truncates the
        # chain, so the first exported snapshot "adds" everything it lists)
        uri_of = {
            f["path"]: _to_uri(wh._abs_path(name, f["path"]))
            for f in snap["manifest"]
        }
        cur_uris = set(uri_of.values())
        parent_sid = snap.get("parent_id")
        parent_mpaths = data_mfs_by_sid.get(parent_sid, [])
        parent_uris: set[str] = set()
        for p in parent_mpaths:
            parent_uris |= minfo[p]["files"]
        added = [
            f for f in snap["manifest"] if uri_of[f["path"]] not in parent_uris
        ]
        removed_uris = parent_uris - cur_uris

        # partition spec for the files THIS snapshot writes; a no-add
        # snapshot inherits its parent's spec id (never re-derive from the
        # full file set — that would alias a delete-only commit on a
        # partitioned table to the unpartitioned spec)
        if added or parent_sid not in snap_spec_id:
            pcols = sorted(
                {k for f in (added or snap["manifest"]) for k in f["partition"]}
            )

            def _ptype(c: str) -> str:
                # a transformed field's manifest values live in the
                # transform's RESULT type, not the source type
                t = trs.get(c)
                if t is not None:
                    return t.result_type(ice_types.get(t.source, "string"))
                return ice_types.get(c, "string")

            pkey = tuple((c, _ptype(c)) for c in pcols)
            if pkey not in spec_ids:
                spec_ids[pkey] = len(specs)
                # a field already present in an EARLIER spec (same name,
                # transform, source-id) keeps its partition field id —
                # Java Iceberg's PartitionSpec builder behavior; fresh
                # ids only for genuinely new fields, so the same column
                # never aliases under two ids across evolved specs
                existing = {
                    (f["name"], f["transform"], f["source-id"]): f["field-id"]
                    for s in specs
                    for f in s["fields"]
                }
                sfields, assigned = [], []
                for c in pcols:
                    t = trs.get(c)
                    if t is not None:
                        if t.source not in fids:
                            raise ValueError(
                                f"transform source column {t.source!r} "
                                f"has no field id in table {name!r}"
                            )
                        fkey = (c, t.spec_name, int(fids[t.source]))
                    else:
                        fkey = (c, "identity", int(fids[c]))
                    pfid = existing.get(fkey)
                    if pfid is None:
                        last_pfid += 1
                        pfid = last_pfid
                    assigned.append(pfid)
                    sfields.append(
                        {
                            "name": fkey[0],
                            "transform": fkey[1],
                            "source-id": fkey[2],
                            "field-id": pfid,
                        }
                    )
                spec_field_ids[pkey] = assigned
                specs.append({"spec-id": len(specs), "fields": sfields})
            spec_id = spec_ids[pkey]
        else:
            spec_id = snap_spec_id[parent_sid]
            pkey = ()
        snap_spec_id[int(snap["snapshot_id"])] = spec_id

        mlist_records = []
        this_sid_mpaths: list[str] = []
        removed_rows = 0
        # inherit the parent's manifests: unchanged re-list when no file
        # was removed from them, filter-rewrite (survivors as EXISTING
        # with their original sequence numbers) when some were
        for pm in parent_mpaths:
            info = minfo[pm]
            if not info["files"]:
                # an all-DELETED manifest was listed once by the snapshot
                # that emptied it (for incremental consumers); drop it from
                # every later list, as Iceberg's next commit does
                continue
            hit = info["files"] & removed_uris
            if not hit:
                mlist_records.append(info["entry"])
                this_sid_mpaths.append(pm)
                continue
            survivors = info["files"] - hit
            p_schema, p_hdr, p_entries = read_ocf(pm)
            keep, dead = [], []
            for e in p_entries:
                fp = e["data_file"]["file_path"]
                if fp in survivors:
                    e["status"] = 0  # EXISTING; entry seqs stay original
                    keep.append(e)
                elif fp in hit:
                    # spec: the REMOVING snapshot records the file as a
                    # DELETED entry (incremental/CDC consumers read these);
                    # the entry is dropped at the manifest's next rewrite
                    e["status"] = 2
                    e["snapshot_id"] = int(snap["snapshot_id"])
                    dead.append(e)
                # else: a status-2 entry from an EARLIER rewrite — drop
            dead_rows = sum(int(e["data_file"]["record_count"]) for e in dead)
            removed_rows += dead_rows
            rw_path = os.path.join(mdir, f"{uuid.uuid4().hex}-m0.avro")
            rw_len = write_ocf(
                rw_path,
                p_schema,
                keep + dead,
                metadata={
                    k: v for k, v in p_hdr.items()
                    if not k.startswith("avro.")
                },
            )
            entry = dict(info["entry"])
            entry.update(
                {
                    "manifest_path": _to_uri(rw_path),
                    "manifest_length": rw_len,
                    "sequence_number": seq,
                    "min_sequence_number": min(
                        e["sequence_number"] for e in keep + dead
                    ),
                    "added_snapshot_id": int(snap["snapshot_id"]),
                    "added_files_count": 0,
                    "added_rows_count": 0,
                    "existing_files_count": len(keep),
                    "existing_rows_count": sum(
                        int(e["data_file"]["record_count"]) for e in keep
                    ),
                    "deleted_files_count": len(dead),
                    "deleted_rows_count": dead_rows,
                    "partitions": _partition_summaries(
                        keep + dead, info["pkey"]
                    ),
                }
            )
            mlist_records.append(entry)
            minfo[rw_path] = {**info, "entry": entry, "files": survivors}
            this_sid_mpaths.append(rw_path)

        added_rows = 0
        if added:

            def _avro_branch(c: str, t: str) -> str:
                if c in trs:
                    # result-typed values: date stores as int days; int
                    # (month/year/hour/bucket) and long/string natively
                    return {"date": "int", "int": "int", "long": "long",
                            "string": "string"}.get(t, "string")
                return _PARTITION_AVRO.get(t, "string")

            partition_avro_fields = [
                {
                    "name": c,
                    "type": ["null", _avro_branch(c, t)],
                    "default": None,
                    "field-id": pfid,
                }
                for (c, t), pfid in zip(pkey, spec_field_ids[pkey])
            ]
            entries = []
            for f in added:
                lower, upper = [], []
                for col, (mn, mx) in sorted(f.get("stats", {}).items()):
                    t = ice_types.get(col)
                    fid = fids.get(col)
                    if t is None or fid is None:
                        continue
                    lb, ub = bound_bytes(t, mn), bound_bytes(t, mx)
                    if lb is not None and ub is not None:
                        lower.append({"key": int(fid), "value": lb})
                        upper.append({"key": int(fid), "value": ub})
                abs_path = wh._abs_path(name, f["path"])
                cached = footer_cache.get(abs_path)
                if cached is None:
                    cached = footer_cache[abs_path] = _footer_metrics(abs_path)
                fm, split_offsets = cached
                col_sizes, val_counts, null_counts = [], [], []
                for nm in sorted(fm, key=lambda n: fids.get(n, 1 << 30)):
                    fid = fids.get(nm)
                    if fid is None:  # column unknown at this schema vintage
                        continue
                    sz, nv, nn = fm[nm]
                    col_sizes.append({"key": int(fid), "value": int(sz)})
                    val_counts.append({"key": int(fid), "value": int(nv)})
                    if nn is not None:
                        null_counts.append({"key": int(fid), "value": int(nn)})
                entries.append(
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": int(snap["snapshot_id"]),
                        "sequence_number": seq,
                        "file_sequence_number": seq,
                        "data_file": {
                            "content": 0,
                            "file_path": uri_of[f["path"]],
                            "file_format": "PARQUET",
                            "partition": {
                                c: (
                                    _T.partition_value_to_spec(
                                        trs[c],
                                        f["partition"].get(c),
                                        ice_types.get(
                                            trs[c].source, "string"
                                        ),
                                    )
                                    if c in trs
                                    else _typed_partition_value(
                                        t, f["partition"].get(c)
                                    )
                                )
                                for c, t in pkey
                            },
                            "record_count": int(f["row_count"]),
                            "file_size_in_bytes": int(f["size_bytes"]),
                            "column_sizes": col_sizes or None,
                            "value_counts": val_counts or None,
                            "null_value_counts": null_counts or None,
                            "split_offsets": split_offsets or None,
                            "lower_bounds": lower or None,
                            "upper_bounds": upper or None,
                        },
                    }
                )
                added_rows += int(f["row_count"])

            manifest_path = os.path.join(mdir, f"{uuid.uuid4().hex}-m0.avro")
            mlen = write_ocf(
                manifest_path,
                _manifest_entry_schema(partition_avro_fields),
                entries,
                metadata={
                    "schema": json.dumps(schemas[schema_id]),
                    "schema-id": str(schema_id),
                    "partition-spec": json.dumps(specs[spec_id]["fields"]),
                    "partition-spec-id": str(spec_id),
                    "format-version": "2",
                    "content": "data",
                },
            )
            new_entry = {
                "manifest_path": _to_uri(manifest_path),
                "manifest_length": mlen,
                "partition_spec_id": spec_id,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": int(snap["snapshot_id"]),
                "added_files_count": len(added),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": added_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                # spec "Manifest Lists": per-partition-field summaries —
                # readers skip whole manifests on these before opening
                # any manifest Avro
                "partitions": _partition_summaries(entries, pkey),
                "key_metadata": None,
            }
            mlist_records.append(new_entry)
            minfo[manifest_path] = {
                "entry": new_entry,
                "files": {uri_of[f["path"]] for f in added},
                "pkey": pkey,
            }
            this_sid_mpaths.append(manifest_path)
        data_mfs_by_sid[int(snap["snapshot_id"])] = this_sid_mpaths
        for dp in snap.get("delete_predicates") or []:
            dkey = (dp["predicate"], tuple(dp["files"]))
            art = delete_artifacts.get(dkey)
            if art is None:
                parsed = _parse_equality_predicate(dp["predicate"])
                dfile, eq_ids, n_del = None, None, 0
                if parsed is not None and all(
                    c in ice_types and c in fids for c in parsed[0]
                ):
                    cols, rows = parsed
                    dfile = _write_equality_delete_file(
                        mdir,
                        cols,
                        [ice_types[c] for c in cols],
                        [int(fids[c]) for c in cols],
                        rows,
                    )
                    if dfile is not None:
                        eq_ids = [int(fids[c]) for c in cols]
                        n_del = len(rows)
                if dfile is None:
                    # not equality-shaped (or a column type with no
                    # single-value parquet form): POSITION delete file —
                    # spec content=1, (file_path, pos) of matching rows in
                    # exactly the predicate's scoped data files
                    dfile, n_del = _write_positional_delete_file(
                        wh, name, mdir, dp
                    )
                # global delete: the unpartitioned spec scopes it table-wide
                if () not in spec_ids:
                    spec_ids[()] = len(specs)
                    spec_field_ids[()] = []
                    specs.append({"spec-id": len(specs), "fields": []})
                dm_path = os.path.join(mdir, f"{uuid.uuid4().hex}-d0.avro")
                dm_len = write_ocf(
                    dm_path,
                    _manifest_entry_schema([]),
                    [
                        {
                            "status": 1,
                            "snapshot_id": int(snap["snapshot_id"]),
                            "sequence_number": seq,
                            "file_sequence_number": seq,
                            "data_file": {
                                # 2 = EQUALITY_DELETES, 1 = POSITION_DELETES
                                "content": 2 if eq_ids is not None else 1,
                                "file_path": _to_uri(dfile),
                                "file_format": "PARQUET",
                                "partition": {},
                                "record_count": n_del,
                                "file_size_in_bytes": os.path.getsize(dfile),
                                "lower_bounds": None,
                                "upper_bounds": None,
                                "equality_ids": eq_ids,
                            },
                        }
                    ],
                    metadata={
                        "schema": json.dumps(schemas[schema_id]),
                        "schema-id": str(schema_id),
                        "partition-spec": json.dumps([]),
                        "partition-spec-id": str(spec_ids[()]),
                        "format-version": "2",
                        "content": "deletes",
                    },
                )
                art = {
                    "path": dm_path,
                    "len": dm_len,
                    "spec_id": spec_ids[()],
                    "seq": seq,
                    "snap_id": int(snap["snapshot_id"]),
                    "rows": n_del,
                }
                delete_artifacts[dkey] = art
            mlist_records.append(
                {
                    "manifest_path": _to_uri(art["path"]),
                    "manifest_length": art["len"],
                    "partition_spec_id": art["spec_id"],
                    "content": 1,  # deletes
                    "sequence_number": art["seq"],
                    "min_sequence_number": art["seq"],
                    "added_snapshot_id": art["snap_id"],
                    "added_files_count": 1,
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": art["rows"],
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "partitions": None,
                    "key_metadata": None,
                }
            )
        mlist_path = os.path.join(
            mdir, f"snap-{snap['snapshot_id']}-1-{uuid.uuid4().hex}.avro"
        )
        write_ocf(
            mlist_path,
            MANIFEST_FILE_SCHEMA,
            mlist_records,
            metadata={"format-version": "2"},
        )
        op = {"append": "append", "replace": "overwrite"}.get(
            snap.get("operation", "append"), "overwrite"
        )
        total_rows = sum(int(f["row_count"]) for f in snap["manifest"])
        summary = {
            "operation": op,
            "added-data-files": str(len(added)),
            "added-records": str(added_rows),
            "total-data-files": str(len(snap["manifest"])),
            "total-records": str(total_rows),
        }
        if removed_uris:
            summary["deleted-data-files"] = str(len(removed_uris))
            summary["deleted-records"] = str(removed_rows)
        snapshots_json.append(
            {
                "snapshot-id": int(snap["snapshot_id"]),
                "parent-snapshot-id": snap.get("parent_id"),
                "sequence-number": seq,
                "timestamp-ms": int(snap["timestamp_ms"]),
                "manifest-list": _to_uri(mlist_path),
                # spec: summary values are strings
                "summary": summary,
                "schema-id": schema_id,
            }
        )
        sid_info[int(snap["snapshot_id"])] = {
            "schema-id": schema_id,
            "spec-id": spec_id,
        }
        if snap["snapshot_id"] in main_ids:
            # the snapshot-log records MAIN-pointer history only (spec);
            # branch/tag snapshots appear in `snapshots` and `refs` alone
            snapshot_log.append(
                {
                    "timestamp-ms": int(snap["timestamp_ms"]),
                    "snapshot-id": int(snap["snapshot_id"]),
                }
            )

    all_fids = [f["id"] for s in schemas for f in s["fields"]]
    # the MAIN head's schema/spec drive every "current" pointer — with refs
    # exported, the last-processed snapshot may be a branch head instead
    head_info = sid_info.get(int(meta["current_snapshot_id"]), {})
    head_schema_id = head_info.get("schema-id", 0)
    # declared sort order (cluster_by tables): identity asc, nulls-first —
    # matching the warehouse's repartitionByRange + sortWithinPartitions
    cur_fids = {
        f["name"]: f["id"]
        for f in (schemas[head_schema_id]["fields"] if chain else [])
    }
    sort_fields = [
        {
            "transform": "identity",
            "source-id": cur_fids[c],
            "direction": "asc",
            "null-order": "nulls-first",
        }
        for c in (meta.get("sort_order") or [])
        if c in cur_fids
    ]
    table_meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": _to_uri(location),
        "last-sequence-number": len(all_snaps),
        "last-updated-ms": int(chain[-1]["timestamp_ms"]) if chain else 0,
        "last-column-id": max(all_fids) if all_fids else 0,
        "current-schema-id": head_schema_id,
        "schemas": schemas,
        "default-spec-id": head_info.get("spec-id", 0),
        "partition-specs": specs or [{"spec-id": 0, "fields": []}],
        # highest partition field id ever assigned, across ALL specs
        # (Java Iceberg's lastAssignedPartitionId; 999 when unpartitioned)
        "last-partition-id": last_pfid,
        "default-sort-order-id": 1 if sort_fields else 0,
        "sort-orders": (
            [{"order-id": 0, "fields": []}]
            + (
                [{"order-id": 1, "fields": sort_fields}]
                if sort_fields
                else []
            )
        ),
        "properties": {
            "write.format.default": "parquet",
            # spec: resolves columns in data files written WITHOUT Iceberg
            # field ids (all of ours — plain-Spark parquet). Current name
            # first, historical spellings after.
            "schema.name-mapping.default": json.dumps(
                [
                    {
                        "field-id": f["id"],
                        "names": [f["name"]]
                        + [
                            n
                            for n in names_by_fid.get(f["id"], [])
                            if n != f["name"]
                        ],
                    }
                    for sch in ([schemas[head_schema_id]] if chain else [])
                    for f in sch["fields"]
                ]
            ),
        },
        "current-snapshot-id": int(meta["current_snapshot_id"]),
        "snapshots": snapshots_json,
        "snapshot-log": snapshot_log,
        "metadata-log": metadata_log,
        "refs": {
            **refs_json,
            "main": {
                "snapshot-id": int(meta["current_snapshot_id"]),
                "type": "branch",
            },
        },
    }
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as f:
        json.dump(table_meta, f, indent=1)
    tmp_hint = hint + f".tmp-{uuid.uuid4().hex}"
    with open(tmp_hint, "w") as f:
        f.write(str(version))
    os.replace(tmp_hint, hint)
    return location


# ---------------------------------------------------------------- reader


def _load_table_metadata(mdir: str) -> dict:
    """HadoopTableOperations discovery: ``version-hint.text`` names the
    current version; the hint is OPTIONAL in real tables (a crashed writer
    may never land it), and the reference behavior is to fall back to
    listing ``v*.metadata.json`` and taking the highest version."""
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            version = int(f.read().strip())
    else:
        versions = [
            int(m.group(1))
            for p in os.listdir(mdir)
            if (m := re.fullmatch(r"v(\d+)\.metadata\.json", p))
        ]
        if not versions:
            raise FileNotFoundError(
                f"no version-hint.text and no vN.metadata.json under {mdir}"
            )
        version = max(versions)
    with open(os.path.join(mdir, f"v{version}.metadata.json")) as f:
        return json.load(f)


def read_iceberg_v2(
    spark: SparkSession,
    location: str,
    snapshot_id: Optional[int] = None,
    where: Optional[str] = None,
    ref: Optional[str] = None,
    as_of_ms: Optional[int] = None,
    restrict_files: Optional[set] = None,
) -> DataFrame:
    """Scan an Iceberg v2 table through the SPEC metadata only.

    Resolution chain (HadoopCatalog discovery): version-hint.text →
    vN.metadata.json → snapshot (current, ``snapshot_id`` time travel,
    ``ref``, or ``as_of_ms`` — the spec's as-of-timestamp read, resolved
    through the snapshot-log as the last MAIN snapshot whose
    ``timestamp-ms`` <= the bound) → manifest-list Avro → manifest Avro
    entries → data-file URIs
    + partition values. Partition values are attached FROM THE MANIFESTS
    (spec semantics — Iceberg never re-infers them from paths): ONE
    vectorized FileScan over every surviving file, with the per-file
    constants (partition values, data sequence number) broadcast-joined
    against ``_metadata.file_path`` — the mapping is manifest-sized (one
    row per FILE, ~100k rows at 100 TB), never data-sized; this is how a
    DataSourceV2 reader populates identity-partition constants per split.
    Manifests under different partition specs union their fields by name
    (absent columns NULL-fill). ``where`` prunes files from manifest
    bounds/partition values BEFORE the scan. Equality deletes apply under
    the spec's strictly-less sequence rule, position deletes under <= with
    a broadcast anti-join on (file, pos).
    """
    mdir = os.path.join(_from_uri(location), "metadata")
    meta = _load_table_metadata(mdir)
    if meta["format-version"] != 2:
        raise ValueError(f"unsupported format-version {meta['format-version']}")
    if sum(x is not None for x in (ref, snapshot_id, as_of_ms)) > 1:
        raise ValueError("pass at most one of ref, snapshot_id, as_of_ms")
    if as_of_ms is not None:
        # spec: as-of-timestamp reads resolve through the snapshot-log
        # (MAIN-pointer history), not the snapshots list — a branch
        # snapshot never becomes current-as-of any wall-clock time
        eligible = [
            e for e in meta.get("snapshot-log", [])
            if e["timestamp-ms"] <= as_of_ms
        ]
        if not eligible:
            raise ValueError(
                f"no snapshot current as of {as_of_ms} (earliest log entry: "
                f"{min((e['timestamp-ms'] for e in meta.get('snapshot-log', [])), default=None)})"
            )
        snapshot_id = eligible[-1]["snapshot-id"]
    if ref is not None:
        if ref not in meta.get("refs", {}):
            raise KeyError(
                f"no ref {ref!r} (refs: {sorted(meta.get('refs', {}))})"
            )
        snapshot_id = meta["refs"][ref]["snapshot-id"]
    sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    schema = next(
        s for s in meta["schemas"] if s["schema-id"] == snap["schema-id"]
    )
    _, _, manifest_files = read_ocf(_from_uri(snap["manifest-list"]))

    # file URI -> {partition col: value} + data sequence number, straight
    # from the manifests (spec semantics: Iceberg never re-infers partition
    # values from paths); content=1 manifests carry delete files. Data
    # manifests may be written under DIFFERENT partition specs (spec
    # evolution — the norm for long-lived Iceberg tables): the partition
    # fields are UNIONED across manifests in first-seen order and each
    # file's values bind by NAME against the union, None-filling columns
    # its own spec lacks — never positionally against the last manifest.
    file_parts: dict[str, dict] = {}
    file_seqs: dict[str, int] = {}
    part_types: dict[str, str] = {}  # ordered union of all specs' fields
    eq_deletes: dict[str, dict] = {}
    pos_deletes: list[dict] = []
    # IS [NOT] NULL conjuncts prune on the null-count metrics (fids
    # 109/110) — affirmative evidence only: a fid absent from the maps
    # (partial metrics are spec-legal) never skips
    null_conjuncts = _null_conjuncts(where)
    # simple AND-conjuncts, parsed once: hidden-partitioning pruning maps
    # them through the spec transforms (day/month/year/hour/bucket/
    # truncate) and compares in transformed space
    conjuncts = _simple_conjuncts(where)
    specs_by_id = {s["spec-id"]: s for s in meta.get("partition-specs", [])}
    snap_types_by_id = {f["id"]: f["type"] for f in schema["fields"]}
    snap_fields_by_id = {f["id"]: f for f in schema["fields"]}
    for mf in manifest_files:
        # manifest-level pruning (spec "Manifest Lists" field summaries):
        # a DATA manifest whose per-partition-field bounds exclude the
        # predicate is never even OPENED — the planning gate that matters
        # when a 100 TB table carries thousands of manifests. Identity
        # bounds feed _can_skip directly; transformed fields prune via
        # _transform_skip (bounds live in the transform's result space);
        # delete manifests are never skipped (extra delete files are
        # harmless, missing ones are not).
        if (
            where is not None
            and mf.get("content", 0) == 0
            and mf.get("partitions")
        ):
            spec_fields = specs_by_id.get(
                mf["partition_spec_id"], {}
            ).get("fields", [])
            stats, no_null_cols = {}, set()
            for fld, summ in zip(spec_fields, mf["partitions"]):
                if fld.get("transform") != "identity":
                    continue
                t = snap_types_by_id.get(fld["source-id"])
                if t is None:
                    continue
                if not summ["contains_null"]:
                    no_null_cols.add(fld["name"])
                lb, ub = summ.get("lower_bound"), summ.get("upper_bound")
                if lb is not None and ub is not None:
                    lo, hi = try_bound_value(t, lb), try_bound_value(t, ub)
                    if lo is not None and hi is not None:
                        stats[fld["name"]] = [lo, hi]
            from apache_iceberg_demo_spark.sources.warehouse import Warehouse

            if stats and Warehouse._can_skip(
                {"partition": {}, "stats": stats}, where
            ):
                continue
            # identity partition: value NULL <=> the column is NULL for
            # every row of the file, so a no-nulls summary kills IS NULL
            if any(
                not is_not and col in no_null_cols
                for col, is_not in null_conjuncts
            ):
                continue
            # hidden-partitioning manifest prune: transformed-space bounds
            summ_by_name = {
                fld["name"]: s
                for fld, s in zip(spec_fields, mf["partitions"])
            }

            def _mf_range(pf: dict, result_type: str):
                s = summ_by_name.get(pf["name"])
                if s is None:
                    return None
                lo = _decode_transformed_bound(result_type, s.get("lower_bound"))
                hi = _decode_transformed_bound(result_type, s.get("upper_bound"))
                if lo is None or hi is None:
                    return None
                if result_type == "string" and s.get("contains_null"):
                    # the hive layout writes an EMPTY-STRING partition
                    # value to the same default dir as null, so a null
                    # summary may hide ''-valued rows (truncate-on-string:
                    # truncate('') == '') — the sound string range
                    # includes '' (r14 fuzzer: `tag = ''` pruned the
                    # manifest holding the ''-file)
                    lo = ""
                return (lo, hi)

            if _transform_skip(spec_fields, snap_fields_by_id, conjuncts, _mf_range):
                continue
        _mschema, mmeta, entries = read_ocf(_from_uri(mf["manifest_path"]))
        if mf.get("content", 0) == 1:  # delete manifest
            for e in entries:
                d = e["data_file"]
                if d["content"] == 2:  # EQUALITY_DELETES
                    eq_deletes[d["file_path"]] = {
                        "path": _from_uri(d["file_path"]),
                        "ids": d["equality_ids"],
                        "seq": e["sequence_number"],
                    }
                elif d["content"] == 1:  # POSITION_DELETES
                    pos_deletes.append(
                        {
                            "path": _from_uri(d["file_path"]),
                            "seq": e["sequence_number"],
                        }
                    )
                else:
                    raise ValueError(
                        f"unsupported delete content {d['content']}"
                    )
            continue
        spec_fields = json.loads(mmeta["partition-spec"])
        # resolve identity source types through ALL schema versions,
        # newest winning: a historical spec may bind a field id that has
        # LEFT the current schema (replace-with-a-new-transform drops the
        # old derived column from the declared schema; drop_column after
        # a spec evolution does too — r14 probe: KeyError). Such fields
        # still join their values in, but the typed projection (declared
        # columns only) drops them — metadata-only, exactly right.
        by_src = {
            f["id"]: f for s in meta["schemas"] for f in s["fields"]
        }
        by_src.update({f["id"]: f for f in schema["fields"]})
        # only IDENTITY fields become data columns (their value joins into
        # the scan); transformed fields (day/bucket/truncate/…) are hidden
        # — metadata-only, used for pruning, never projected
        local_fields = [
            (pf["name"], by_src[pf["source-id"]]["type"])
            for pf in spec_fields
            if pf.get("transform", "identity") == "identity"
            and pf["source-id"] in by_src
        ]
        for n, t in local_fields:
            if part_types.setdefault(n, t) != t:
                raise ValueError(
                    f"partition field {n!r} bound to two types across "
                    f"specs ({part_types[n]} vs {t})"
                )
        types_by_id = {f["id"]: f["type"] for f in schema["fields"]}
        names_by_id = {f["id"]: f["name"] for f in schema["fields"]}
        ids_by_name = {n: i for i, n in names_by_id.items()}
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df_rec = e["data_file"]
            if df_rec["file_format"].upper() != "PARQUET":
                raise ValueError(f"unsupported format {df_rec['file_format']}")
            # manifest-level file skipping (Iceberg scan planning): decode
            # the entry's bounds and reuse the warehouse's conservative
            # min/max pruner — a pruned file is never listed to the scan,
            # the 100 TB fast path the bounds exist for
            if where is not None:
                stats = {}
                uppers = {
                    kv["key"]: kv["value"] for kv in df_rec.get("upper_bounds") or []
                }
                for kv in df_rec.get("lower_bounds") or []:
                    fid = kv["key"]
                    if fid in uppers and fid in types_by_id:
                        t = types_by_id[fid]
                        lo = try_bound_value(t, kv["value"])
                        hi = try_bound_value(t, uppers[fid])
                        if lo is not None and hi is not None:
                            stats[names_by_id[fid]] = [lo, hi]
                entry_view = {
                    "partition": {
                        n: str(v)
                        for n, v in df_rec["partition"].items()
                        if v is not None
                    },
                    "stats": stats,
                }
                from apache_iceberg_demo_spark.sources.warehouse import Warehouse

                if Warehouse._can_skip(entry_view, where):
                    continue
                # hidden-partitioning file prune: the entry's transformed
                # partition value is an exact point range
                part_rec = df_rec["partition"]

                def _entry_range(pf: dict, _result_type: str):
                    v = part_rec.get(pf["name"])
                    return None if v is None else (v, v)

                if _transform_skip(spec_fields, by_src, conjuncts, _entry_range):
                    continue
            if null_conjuncts:
                vals = {
                    kv["key"]: kv["value"]
                    for kv in df_rec.get("value_counts") or []
                }
                nulls = {
                    kv["key"]: kv["value"]
                    for kv in df_rec.get("null_value_counts") or []
                }
                skip = False
                for col, is_not_null in null_conjuncts:
                    fid = ids_by_name.get(col)
                    if fid is None or fid not in nulls:
                        continue
                    if not is_not_null and nulls[fid] == 0:
                        skip = True  # column has no NULLs in this file
                        break
                    if (
                        is_not_null
                        and fid in vals
                        and nulls[fid] == vals[fid]
                    ):
                        skip = True  # every stored value is NULL
                        break
                if skip:
                    continue
            if (
                restrict_files is not None
                and df_rec["file_path"] not in restrict_files
            ):
                continue  # incremental scan: only the requested files
            file_parts[df_rec["file_path"]] = {
                n: df_rec["partition"].get(n) for n, _ in local_fields
            }
            file_seqs[df_rec["file_path"]] = e["sequence_number"] or 0
    part_fields = list(part_types.items())

    _SPARK_TYPE = {
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "string": "string",
        "boolean": "boolean",
        "date": "date",
        "timestamptz": "timestamp",
        "timestamp": "timestamp_ntz",
        "binary": "binary",
    }

    def spark_type(ice: str) -> str:
        return _SPARK_TYPE.get(ice, ice)  # decimal(p,s) passes through

    if not file_parts:
        ddl = ", ".join(
            f"`{f['name']}` {spark_type(f['type'])}" for f in schema["fields"]
        )
        return spark.createDataFrame([], schema=ddl)
    # ONE scan over every data file; partition values attach via a
    # broadcast join of the manifest's (file -> partition tuple) mapping
    # against the _metadata.file_path constant — one row per FILE, so the
    # broadcast is manifest-sized (~100k rows at 100 TB), never data-sized.
    # This is how a DataSourceV2 reader populates identity-partition
    # constants per split; expressed here with built-in operators so the
    # scan stays a single vectorized FileScan (no per-partition-value
    # union: the demo table alone has ~84 month values).
    # mergeSchema: files written before a rename/add carry old spellings or
    # miss columns entirely; the merged scan schema surfaces every physical
    # name so the name-mapping projection below can coalesce them
    out = spark.read.option("mergeSchema", "true").parquet(
        *[_from_uri(u) for u in file_parts]
    )
    need_seq = bool(eq_deletes or pos_deletes)
    if pos_deletes:
        # the parquet row ordinal — Iceberg's `pos`; captured on the scan
        # frame (where _metadata resolves), consumed by the anti-join below
        out = out.withColumn("__pos", F.col("_metadata.row_index"))
    pnames = {n for n, _ in part_fields}
    # A data column sharing a partition column's name — a table evolved
    # from unpartitioned to identity-partitioned still CONTAINS the column
    # in its old files — would make the post-join reference ambiguous.
    # Shadow-rename the scan-side column; the typed projection below
    # coalesces (manifest constant, shadowed data value) so old files keep
    # their stored values and new files get the manifest constant.
    data_shadow: dict[str, str] = {}
    for n in sorted(pnames):
        if n in out.columns:
            shadow = f"__data_{n}"
            out = out.withColumnRenamed(n, shadow)
            data_shadow[n] = shadow
    if part_fields or need_seq:
        # the per-file constants from the manifests: partition values, and
        # the data sequence number the delete sequence rules scope against.
        # The manifest's Avro branch stores int/long/double/string values
        # natively and every other type (date, timestamp, decimal, float,
        # boolean) as its hive STRING — declare those columns string here;
        # the typed projection casts them to the declared Iceberg type.
        def _map_type(t: str) -> str:
            return spark_type(t) if t in _PARTITION_AVRO else "string"

        map_ddl = "`__file` string, `__seq` bigint" + "".join(
            f", `{n}` {_map_type(t)}" for n, t in part_fields
        )
        mapping = spark.createDataFrame(
            [
                (
                    _uri_path_quote(_from_uri(u)),
                    file_seqs[u],
                    *[vals.get(n) for n, _ in part_fields],
                )
                for u, vals in file_parts.items()
            ],
            schema=map_ddl,
        )
        # _metadata.file_path renders Hadoop-style (file:/p, single slash);
        # normalize both sides to plain paths before the join. __file stays
        # alive while position deletes need it (dropped at the end).
        out = out.withColumn(
            "__file",
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/"),
        ).join(F.broadcast(mapping), "__file")
        if not pos_deletes:
            out = out.drop("__file")
    # bind the declared column set/order/types through the spec's
    # name-mapping (schema.name-mapping.default): per field id, the ordered
    # physical spellings that may carry it. Files written before a rename
    # have the old name, post-rename files the new one — coalesce in
    # mapping order. Columns added after a file was written → NULL.
    nm = {
        m["field-id"]: m["names"]
        for m in json.loads(
            meta.get("properties", {}).get("schema.name-mapping.default", "[]")
        )
    }
    proj = []
    for f in schema["fields"]:
        st = spark_type(f["type"])
        if f["name"] in pnames:
            srcs = [F.col(f["name"]).cast(st)]
            if f["name"] in data_shadow:
                # pre-spec-evolution files stored the column as data; the
                # manifest constant is NULL for them — fall back
                srcs.append(F.col(data_shadow[f["name"]]).cast(st))
            proj.append(
                (srcs[0] if len(srcs) == 1 else F.coalesce(*srcs)).alias(
                    f["name"]
                )
            )
            continue
        candidates = [
            n for n in nm.get(f["id"], [f["name"]]) if n in out.columns
        ]
        if not candidates:
            proj.append(F.lit(None).cast(st).alias(f["name"]))
        elif len(candidates) == 1:
            proj.append(F.col(candidates[0]).cast(st).alias(f["name"]))
        else:
            proj.append(
                F.coalesce(*[F.col(n).cast(st) for n in candidates]).alias(
                    f["name"]
                )
            )
    extras = (["__seq"] if need_seq else []) + (
        ["__file", "__pos"] if pos_deletes else []
    )
    # equality deletes may reference a field id that was DROPPED from the
    # current schema afterwards (Iceberg allows the drop; the delete still
    # applies by field id against the stored values — r14 probe found the
    # KeyError). Resolve such fids through the HISTORICAL schema versions'
    # spellings and carry the physical column through the projection under
    # a synthetic name; rows where no file carries the column are NULL and
    # equality never matches NULL, exactly the spec semantics.
    dropped_eq: dict[int, str] = {}
    eqdrop_aliases: list[str] = []
    if eq_deletes:
        cur_ids = {f["id"] for f in schema["fields"]}
        for d in eq_deletes.values():
            for fid in d["ids"]:
                if fid in cur_ids or fid in dropped_eq:
                    continue
                cands, typ = [], "string"
                for s in meta["schemas"]:
                    for f in s["fields"]:
                        if f["id"] == fid and f["name"] not in cands:
                            cands.append(f["name"])
                            typ = f["type"]
                alias = f"__eqdrop_{fid}"
                st = spark_type(typ)
                exprs = []
                for n in cands:
                    if n in out.columns:
                        exprs.append(F.col(n).cast(st))
                    if n in data_shadow:
                        # the physical data column was shadow-renamed
                        # because the name is also a (historical)
                        # partition field — post-evolution files store
                        # the value as DATA while the manifest constant
                        # is NULL; fall back exactly like the typed
                        # projection does (r14 review finding)
                        exprs.append(F.col(data_shadow[n]).cast(st))
                proj.append(
                    (
                        F.coalesce(*exprs)
                        if exprs
                        else F.lit(None).cast(st)
                    ).alias(alias)
                )
                dropped_eq[fid] = alias
                eqdrop_aliases.append(alias)
    out = out.select(*proj, *extras)
    # the __eqdrop columns are PRODUCED by proj — listing them in the
    # select's extras too would duplicate the column via Spark's
    # lateral-column-alias fallback (r14 review, verified empirically);
    # they join extras only for the final drop
    extras.extend(eqdrop_aliases)
    # equality deletes (spec "Scan Planning"): a delete file with sequence
    # number d removes matching rows from data files with sequence number
    # STRICTLY LESS than d. Key tuples are manifest-scale small (they came
    # from a predicate — real Iceberg compacts delete files on the same
    # assumption), so they apply as an isin / OR-of-AND filter rather than
    # a join; a NULL data value never matches (SQL equality semantics).
    if eq_deletes:
        import pyarrow.parquet as pq

        name_by_id = {f["id"]: f["name"] for f in schema["fields"]}

        def _delete_col(tbl, fid: int, pos: int):
            # bind the delete-file column by its parquet field-id metadata
            # (Iceberg semantics — survives a column RENAMED after the
            # delete, where the parquet carries the old spelling), falling
            # back to ordinal position in equality_ids order
            for i in range(len(tbl.schema)):
                md = tbl.schema.field(i).metadata or {}
                if md.get(b"PARQUET:field_id") == str(fid).encode():
                    return tbl.column(i)
            return tbl.column(pos)

        for d in eq_deletes.values():
            cols = [
                name_by_id.get(i, dropped_eq.get(i)) for i in d["ids"]
            ]
            tbl = pq.read_table(d["path"])
            if len(cols) == 1:
                match = F.col(cols[0]).isin(
                    _delete_col(tbl, d["ids"][0], 0).to_pylist()
                )
            else:
                # multi-column tuples: OR over per-tuple AND conjunctions —
                # tuple counts are predicate-derived (tiny), far below the
                # Catalyst array-inlining O(n²) threshold
                tuples = zip(
                    *[
                        _delete_col(tbl, fid, i).to_pylist()
                        for i, fid in enumerate(d["ids"])
                    ]
                )
                match = F.lit(False)
                for row in tuples:
                    row_match = F.lit(True)
                    for c, v in zip(cols, row):
                        row_match = row_match & (F.col(c) == F.lit(v))
                    match = match | row_match
            cond = (F.col("__seq") < F.lit(int(d["seq"]))) & match
            out = out.filter(~F.coalesce(cond, F.lit(False)))
    # position deletes (spec): a (file_path, pos) pair removes that exact
    # row from data files with sequence number <= the delete's. Applied as
    # a broadcast LEFT ANTI join on the captured scan coordinates.
    if pos_deletes:
        import pyarrow.parquet as pq

        for d in pos_deletes:
            tbl = pq.read_table(d["path"])
            pairs = [
                # same java.net.URI quoting as the identity-join keys —
                # __file carries the escaped form
                (_uri_path_quote(re.sub("^file:/+", "/", p)), int(x))
                for p, x in zip(
                    tbl.column("file_path").to_pylist(),
                    tbl.column("pos").to_pylist(),
                )
            ]
            if not pairs:
                continue
            pdf = spark.createDataFrame(
                pairs, schema="`__dfile` string, `__dpos` bigint"
            )
            cond = (
                (F.col("__file") == F.col("__dfile"))
                & (F.col("__pos") == F.col("__dpos"))
                & (F.col("__seq") <= F.lit(int(d["seq"])))
            )
            out = out.join(F.broadcast(pdf), on=cond, how="left_anti")
    if extras:
        out = out.drop(*extras)
    return out.filter(where) if where is not None else out


def read_iceberg_v2_changes(
    spark: SparkSession,
    location: str,
    from_snapshot_id: int,
    to_snapshot_id: Optional[int] = None,
    where: Optional[str] = None,
) -> DataFrame:
    """Incremental APPEND scan over the spec metadata: the rows added by
    snapshots AFTER ``from_snapshot_id`` up to and including
    ``to_snapshot_id`` (default: current) — Iceberg's IncrementalAppendScan.

    Like the reference implementation, the range must be append-only:
    a replace/overwrite/delete snapshot inside it raises (its changes are
    not expressible as appended rows). The fast-append manifest chain
    makes this scan cheap by construction: each snapshot in the range
    contributes exactly its own new manifest (``added_snapshot_id`` binds
    it), so the metadata read is O(commits in range), never O(table).
    Rows come back through the same typed projection as a full read,
    restricted to the added files.
    """
    mdir = os.path.join(_from_uri(location), "metadata")
    meta = _load_table_metadata(mdir)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if from_snapshot_id not in by_id:
        # expired (or bogus) cursor: surface the oldest snapshot still on
        # current's ancestry — the earliest point an incremental scan can
        # resume from — plus the typed recovery contract (VERDICT r11
        # item 2). Root-of-ancestry, not min(by_id): a branch-only
        # snapshot older than the main chain is not a resume point.
        sid = meta.get("current-snapshot-id")
        if sid == -1 or sid not in by_id:  # empty/degenerate table
            sid = None
        # bound by len(by_id): corrupt metadata with a parent-pointer
        # cycle must raise the typed error, not loop forever
        for _ in range(len(by_id)):
            parent = by_id.get(sid, {}).get("parent-snapshot-id")
            if parent not in by_id:
                break
            sid = parent
        raise CursorExpiredError(from_snapshot_id, sid)
    to_id = (
        to_snapshot_id
        if to_snapshot_id is not None
        else meta["current-snapshot-id"]
    )
    if to_id not in by_id:
        raise KeyError(f"unknown to_snapshot_id {to_id}")
    # walk to's ancestry back to from (exclusive)
    rng: list[dict] = []
    sid = to_id
    while sid is not None and sid != from_snapshot_id:
        snap = by_id.get(sid)
        if snap is None or len(rng) >= len(by_id):  # cycle guard on >=
            raise ValueError(
                f"snapshot {from_snapshot_id} is not an ancestor of {to_id}"
            )
        rng.append(snap)
        sid = snap.get("parent-snapshot-id")
    if sid is None and from_snapshot_id != to_id:
        raise ValueError(
            f"snapshot {from_snapshot_id} is not an ancestor of {to_id}"
        )
    rng.reverse()
    bad = [
        s["snapshot-id"]
        for s in rng
        if s.get("summary", {}).get("operation") != "append"
    ]
    if bad:
        raise ValueError(
            f"incremental append scan requires an append-only range; "
            f"snapshots {bad} are not appends"
        )
    range_ids = {s["snapshot-id"] for s in rng}
    added: set[str] = set()
    if rng:
        # append-only range: TO's manifest list carries every in-range
        # manifest unchanged (nothing was rewritten), and added_snapshot_id
        # binds each commit to exactly its own new manifest — one list
        # read plus one manifest read per in-range commit
        _, _, mfs = read_ocf(_from_uri(by_id[to_id]["manifest-list"]))
        for mf in mfs:
            if mf.get("content", 0) != 0:
                continue
            if mf["added_snapshot_id"] not in range_ids:
                continue  # pre-range manifest: nothing new in it
            _, _, entries = read_ocf(_from_uri(mf["manifest_path"]))
            added.update(
                e["data_file"]["file_path"]
                for e in entries
                if e["status"] == 1 and e["snapshot_id"] in range_ids
            )
    return read_iceberg_v2(
        spark, location, snapshot_id=to_id, where=where, restrict_files=added
    )


def iceberg_v2_change_feed(
    spark: SparkSession, location: str, cursor_path: str
) -> tuple[DataFrame, int]:
    """At-least-once incremental CONSUMPTION of an exported table — the
    consumer half of the CDC story (what a foreachBatch sink polls).

    Reads the rows appended since the snapshot recorded in
    ``cursor_path`` (no cursor yet = initial load: the full table as of
    current) and returns ``(frame, to_snapshot_id)``. The caller
    processes the frame, then calls :func:`advance_change_feed` with the
    returned id — separating read from advance is what makes the feed
    at-least-once: a crash between the two replays the same delta, never
    skips one. (Advancing first would silently drop the delta —
    at-most-once.) The cursor advance is an atomic replace, so a torn
    write can never corrupt it."""
    meta = _load_table_metadata(os.path.join(_from_uri(location), "metadata"))
    to_id = meta["current-snapshot-id"]
    if not os.path.exists(cursor_path):
        return read_iceberg_v2(spark, location, snapshot_id=to_id), to_id
    with open(cursor_path) as f:
        cur = json.load(f)["snapshot-id"]
    if cur == to_id:
        return (
            read_iceberg_v2(spark, location, snapshot_id=to_id).limit(0),
            to_id,
        )
    return (
        read_iceberg_v2_changes(
            spark, location, from_snapshot_id=cur, to_snapshot_id=to_id
        ),
        to_id,
    )


def advance_change_feed(cursor_path: str, snapshot_id: int) -> None:
    """Atomically record the last fully-processed snapshot."""
    tmp = f"{cursor_path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"snapshot-id": int(snapshot_id)}, f)
    os.replace(tmp, cursor_path)


def reset_change_feed(cursor_path: str) -> None:
    """Recover a feed whose cursor outlived snapshot retention
    (:class:`CursorExpiredError`): drop the cursor so the next poll is a
    full initial load of the table as of current. Replays rows the
    consumer already processed — at-least-once is preserved, nothing is
    ever skipped. Idempotent (a missing cursor is already reset)."""
    try:
        os.remove(cursor_path)
    except FileNotFoundError:
        pass


# ---------------------------------------------------------------- query

def _session_token(spark: SparkSession) -> str:
    """A session key that cannot recur: applicationId + JVM start time.
    ``str(id(spark))`` is NOT safe — CPython reuses object ids after GC, so
    a new session could be served a dead session's export location (the
    r08 LSH-memo lesson, applied here per ADVICE r10)."""
    sc = spark.sparkContext
    return f"{sc.applicationId}-{sc.startTime}"


#: memoized spec-export location per (session, sf_dir): the export itself
#: is metadata-only (fast), but the shared demo warehouse build costs
#: several write jobs (see warehouse._demo_warehouse)
_export_cache: dict[tuple[str, str], str] = {}

#: returned frames persisted so the driver's count()+collect() runs the
#: spec-path scan once (keyed per operator — the multimodal r09 pattern)
_live_caches: dict[str, DataFrame] = {}


def _keep_result(owner: str, df: DataFrame) -> DataFrame:
    from apache_iceberg_demo_spark.caching import keep_result

    return keep_result(_live_caches, owner, df)


@register(
    "a7_iceberg_v2_spec_scan",
    # The demo fixture is deterministic (l_orderkey % 20 = 0; ship_day =
    # yyyy-MM of l_shipdate), so the spec-path scan of its CURRENT snapshot
    # (both lineitem slices) is relationally recomputable from the source.
    oracle="""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_day,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_orderkey % 20 = 0
        GROUP BY 1
        ORDER BY 1
    """,
)
def a7_iceberg_v2_spec_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/interop: scan a warehouse table THROUGH exported Iceberg-v2 spec
    metadata (version-hint → metadata.json → Avro manifest list → Avro
    manifests → parquet URIs) and aggregate per partition.

    Reference parity: the reference's engine-neutral Iceberg table read
    (``/root/reference/README.md:52-53`` — DuckDB ``iceberg_scan`` over a
    Spark-written table). In-query self-asserts: the spec-path row count
    must equal the bespoke reader's, and the manifest-list row accounting
    must match the scan.
    """
    from apache_iceberg_demo_spark.sources.warehouse import _demo_warehouse

    wh, table = _demo_warehouse(spark, sf_dir)
    key = (_session_token(spark), sf_dir)
    if key not in _export_cache:
        _export_cache[key] = export_iceberg_v2(wh, table)
    location = _export_cache[key]

    df = read_iceberg_v2(spark, location)
    # self-assert: spec path and bespoke path agree on cardinality
    n_spec = df.count()
    n_bespoke = wh.read(table).count()
    if n_spec != n_bespoke:
        raise AssertionError(
            f"spec-path scan returned {n_spec} rows, bespoke reader {n_bespoke}"
        )
    # self-assert: the current snapshot's manifest-list accounting covers
    # exactly the scanned rows (added + existing)
    mdir = os.path.join(location, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        hint = int(f.read().strip())
    with open(os.path.join(mdir, f"v{hint}.metadata.json")) as f:
        tmeta = json.load(f)
    cur = next(
        s
        for s in tmeta["snapshots"]
        if s["snapshot-id"] == tmeta["current-snapshot-id"]
    )
    _, _, mfs = read_ocf(_from_uri(cur["manifest-list"]))
    accounted = sum(
        m["added_rows_count"] + m["existing_rows_count"]
        for m in mfs
        if m["content"] == 0
    )
    if accounted != n_spec:
        raise AssertionError(
            f"manifest-list accounts {accounted} rows, scan returned {n_spec}"
        )
    return _keep_result(
        "a7_iceberg_v2_spec_scan",
        df.groupBy("ship_day")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("ship_day"),
    )


#: memoized (warehouse, export location) for the equality-delete query
_mor_export_cache: dict[tuple[str, str], str] = {}


@register(
    "c6_iceberg_v2_equality_delete_export",
    # Deterministic construction: base = orderkey%20==0 & linenumber<=4,
    # MoR-delete linenumber=2, then append orderkey%20==10 & linenumber==2.
    # The spec path must drop the BASE linenumber-2 rows (delete sequence >
    # their file sequence) while keeping the APPENDED ones (higher
    # sequence) — relationally recomputable from the source.
    oracle="""
        WITH final AS (
            SELECT l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey % 20 = 0 AND l_linenumber <= 4
              AND l_linenumber <> 2
            UNION ALL
            SELECT l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey % 20 = 10 AND l_linenumber = 2
        )
        SELECT l_linenumber,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM final
        GROUP BY l_linenumber
        ORDER BY l_linenumber
    """,
)
def c6_iceberg_v2_equality_delete_export(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C6/interop: merge-on-read delete exported as an Iceberg v2 EQUALITY
    DELETE file and applied by the spec-path reader under the spec's
    strictly-less sequence rule — rows appended AFTER the delete with the
    same key survive, the base rows do not.

    Reference parity: the reference's Iceberg v2 row-level-delete story
    (the engine-neutral table keeps row-level deletes readable by every
    engine). In-query self-assert: spec read == bespoke read row count.
    """
    from apache_iceberg_demo_spark.io import load
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    key = (_session_token(spark), sf_dir)
    if key not in _mor_export_cache:
        from apache_iceberg_demo_spark.io import scratch_dir

        root = scratch_dir("iceberg_mor_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        li = load(spark, sf_dir, "lineitem")
        wh.create_or_replace(
            "li_mor",
            li.filter((F.col("l_orderkey") % 20 == 0) & (F.col("l_linenumber") <= 4)),
        )
        wh.delete_where_mor("li_mor", "l_linenumber = 2")
        wh.append(
            "li_mor",
            li.filter((F.col("l_orderkey") % 20 == 10) & (F.col("l_linenumber") == 2)),
        )
        location = export_iceberg_v2(wh, "li_mor", os.path.join(root, "ice"))
        n_spec = read_iceberg_v2(spark, location).count()
        n_bespoke = wh.read("li_mor").count()
        if n_spec != n_bespoke:
            raise AssertionError(
                f"spec-path MoR scan returned {n_spec} rows, bespoke "
                f"reader {n_bespoke}"
            )
        _mor_export_cache[key] = location
    df = read_iceberg_v2(spark, _mor_export_cache[key])
    return _keep_result(
        "c6_iceberg_v2_equality_delete_export",
        df.groupBy("l_linenumber")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
        .orderBy("l_linenumber"),
    )


#: memoized (warehouse, export location) for the positional-delete query
_pos_export_cache: dict[tuple[str, str], str] = {}


@register(
    "c6_iceberg_v2_positional_delete_export",
    # Deterministic construction: base = orderkey%20==0 & linenumber<=4,
    # MoR-delete the NON-equality predicate (l_quantity < 10 AND
    # l_linenumber = 2), then append orderkey%20==10 rows matching it.
    # The export writes a v2 POSITION delete file (file_path+pos of the
    # matching BASE rows); the spec path must drop exactly those while the
    # appended matching rows (not in the delete file) survive —
    # relationally recomputable from the source.
    oracle="""
        WITH final AS (
            SELECT l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey % 20 = 0 AND l_linenumber <= 4
              AND NOT (l_quantity < 10 AND l_linenumber = 2)
            UNION ALL
            SELECT l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey % 20 = 10 AND l_linenumber = 2
              AND l_quantity < 10
        )
        SELECT l_linenumber,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM final
        GROUP BY l_linenumber
        ORDER BY l_linenumber
    """,
)
def c6_iceberg_v2_positional_delete_export(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C6/interop: a NON-equality merge-on-read delete exported as an
    Iceberg v2 POSITION DELETE file (``file_path`` + ``pos``, reserved
    field ids) and applied by the spec-path reader — the r10 refusal path
    for non-equality predicates is gone (VERDICT r10 item 3).

    Reference parity: Iceberg v2's second row-level-delete form (position
    deletes are what Spark's own MERGE/DELETE write under
    merge-on-read). In-query self-asserts: spec read == bespoke read row
    count, and the delete manifest entry really is content=1.
    """
    from apache_iceberg_demo_spark.io import load
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    key = (_session_token(spark), sf_dir)
    if key not in _pos_export_cache:
        from apache_iceberg_demo_spark.io import scratch_dir

        root = scratch_dir("iceberg_posdel_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        li = load(spark, sf_dir, "lineitem")
        wh.create_or_replace(
            "li_pos",
            li.filter(
                (F.col("l_orderkey") % 20 == 0) & (F.col("l_linenumber") <= 4)
            ),
        )
        wh.delete_where_mor("li_pos", "l_quantity < 10 AND l_linenumber = 2")
        wh.append(
            "li_pos",
            li.filter(
                (F.col("l_orderkey") % 20 == 10)
                & (F.col("l_linenumber") == 2)
                & (F.col("l_quantity") < 10)
            ),
        )
        location = export_iceberg_v2(wh, "li_pos", os.path.join(root, "ice"))
        n_spec = read_iceberg_v2(spark, location).count()
        n_bespoke = wh.read("li_pos").count()
        if n_spec != n_bespoke:
            raise AssertionError(
                f"spec-path positional scan returned {n_spec} rows, "
                f"bespoke reader {n_bespoke}"
            )
        # self-assert: the delete really exported as a POSITION delete file
        mdir = os.path.join(location, "metadata")
        with open(os.path.join(mdir, "version-hint.text")) as f:
            hint = int(f.read().strip())
        with open(os.path.join(mdir, f"v{hint}.metadata.json")) as f:
            tmeta = json.load(f)
        cur = next(
            s
            for s in tmeta["snapshots"]
            if s["snapshot-id"] == tmeta["current-snapshot-id"]
        )
        _, _, mfs = read_ocf(_from_uri(cur["manifest-list"]))
        dms = [m for m in mfs if m["content"] == 1]
        if len(dms) != 1:
            raise AssertionError(f"expected 1 delete manifest, got {len(dms)}")
        _, _, dentries = read_ocf(_from_uri(dms[0]["manifest_path"]))
        if dentries[0]["data_file"]["content"] != 1:
            raise AssertionError(
                "expected POSITION_DELETES (content=1), got "
                f"{dentries[0]['data_file']['content']}"
            )
        _pos_export_cache[key] = location
    df = read_iceberg_v2(spark, _pos_export_cache[key])
    return _keep_result(
        "c6_iceberg_v2_positional_delete_export",
        df.groupBy("l_linenumber")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
        .orderBy("l_linenumber"),
    )


#: memoized export location for the incremental-scan query
_incr_export_cache: dict[tuple[str, str], tuple[str, int]] = {}


@register(
    "c6_iceberg_v2_incremental_scan",
    # Deterministic construction: base snapshot = orderkey%20==0, then two
    # append commits (%20==5, %20==10), all linenumber<=4. The incremental
    # append scan from the base snapshot must return EXACTLY the two
    # appended slices — relationally recomputable from the source table.
    oracle="""
        SELECT l_linenumber,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_orderkey % 20 IN (5, 10) AND l_linenumber <= 4
        GROUP BY l_linenumber
        ORDER BY l_linenumber
    """,
)
def c6_iceberg_v2_incremental_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C6/interop: Iceberg's IncrementalAppendScan over the exported spec
    metadata — the rows appended after a base snapshot, discovered from
    ``added_snapshot_id`` bindings in the fast-append manifest chain (one
    new manifest per commit), never by diffing table states.

    Reference parity: incremental consumption of an Iceberg table is the
    reference stack's CDC story (Spark structured streaming reads an
    Iceberg table incrementally the same way). In-query self-asserts: the
    incremental row count equals the appended slices' count, and the
    metadata walk opened only the in-range manifests.
    """
    from apache_iceberg_demo_spark.io import load
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    key = (_session_token(spark), sf_dir)
    if key not in _incr_export_cache:
        from apache_iceberg_demo_spark.io import scratch_dir

        root = scratch_dir("iceberg_incr_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
        wh.create_or_replace("li_incr", li.filter(F.col("l_orderkey") % 20 == 0))
        wh.append("li_incr", li.filter(F.col("l_orderkey") % 20 == 5))
        wh.append("li_incr", li.filter(F.col("l_orderkey") % 20 == 10))
        location = export_iceberg_v2(wh, "li_incr", os.path.join(root, "ice"))
        with open(
            os.path.join(location, "metadata", "version-hint.text")
        ) as f:
            hint = int(f.read().strip())
        with open(
            os.path.join(location, "metadata", f"v{hint}.metadata.json")
        ) as f:
            tmeta = json.load(f)
        base_sid = tmeta["snapshots"][0]["snapshot-id"]
        n_expected = li.filter(
            (F.col("l_orderkey") % 20 == 5) | (F.col("l_orderkey") % 20 == 10)
        ).count()
        n_incr = read_iceberg_v2_changes(
            spark, location, from_snapshot_id=base_sid
        ).count()
        if n_incr != n_expected:
            raise AssertionError(
                f"incremental scan returned {n_incr} rows, appended slices "
                f"hold {n_expected}"
            )
        _incr_export_cache[key] = (location, base_sid)
    location, base_sid = _incr_export_cache[key]
    df = read_iceberg_v2_changes(spark, location, from_snapshot_id=base_sid)
    return _keep_result(
        "c6_iceberg_v2_incremental_scan",
        df.groupBy("l_linenumber")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_linenumber"),
    )


#: memoized change-feed consumption result (kept-persisted per session)
_feed_cache: dict[tuple[str, str], DataFrame] = {}


@register(
    "c6_iceberg_v2_change_feed_consume",
    # Deterministic construction: three commits (orderkey%20==0 create,
    # %20==5 append, %20==10 append; linenumber<=4), the location
    # re-exported after each, a durable-cursor poll between commits. Poll
    # k's delta is exactly commit k's slice, so the tagged union is
    # relationally recomputable from the source table.
    oracle="""
        SELECT poll, l_linenumber,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM (
            SELECT 1 AS poll, l_linenumber FROM lineitem
            WHERE l_orderkey % 20 = 0 AND l_linenumber <= 4
            UNION ALL
            SELECT 2, l_linenumber FROM lineitem
            WHERE l_orderkey % 20 = 5 AND l_linenumber <= 4
            UNION ALL
            SELECT 3, l_linenumber FROM lineitem
            WHERE l_orderkey % 20 = 10 AND l_linenumber <= 4
        )
        GROUP BY poll, l_linenumber
        ORDER BY poll, l_linenumber
    """,
)
def c6_iceberg_v2_change_feed_consume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C6/interop: at-least-once CONSUMPTION of the exported table via the
    durable-cursor change feed — three commits, the location re-exported
    after each (metadata version bumps), one poll per commit; each poll's
    delta is tagged and unioned.

    Reference parity: the consumer half of the reference stack's CDC
    story (a downstream engine polling an Iceberg table for new rows).
    In-query self-assert: each poll's delta count equals its commit's
    slice count, and a replay WITHOUT advancing returns the same delta.
    """
    from apache_iceberg_demo_spark.io import load, scratch_dir
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    key = (_session_token(spark), sf_dir)
    if key not in _feed_cache:
        root = scratch_dir("iceberg_feed_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
        ice = os.path.join(root, "ice")
        cursor = os.path.join(root, "cursor.json")
        slices = [
            li.filter(F.col("l_orderkey") % 20 == 0),
            li.filter(F.col("l_orderkey") % 20 == 5),
            li.filter(F.col("l_orderkey") % 20 == 10),
        ]
        deltas = []
        for poll, sl in enumerate(slices, start=1):
            if poll == 1:
                wh.create_or_replace("t", sl)
            else:
                wh.append("t", sl)
            export_iceberg_v2(wh, "t", ice)
            df, sid = iceberg_v2_change_feed(spark, ice, cursor)
            n_delta, n_slice = df.count(), sl.count()
            if n_delta != n_slice:
                raise AssertionError(
                    f"poll {poll}: delta {n_delta} != commit slice {n_slice}"
                )
            # crash-replay: polling again BEFORE advancing repeats the delta
            replay, _ = iceberg_v2_change_feed(spark, ice, cursor)
            if replay.count() != n_delta:
                raise AssertionError(
                    f"poll {poll}: replay {replay.count()} != {n_delta}"
                )
            advance_change_feed(cursor, sid)
            deltas.append(df.withColumn("poll", F.lit(poll)))
        out = deltas[0]
        for d in deltas[1:]:
            out = out.unionByName(d)
        result = _keep_result(
            "c6_iceberg_v2_change_feed_consume",
            out.groupBy("poll", "l_linenumber")
            .agg(F.count("*").cast("bigint").alias("n_rows"))
            .orderBy("poll", "l_linenumber"),
        )
        _feed_cache[key] = result
    return _feed_cache[key]


#: memoized export location for the hidden-partitioning query
_hidden_export_cache: dict[tuple[str, str], str] = {}


@register(
    "c6_iceberg_v2_hidden_partitioning",
    # Deterministic construction: one year of the orderkey%20 slice,
    # hidden-partitioned days(o_orderdate); the spec-path read applies a
    # half-year predicate — relationally just a filter on the source.
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        WHERE o_orderkey % 20 = 0
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND o_orderdate >= TIMESTAMP '1995-06-01'
        GROUP BY month
        ORDER BY month
    """,
)
def c6_iceberg_v2_hidden_partitioning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C6/interop: Iceberg HIDDEN PARTITIONING (VERDICT r11 item 5) — a
    ``days(o_orderdate)`` table exports with a real ``day`` transform in
    the partition spec (source-id = the TIMESTAMP column's fid, manifest
    partition values as int days since epoch, summary bounds serialized
    as dates) and the derived column hidden from the exported schema,
    exactly as Iceberg writes it (SURVEY.md §1.5 names ``days(ts)`` the
    preferred layout; reference tables pre-derive a month column instead
    — ``csv_to_ice.py:25`` — which is what hidden partitioning replaces).

    The spec-path reader answers a SOURCE-column predicate by evaluating
    the transform on the literal and pruning manifests/files in
    transformed space — the user never references the derived column.
    In-query self-asserts: the exported schema does NOT leak the derived
    column, the spec declares ``day``, and the filtered read scans only
    the in-range day files (one file per matching day, strictly fewer
    than the full year).
    """
    from apache_iceberg_demo_spark.io import load, scratch_dir
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    key = (_session_token(spark), sf_dir)
    if key not in _hidden_export_cache:
        root = scratch_dir("iceberg_hidden_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        o = load(spark, sf_dir, "orders").filter(
            (F.col("o_orderkey") % 20 == 0)
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        wh.create_or_replace("t", o, partition_by="days(o_orderdate)")
        location = export_iceberg_v2(wh, "t", os.path.join(root, "ice"))
        tmeta = _load_table_metadata(os.path.join(location, "metadata"))
        schema_names = {
            f["name"]
            for s in tmeta["schemas"]
            for f in s["fields"]
        }
        if "o_orderdate_days" in schema_names:
            raise AssertionError(
                "hidden partition column leaked into the exported schema"
            )
        transforms_used = {
            f["transform"]
            for s in tmeta["partition-specs"]
            for f in s["fields"]
        }
        if transforms_used != {"day"}:
            raise AssertionError(
                f"expected a day-transform spec, got {transforms_used}"
            )
        _hidden_export_cache[key] = location
    location = _hidden_export_cache[key]
    filtered = read_iceberg_v2(
        spark, location, where="o_orderdate >= '1995-06-01'"
    )
    full = read_iceberg_v2(spark, location)
    n_filtered, n_full = len(filtered.inputFiles()), len(full.inputFiles())
    if not (0 < n_filtered < n_full):
        raise AssertionError(
            f"day-transform pruning did not bite: {n_filtered} of "
            f"{n_full} files scanned for the half-year predicate"
        )
    return _keep_result(
        "c6_iceberg_v2_hidden_partitioning",
        filtered.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("month"),
    )


#: memoized (location, probe key) for the multi-field-spec query
_multi_spec_cache: dict[tuple[str, str], tuple[str, int]] = {}


@register(
    "c6_iceberg_v2_multi_field_spec",
    # Deterministic construction: one year of the orderkey%20 slice,
    # partitioned by BOTH days(o_orderdate) AND bucket(4, o_custkey);
    # the spec-path read applies a half-year predicate — relationally
    # just a filter on the source. Bucket pruning is asserted in-query
    # (file counts + an exact row-count cross-check on the probe key).
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        WHERE o_orderkey % 20 = 0
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND o_orderdate >= TIMESTAMP '1995-07-01'
        GROUP BY month
        ORDER BY month
    """,
)
def c6_iceberg_v2_multi_field_spec(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C6: MULTI-FIELD hidden partition spec round-trip (VERDICT r12
    item 2) — Iceberg's ``PARTITIONED BY (days(ts), bucket(N, key))``
    shape, the layout real tables use to combine time pruning with
    key-lookup pruning (reference: the demo's Iceberg DDL partitions
    by one derived month column, ``csv_to_ice.py:25``; multi-field
    specs are the spec's generalization).

    The warehouse derives BOTH partition columns at write; the export
    emits a TWO-field v2 spec (``day`` + ``bucket[4]``, table-wide
    partition-field ids) with both derived names hidden from the
    schema; the spec reader prunes on EITHER source-column conjunct.
    In-query self-asserts: two-field spec exported, no schema leak, a
    key-equality read scans strictly fewer files than the full table
    AND returns exactly the rows a plain filter yields, and the
    half-year read prunes day files."""
    from apache_iceberg_demo_spark.io import load, scratch_dir
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    key = (_session_token(spark), sf_dir)
    if key not in _multi_spec_cache:
        root = scratch_dir("iceberg_multispec_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        o = load(spark, sf_dir, "orders").filter(
            (F.col("o_orderkey") % 20 == 0)
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        wh.create_or_replace(
            "t", o, partition_by="days(o_orderdate), bucket(4, o_custkey)"
        )
        location = export_iceberg_v2(wh, "t", os.path.join(root, "ice"))
        tmeta = _load_table_metadata(os.path.join(location, "metadata"))
        schema_names = {
            f["name"] for s in tmeta["schemas"] for f in s["fields"]
        }
        leaked = {"o_orderdate_days", "o_custkey_bucket"} & schema_names
        if leaked:
            raise AssertionError(
                f"hidden partition column(s) leaked into the exported "
                f"schema: {sorted(leaked)}"
            )
        transforms_used = {
            f["transform"]
            for s in tmeta["partition-specs"]
            for f in s["fields"]
        }
        if transforms_used != {"day", "bucket[4]"}:
            raise AssertionError(
                f"expected a two-field day+bucket[4] spec, "
                f"got {transforms_used}"
            )
        # deterministic probe key: MIN customer of the slice
        probe_key = int(o.agg(F.min("o_custkey")).first()[0])
        _multi_spec_cache[key] = (location, probe_key)
    location, probe_key = _multi_spec_cache[key]
    full = read_iceberg_v2(spark, location)
    n_full = len(full.inputFiles())
    # bucket-field pruning: the key-equality read must scan strictly
    # fewer files AND return exactly the plain-filter rows
    by_key = read_iceberg_v2(
        spark, location, where=f"o_custkey = {probe_key}"
    )
    n_key_files = len(by_key.inputFiles())
    if not (0 < n_key_files < n_full):
        raise AssertionError(
            f"bucket pruning did not bite: {n_key_files} of {n_full} "
            f"files scanned for the key-equality predicate"
        )
    n_by_key = by_key.count()
    n_expect = full.filter(F.col("o_custkey") == probe_key).count()
    if n_by_key != n_expect:
        raise AssertionError(
            f"bucket-pruned read returned {n_by_key} rows, "
            f"plain filter yields {n_expect}"
        )
    # day-field pruning on the returned half-year read
    filtered = read_iceberg_v2(
        spark, location, where="o_orderdate >= '1995-07-01'"
    )
    if not (0 < len(filtered.inputFiles()) < n_full):
        raise AssertionError("day pruning did not bite on the date read")
    return _keep_result(
        "c6_iceberg_v2_multi_field_spec",
        filtered.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("month"),
    )
