#!/usr/bin/env python
"""Standalone Iceberg v2 ``metadata.json`` validator — a second,
independent consumer of the JSON metadata layer.

The Avro layer (manifest lists / manifests) is cross-validated against the
JVM's reference Avro implementation in tests/test_iceberg_v2.py; this tool
covers the layer above it: it walks ``metadata/version-hint.text`` →
``vN.metadata.json`` and checks the table metadata against the PUBLIC
Iceberg v2 table-spec rules (https://iceberg.apache.org/spec/, "Table
Metadata" + "Partition Specs" + "Snapshots" sections), written from the
spec text alone — it imports nothing from the exporter, so an exporter bug
cannot self-certify.

The preferred second consumer would be pyiceberg's metadata model, but no
wheel is obtainable in this container (re-verified 2026-08-16, round 14:
``pip download pyiceberg`` finds no distribution and DuckDB's
``INSTALL iceberg`` cannot reach extensions.duckdb.org — fully offline;
documented at apache_iceberg_demo_spark/sources/iceberg_v2.py:28-31).

Checks (each failure is one violation line):
- required top-level fields present with spec types;
- ``format-version`` == 2;
- schemas: struct type, unique schema-ids, unique field ids per schema,
  ``current-schema-id`` resolves, ``last-column-id`` >= every field id;
- partition specs: unique spec-ids, ``default-spec-id`` resolves, every
  field's ``source-id`` resolves in the current schema, transform known,
  partition field ids >= 1000 and unique ACROSS ALL SPECS (the
  lastAssignedPartitionId rule), ``last-partition-id`` >= max assigned;
- sort orders: ``default-sort-order-id`` resolves, directions/null-orders
  from the spec's enumerations, order 0 is the unsorted order;
- snapshots: unique ids, no self-parent (absent parents are expired
  ancestors, spec-legal), ``sequence-number`` present,
  non-decreasing along parent chains and <= ``last-sequence-number``,
  ``manifest-list`` URI resolves to an existing file (file scheme),
  ``summary.operation`` from the spec's enumeration, string-valued summary;
- ``current-snapshot-id`` resolves; ``snapshot-log`` entries resolve with
  non-decreasing timestamps; ``metadata-log`` files exist;
- refs: ``main`` exists, is a branch, and points at the current snapshot;
  every ref's snapshot resolves and ``type`` is branch|tag;
- ``--deep``: additionally opens every manifest list + manifest (Avro) and
  verifies manifest_length values against the real file sizes and that
  every referenced data/delete file exists with its recorded size; plus
  the delete-file rules from the spec's "Delete Formats" section:
  manifest ``content`` agrees with every entry's ``data_file.content``
  (data manifests carry only content=0 entries, delete manifests only
  1/2), equality-delete entries carry a non-empty ``equality_ids`` list
  while position-delete entries carry none, position-delete parquet files
  have exactly the reserved schema (``file_path`` string field-id
  2147483546, ``pos`` long field-id 2147483545) sorted by (path, pos)
  with every referenced path existing, and every parquet file's recorded
  ``record_count`` matches its parquet footer ``num_rows``; the column
  metric maps (``column_sizes``/``value_counts``/``null_value_counts``)
  are cross-checked against the footer (nulls <= values per field,
  column sizes bounded by the file length, flat-file value counts equal
  ``num_rows``, null-count multiset equals the footer statistics); and
  every data file's decoded ``lower_bounds``/``upper_bounds`` must
  CONTAIN the footer's recomputed min/max for int/long/float/double/
  string/decimal columns (decimal footer stats recovered from the raw
  unscaled values + schema scale) — a bound that excludes a stored
  value would make conformant readers silently skip matching rows.

Usage:  python tools/validate_iceberg_metadata.py LOCATION [--deep]
Exit 0 = conformant, 1 = violations (printed one per line).
"""

from __future__ import annotations

import json
import os
import sys

_TRANSFORMS = {"identity", "void", "year", "month", "day", "hour"}
_TRANSFORM_PREFIXES = ("bucket[", "truncate[")
_OPERATIONS = {"append", "replace", "overwrite", "delete"}
_PRIMITIVES = {
    "boolean", "int", "long", "float", "double", "date", "time",
    "timestamp", "timestamptz", "string", "uuid", "binary",
}


def _from_uri(uri: str) -> str:
    if uri.startswith("file:"):
        return "/" + uri[len("file:"):].lstrip("/")
    return uri


def _is_type(t) -> bool:
    if isinstance(t, str):
        return (
            t in _PRIMITIVES
            or t.startswith("decimal(")
            or t.startswith("fixed[")
        )
    if isinstance(t, dict):
        return t.get("type") in ("struct", "list", "map")
    return False


def validate(location: str, deep: bool = False) -> list[str]:
    """Return the list of spec violations (empty = conformant)."""
    v: list[str] = []
    mdir = os.path.join(_from_uri(location), "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            version = int(f.read().strip())
    else:
        # the hint is optional (HadoopTableOperations falls back to the
        # highest vN.metadata.json when a crashed writer never landed it)
        import re as _re

        versions = [
            int(m.group(1))
            for p in (os.listdir(mdir) if os.path.isdir(mdir) else [])
            if (m := _re.fullmatch(r"v(\d+)\.metadata\.json", p))
        ]
        if not versions:
            return [f"no version-hint.text and no vN.metadata.json in {mdir}"]
        version = max(versions)
    mpath = os.path.join(mdir, f"v{version}.metadata.json")
    if not os.path.exists(mpath):
        return [f"version-hint names v{version} but {mpath} is missing"]
    with open(mpath) as f:
        meta = json.load(f)

    def need(field: str, typ) -> bool:
        if field not in meta:
            v.append(f"missing required field {field!r}")
            return False
        if typ is not None and not isinstance(meta[field], typ):
            # bool is an int subclass in Python — reject it for int fields
            v.append(
                f"{field!r} has type {type(meta[field]).__name__}, "
                f"expected {getattr(typ, '__name__', typ)}"
            )
            return False
        if typ is int and isinstance(meta[field], bool):
            v.append(f"{field!r} is a boolean, expected int")
            return False
        return True

    if need("format-version", int) and meta["format-version"] != 2:
        v.append(f"format-version is {meta['format-version']}, expected 2")
    need("table-uuid", str)
    need("location", str)
    need("last-sequence-number", int)
    need("last-updated-ms", int)
    need("last-column-id", int)

    # ---- schemas
    schema_ids: set[int] = set()
    cur_field_ids: set[int] = set()
    if need("schemas", list) and need("current-schema-id", int):
        max_fid = 0
        for s in meta["schemas"]:
            sid = s.get("schema-id")
            if not isinstance(sid, int):
                v.append("schema without integer schema-id")
                continue
            if sid in schema_ids:
                v.append(f"duplicate schema-id {sid}")
            schema_ids.add(sid)
            if s.get("type") != "struct":
                v.append(f"schema {sid} type is {s.get('type')!r}, not struct")
            fids: set[int] = set()
            for f in s.get("fields", []):
                fid = f.get("id")
                if not isinstance(fid, int):
                    v.append(f"schema {sid}: field without integer id: {f}")
                    continue
                if fid in fids:
                    v.append(f"schema {sid}: duplicate field id {fid}")
                fids.add(fid)
                max_fid = max(max_fid, fid)
                if not isinstance(f.get("name"), str):
                    v.append(f"schema {sid} field {fid}: missing name")
                if not isinstance(f.get("required"), bool):
                    v.append(f"schema {sid} field {fid}: missing required flag")
                if not _is_type(f.get("type")):
                    v.append(
                        f"schema {sid} field {fid}: unknown type {f.get('type')!r}"
                    )
            if sid == meta["current-schema-id"]:
                cur_field_ids = fids
        if meta["current-schema-id"] not in schema_ids:
            v.append(
                f"current-schema-id {meta['current-schema-id']} not in schemas"
            )
        if isinstance(meta.get("last-column-id"), int) and max_fid > meta["last-column-id"]:
            v.append(
                f"last-column-id {meta['last-column-id']} < max field id {max_fid}"
            )

    # ---- partition specs
    spec_ids: set[int] = set()
    all_pfids: list[int] = []
    if need("partition-specs", list) and need("default-spec-id", int):
        for s in meta["partition-specs"]:
            sid = s.get("spec-id")
            if not isinstance(sid, int):
                v.append("partition spec without integer spec-id")
                continue
            if sid in spec_ids:
                v.append(f"duplicate spec-id {sid}")
            spec_ids.add(sid)
            for f in s.get("fields", []):
                pfid = f.get("field-id")
                if not isinstance(pfid, int):
                    v.append(f"spec {sid}: partition field without field-id: {f}")
                    continue
                if pfid < 1000:
                    v.append(f"spec {sid}: partition field id {pfid} < 1000")
                all_pfids.append(pfid)
                if cur_field_ids and f.get("source-id") not in cur_field_ids:
                    # source column may exist only in an older schema — spec
                    # allows it, but flag a source id found in NO schema
                    known = {
                        fld.get("id")
                        for sch in meta.get("schemas", [])
                        for fld in sch.get("fields", [])
                    }
                    if f.get("source-id") not in known:
                        v.append(
                            f"spec {sid}: source-id {f.get('source-id')} "
                            "not in any schema"
                        )
                t = f.get("transform", "")
                if t not in _TRANSFORMS and not t.startswith(_TRANSFORM_PREFIXES):
                    v.append(f"spec {sid}: unknown transform {t!r}")
                if not isinstance(f.get("name"), str):
                    v.append(f"spec {sid}: partition field without name")
        # field ids must be unique WITHIN each spec; across specs an id may
        # repeat only for the IDENTICAL field (same name/transform/source —
        # Java's PartitionSpec builder reuses the id when a spec evolution
        # keeps a field). Two DIFFERENT fields under one id would alias
        # manifest partition data.
        field_by_id: dict = {}
        for s in meta.get("partition-specs", []):
            in_spec: set = set()
            for f in s.get("fields", []):
                pfid = f.get("field-id")
                if not isinstance(pfid, int):
                    continue
                if pfid in in_spec:
                    v.append(
                        f"spec {s.get('spec-id')}: duplicate partition "
                        f"field id {pfid} within one spec"
                    )
                in_spec.add(pfid)
                ident = (
                    f.get("name"), f.get("transform"), f.get("source-id")
                )
                if field_by_id.setdefault(pfid, ident) != ident:
                    v.append(
                        f"partition field id {pfid} bound to two different "
                        f"fields across specs: {field_by_id[pfid]} vs {ident}"
                    )
        if meta["default-spec-id"] not in spec_ids:
            v.append(f"default-spec-id {meta['default-spec-id']} not in specs")
        if need("last-partition-id", int):
            if all_pfids and meta["last-partition-id"] < max(all_pfids):
                v.append(
                    f"last-partition-id {meta['last-partition-id']} < max "
                    f"assigned partition field id {max(all_pfids)}"
                )

    # ---- sort orders
    if need("sort-orders", list) and need("default-sort-order-id", int):
        order_ids = set()
        for o in meta["sort-orders"]:
            oid = o.get("order-id")
            if not isinstance(oid, int):
                v.append("sort order without integer order-id")
                continue
            if oid in order_ids:
                v.append(f"duplicate sort order-id {oid}")
            order_ids.add(oid)
            if oid == 0 and o.get("fields"):
                v.append("sort order 0 must be the unsorted order (no fields)")
            for f in o.get("fields", []):
                if f.get("direction") not in ("asc", "desc"):
                    v.append(f"sort order {oid}: bad direction {f.get('direction')!r}")
                if f.get("null-order") not in ("nulls-first", "nulls-last"):
                    v.append(f"sort order {oid}: bad null-order {f.get('null-order')!r}")
        if meta["default-sort-order-id"] not in order_ids:
            v.append(
                f"default-sort-order-id {meta['default-sort-order-id']} "
                "not in sort-orders"
            )

    # ---- snapshots
    snap_ids: set[int] = set()
    seq_by_id: dict[int, int] = {}
    if need("snapshots", list):
        for s in meta["snapshots"]:
            sid = s.get("snapshot-id")
            if not isinstance(sid, int):
                v.append("snapshot without integer snapshot-id")
                continue
            if sid in snap_ids:
                v.append(f"duplicate snapshot-id {sid}")
            snap_ids.add(sid)
            if not isinstance(s.get("timestamp-ms"), int):
                v.append(f"snapshot {sid}: missing timestamp-ms")
            seq = s.get("sequence-number")
            if not isinstance(seq, int):
                v.append(f"snapshot {sid}: missing sequence-number (v2 required)")
            else:
                seq_by_id[sid] = seq
                if isinstance(meta.get("last-sequence-number"), int) and (
                    seq > meta["last-sequence-number"]
                ):
                    v.append(
                        f"snapshot {sid}: sequence-number {seq} > "
                        f"last-sequence-number {meta['last-sequence-number']}"
                    )
            ml = s.get("manifest-list")
            if not isinstance(ml, str):
                v.append(f"snapshot {sid}: missing manifest-list")
            elif ml.startswith("file:") and not os.path.exists(_from_uri(ml)):
                v.append(f"snapshot {sid}: manifest-list {ml} does not exist")
            summary = s.get("summary")
            if not isinstance(summary, dict) or "operation" not in summary:
                v.append(f"snapshot {sid}: summary.operation missing")
            else:
                if summary["operation"] not in _OPERATIONS:
                    v.append(
                        f"snapshot {sid}: unknown operation "
                        f"{summary['operation']!r}"
                    )
                bad = {
                    k: x for k, x in summary.items() if not isinstance(x, str)
                }
                if bad:
                    v.append(f"snapshot {sid}: non-string summary values {bad}")
            if "schema-id" in s and s["schema-id"] not in schema_ids:
                v.append(f"snapshot {sid}: schema-id {s['schema-id']} unknown")
        for s in meta["snapshots"]:
            par = s.get("parent-snapshot-id")
            sid = s.get("snapshot-id")
            if par is None:
                continue
            if par == sid:
                v.append(f"snapshot {sid}: is its own parent")
            elif par not in snap_ids:
                # spec-legal: expireSnapshots removes ancestors but
                # children KEEP their parent-snapshot-id (Java leaves the
                # pointer dangling; readers must tolerate it) — an absent
                # parent is an expired one, not a violation
                pass
            elif (
                sid in seq_by_id
                and par in seq_by_id
                and seq_by_id[sid] < seq_by_id[par]
            ):
                v.append(
                    f"snapshot {sid}: sequence-number {seq_by_id[sid]} < "
                    f"parent's {seq_by_id[par]}"
                )

    if need("current-snapshot-id", int) and meta["current-snapshot-id"] not in snap_ids:
        v.append(
            f"current-snapshot-id {meta['current-snapshot-id']} not in snapshots"
        )

    # ---- logs
    if need("snapshot-log", list):
        prev_ts = None
        for e in meta["snapshot-log"]:
            if e.get("snapshot-id") not in snap_ids:
                v.append(f"snapshot-log references unknown {e.get('snapshot-id')}")
            ts = e.get("timestamp-ms")
            if prev_ts is not None and isinstance(ts, int) and ts < prev_ts:
                v.append("snapshot-log timestamps decrease")
            prev_ts = ts if isinstance(ts, int) else prev_ts
    if need("metadata-log", list):
        for e in meta["metadata-log"]:
            mf = e.get("metadata-file", "")
            if mf.startswith("file:") and not os.path.exists(_from_uri(mf)):
                v.append(f"metadata-log file {mf} does not exist")

    # ---- refs
    if need("refs", dict):
        refs = meta["refs"]
        if "main" not in refs:
            v.append("refs has no 'main' branch")
        else:
            main = refs["main"]
            if main.get("type") != "branch":
                v.append("refs.main is not a branch")
            if main.get("snapshot-id") != meta.get("current-snapshot-id"):
                v.append(
                    "refs.main snapshot-id "
                    f"{main.get('snapshot-id')} != current-snapshot-id "
                    f"{meta.get('current-snapshot-id')}"
                )
        for rname, r in refs.items():
            if r.get("type") not in ("branch", "tag"):
                v.append(f"ref {rname!r}: bad type {r.get('type')!r}")
            if r.get("snapshot-id") not in snap_ids:
                v.append(f"ref {rname!r}: snapshot {r.get('snapshot-id')} unknown")

    if "properties" in meta and not all(
        isinstance(k, str) and isinstance(x, str)
        for k, x in meta["properties"].items()
    ):
        v.append("properties must be a string->string map")

    if deep and not v:
        v.extend(_deep_walk(meta))
    return v


def _deep_walk(meta: dict) -> list[str]:
    """Open every manifest list + manifest and verify recorded lengths and
    referenced file existence against the filesystem."""
    # read_ocf is the repo's own Avro reader — acceptable here because the
    # Avro BYTES are independently cross-validated by the JVM reference
    # implementation in tests; deep mode only adds filesystem facts.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from apache_iceberg_demo_spark.sources.avro_ocf import read_ocf

    v: list[str] = []
    for s in meta.get("snapshots", []):
        ml = _from_uri(s["manifest-list"])
        try:
            _, _, mfs = read_ocf(ml)
        except Exception as e:  # pragma: no cover - corrupt container
            v.append(f"snapshot {s['snapshot-id']}: unreadable manifest list: {e}")
            continue
        for mf in mfs:
            mp = _from_uri(mf["manifest_path"])
            if not os.path.exists(mp):
                v.append(f"manifest {mf['manifest_path']} does not exist")
                continue
            real = os.path.getsize(mp)
            if mf["manifest_length"] != real:
                v.append(
                    f"manifest {mp}: recorded length {mf['manifest_length']} "
                    f"!= real {real}"
                )
            try:
                _, _, entries = read_ocf(mp)
            except Exception as e:  # pragma: no cover
                v.append(f"unreadable manifest {mp}: {e}")
                continue
            m_content = mf.get("content", 0)
            v.extend(_check_partition_summaries(meta, mf, mp, entries))
            for e in entries:
                d = e["data_file"]
                fp = _from_uri(d["file_path"])
                if not os.path.exists(fp):
                    v.append(f"data file {d['file_path']} does not exist")
                    continue
                if d["file_size_in_bytes"] != os.path.getsize(fp):
                    v.append(
                        f"data file {fp}: recorded size "
                        f"{d['file_size_in_bytes']} != real {os.path.getsize(fp)}"
                    )
                # spec "Manifests": a manifest stores data files OR delete
                # files, declared by the manifest-list content field
                f_content = d.get("content", 0)
                if m_content == 0 and f_content != 0:
                    v.append(
                        f"data manifest {mp} carries a delete entry "
                        f"(data_file.content={f_content}) for {fp}"
                    )
                if m_content == 1 and f_content not in (1, 2):
                    v.append(
                        f"delete manifest {mp} carries a data entry "
                        f"(data_file.content={f_content}) for {fp}"
                    )
                eq_ids = d.get("equality_ids")
                if f_content == 2 and not eq_ids:
                    v.append(f"equality-delete file {fp} has no equality_ids")
                if f_content == 1 and eq_ids:
                    v.append(
                        f"position-delete file {fp} carries equality_ids "
                        f"{eq_ids} (spec: position deletes have none)"
                    )
                v.extend(_check_parquet_file(fp, d, f_content))
                if f_content == 0:
                    v.extend(_check_data_file_bounds(fp, d, meta))
    return v


def _check_data_file_bounds(fp: str, d: dict, meta: dict) -> list[str]:
    """Deep check: a data file's decoded lower/upper bounds must CONTAIN
    the parquet footer's recomputed min/max (spec: bounds are inclusive;
    string bounds may legally be truncated prefixes, so containment —
    not equality — is the sound direction). Covered where recomputable:
    int, long, float, double, string, and decimal (decimal footer
    min/max recovered from the raw unscaled stats + schema scale, the
    parquet-format rule — pyarrow cannot cast them). A bound that LIES
    (excludes a stored value) makes conformant readers skip matching
    rows, the worst silent failure an exporter can ship."""
    import decimal as _dec
    import json as _json

    import pyarrow.parquet as pq

    lower = {kv["key"]: kv["value"] for kv in d.get("lower_bounds") or []}
    upper = {kv["key"]: kv["value"] for kv in d.get("upper_bounds") or []}
    fids = set(lower) & set(upper)
    if not fids:
        return []
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from apache_iceberg_demo_spark.sources.iceberg_v2 import try_bound_value

    types_by_id: dict[int, str] = {}
    names_by_id: dict[int, list] = {}
    for sch in meta.get("schemas", []):
        for f in sch.get("fields", []):
            types_by_id.setdefault(f["id"], f["type"])
            names_by_id.setdefault(f["id"], [])
            if f["name"] not in names_by_id[f["id"]]:
                names_by_id[f["id"]].append(f["name"])
    try:
        nm = _json.loads(
            meta.get("properties", {}).get("schema.name-mapping.default", "[]")
        )
        for m in nm:
            for n in m.get("names", []):
                names_by_id.setdefault(m["field-id"], [])
                if n not in names_by_id[m["field-id"]]:
                    names_by_id[m["field-id"]].append(n)
    except (ValueError, KeyError, TypeError):
        pass
    try:
        md = pq.read_metadata(fp)
    except Exception:
        return []  # unreadable already reported upstream
    footer: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            nmcol = c.path_in_schema
            if "." in nmcol:
                continue
            try:
                mn, mx = st.min, st.max
            except Exception:
                # decimal-annotated stats: raw unscaled + schema scale
                try:
                    lt = _json.loads(
                        md.schema.column(ci).logical_type.to_json()
                    )
                except Exception:
                    continue
                if lt.get("Type") != "Decimal":
                    continue
                sc = int(lt.get("scale", 0))

                def _unscaled(b):
                    if isinstance(b, bytes):
                        return int.from_bytes(b, "big", signed=True)
                    return int(b)

                try:
                    mn = _dec.Decimal(_unscaled(st.min_raw)).scaleb(-sc)
                    mx = _dec.Decimal(_unscaled(st.max_raw)).scaleb(-sc)
                except Exception:
                    continue
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue
            if nmcol in footer:
                footer[nmcol] = [min(footer[nmcol][0], mn),
                                 max(footer[nmcol][1], mx)]
            else:
                footer[nmcol] = [mn, mx]
    v: list[str] = []
    for fid in sorted(fids):
        t = types_by_id.get(fid)
        if t is None or not isinstance(t, str):
            continue
        if not (t in ("int", "long", "float", "double", "string")
                or t.startswith("decimal(")):
            continue  # date/timestamp/bool bounds not recomputable here
        col = next(
            (n for n in names_by_id.get(fid, []) if n in footer), None
        )
        if col is None:
            continue
        lb = try_bound_value(t, lower[fid])
        ub = try_bound_value(t, upper[fid])
        if lb is None or ub is None:
            continue  # foreign serialization: not comparable
        mn, mx = footer[col]
        try:
            same_kind = (
                isinstance(lb, str) == isinstance(mn, str)
                and isinstance(lb, _dec.Decimal) == isinstance(mn, _dec.Decimal)
            )
            if not same_kind:
                continue
            if isinstance(mn, float) and mn != mn:
                continue  # NaN footer stats: not orderable
            if mn < lb or mx > ub:
                v.append(
                    f"{fp}: column {col} (fid {fid}) bounds "
                    f"[{lb!r}, {ub!r}] do not contain footer min/max "
                    f"[{mn!r}, {mx!r}]"
                )
        except TypeError:
            continue
    return v


#: Reserved field ids for the position-delete schema (spec "Position
#: Delete Files").
_POS_PATH_FID = 2147483546
_POS_POS_FID = 2147483545


def _check_partition_summaries(
    meta: dict, mf: dict, mp: str, entries: list
) -> list[str]:
    """Manifest-list field summaries vs the manifest's actual partition
    values: contains_null must be exact, and every non-null value of an
    identity field must fall inside [lower_bound, upper_bound]."""
    summaries = mf.get("partitions")
    if not summaries or mf.get("content", 0) != 0:
        return []
    spec = next(
        (
            s for s in meta.get("partition-specs", [])
            if s["spec-id"] == mf["partition_spec_id"]
        ),
        None,
    )
    if spec is None:
        return [f"manifest {mp}: unknown partition_spec_id {mf['partition_spec_id']}"]
    if len(summaries) != len(spec["fields"]):
        return [
            f"manifest {mp}: {len(summaries)} partition summaries for a "
            f"{len(spec['fields'])}-field spec"
        ]
    types_by_id: dict[int, str] = {}
    for sch in meta.get("schemas", []):
        for f in sch.get("fields", []):
            types_by_id.setdefault(f["id"], f["type"])
    # single-value deserialization for the bound comparison
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from apache_iceberg_demo_spark.sources.iceberg_v2 import (
        bound_bytes,
        try_bound_value,
    )
    from apache_iceberg_demo_spark.sources.transforms import (
        spec_name_to_transform,
    )

    v: list[str] = []
    for fld, summ in zip(spec["fields"], summaries):
        nm = fld["name"]
        vals = [e["data_file"]["partition"].get(nm) for e in entries]
        has_null = any(x is None for x in vals)
        if bool(summ["contains_null"]) != has_null:
            v.append(
                f"manifest {mp}: partitions[{nm}].contains_null="
                f"{summ['contains_null']} but entries say {has_null}"
            )
        nonnull = [x for x in vals if x is not None]
        lb, ub = summ.get("lower_bound"), summ.get("upper_bound")
        src_t = types_by_id.get(fld["source-id"])
        if not nonnull or src_t is None or not isinstance(src_t, str):
            continue
        # entry partition values (and summary bounds) live in the
        # transform's RESULT type space — day → int days serialized as
        # date, month/year/hour/bucket → int, truncate/identity → source
        tf = spec_name_to_transform(fld.get("transform", "identity"))
        if tf is None:
            continue  # void/foreign transform: values not comparable here
        t = tf.result_type(src_t)
        # bounds are OPTIONAL in the spec — require them only when this
        # exporter's serialization covers the type AND the actual values
        # (probe via bound_bytes; e.g. timestamps never serialize here,
        # and a decimal value outside its scale doesn't either). A
        # missing-bounds report for an unserializable type was the
        # ADVICE-r11 false positive on date-partitioned tables.
        serializable = all(bound_bytes(t, x) is not None for x in nonnull)
        if lb is None or ub is None:
            if serializable:
                v.append(
                    f"manifest {mp}: partitions[{nm}] has values but no bounds"
                )
            continue
        lo, hi = try_bound_value(t, lb), try_bound_value(t, ub)
        if lo is None or hi is None:
            # foreign serialization (e.g. a Java-Iceberg bound type this
            # validator can't decode): skip the comparison, never crash
            continue
        # compare in decoded space: round-trip each entry value through
        # the same serialization so types always match (a date partition
        # value arrives as an Avro string; decoded bounds are ISO strings)
        bad = []
        for x in nonnull:
            bx = bound_bytes(t, x)
            cx = try_bound_value(t, bx) if bx is not None else None
            if cx is not None and (cx < lo or cx > hi):
                bad.append(x)
        if bad:
            v.append(
                f"manifest {mp}: partitions[{nm}] bounds [{lo}, {hi}] "
                f"do not cover {bad[:3]}"
            )
    return v


def _kv(entry_map) -> dict[int, int]:
    """Iceberg's array<record{key,value}> map form -> python dict."""
    return {r["key"]: r["value"] for r in (entry_map or [])}


def _check_column_metrics(fp: str, d: dict, md) -> list[str]:
    """Spec "Data File" metric maps vs the parquet footer. Checks that are
    sound for ANY table: null_value_counts <= value_counts per field id,
    and sum(column_sizes) <= the file's byte length (column chunks are
    disjoint byte ranges). For all-flat files (no nested paths — then
    every column's footer num_values equals num_rows by definition-level
    encoding): every value_counts entry must equal num_rows, and when the
    footer has complete statistics the null_value_counts multiset must
    match the footer's null counts."""
    v: list[str] = []
    sizes, vals, nulls = (
        _kv(d.get("column_sizes")),
        _kv(d.get("value_counts")),
        _kv(d.get("null_value_counts")),
    )
    if not (sizes or vals or nulls):
        return v
    for fid, nn in nulls.items():
        if fid in vals and nn > vals[fid]:
            v.append(
                f"{fp}: null_value_counts[{fid}]={nn} > "
                f"value_counts[{fid}]={vals[fid]}"
            )
    if sizes and sum(sizes.values()) > os.path.getsize(fp):
        v.append(
            f"{fp}: sum(column_sizes)={sum(sizes.values())} exceeds the "
            f"file's {os.path.getsize(fp)} bytes"
        )
    offs = d.get("split_offsets")
    if offs is not None:
        if offs != sorted(offs):
            v.append(f"{fp}: split_offsets not ascending: {offs}")
        if len(offs) != md.num_row_groups:
            v.append(
                f"{fp}: {len(offs)} split_offsets for {md.num_row_groups} "
                f"row groups"
            )
        fsz = os.path.getsize(fp)
        if any(o < 4 or o >= fsz for o in offs):
            v.append(
                f"{fp}: split_offsets {offs} outside the file body "
                f"(4..{fsz})"
            )
    leaf_paths = [
        md.row_group(0).column(ci).path_in_schema
        for ci in range(md.row_group(0).num_columns)
    ] if md.num_row_groups else []
    if any("." in p for p in leaf_paths):
        return v  # nested: per-column binding needs field ids, skip
    for fid, nv in vals.items():
        if nv != md.num_rows:
            v.append(
                f"{fp}: value_counts[{fid}]={nv} != num_rows {md.num_rows} "
                f"(flat file: every column stores one value per row)"
            )
    if nulls and len(nulls) == len(leaf_paths):
        footer_nulls: list[int] = []
        complete = True
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                st = g.column(ci).statistics
                if st is None or st.null_count is None:
                    complete = False
        if complete:
            per_col: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    per_col[c.path_in_schema] = (
                        per_col.get(c.path_in_schema, 0)
                        + c.statistics.null_count
                    )
            footer_nulls = sorted(per_col.values())
            if sorted(nulls.values()) != footer_nulls:
                v.append(
                    f"{fp}: null_value_counts {sorted(nulls.values())} != "
                    f"footer null counts {footer_nulls}"
                )
    return v


def _check_parquet_file(fp: str, d: dict, f_content: int) -> list[str]:
    """Footer-level checks: recorded record_count vs parquet num_rows, and
    the reserved position-delete schema (names, types, field ids, sort
    order, referenced paths exist)."""
    if d.get("file_format", "PARQUET").upper() != "PARQUET":
        return []
    import pyarrow.parquet as pq

    v: list[str] = []
    try:
        md = pq.read_metadata(fp)
    except Exception as e:  # pragma: no cover - corrupt file
        return [f"unreadable parquet {fp}: {e}"]
    if md.num_rows != d["record_count"]:
        v.append(
            f"{fp}: recorded record_count {d['record_count']} != parquet "
            f"footer num_rows {md.num_rows}"
        )
    v.extend(_check_column_metrics(fp, d, md))
    if f_content != 1:
        return v
    sch = pq.read_schema(fp)
    want = [("file_path", "string", _POS_PATH_FID), ("pos", "int64", _POS_POS_FID)]
    if sch.names != [w[0] for w in want]:
        return v + [
            f"position-delete file {fp}: schema {sch.names} != "
            f"['file_path', 'pos']"
        ]
    for fld, (nm, typ, fid) in zip(sch, want):
        if str(fld.type) != typ:
            v.append(f"position-delete {fp}: {nm} has type {fld.type}, not {typ}")
        meta = fld.metadata or {}
        got = meta.get(b"PARQUET:field_id")
        if got is None or int(got) != fid:
            v.append(
                f"position-delete {fp}: {nm} field-id "
                f"{None if got is None else int(got)} != reserved {fid}"
            )
    tbl = pq.read_table(fp)
    pairs = list(zip(tbl.column("file_path").to_pylist(),
                     tbl.column("pos").to_pylist()))
    if pairs != sorted(pairs):
        v.append(f"position-delete {fp}: rows not sorted by (file_path, pos)")
    for ref in sorted({p for p, _ in pairs}):
        if not os.path.exists(_from_uri(ref)):
            v.append(f"position-delete {fp} references missing file {ref}")
    return v


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 2
    deep = "--deep" in argv
    location = [a for a in argv if not a.startswith("--")][0]
    violations = validate(location, deep=deep)
    if violations:
        for line in violations:
            print(f"VIOLATION: {line}")
        print(f"{len(violations)} violation(s)")
        return 1
    print(f"OK: {location} conforms to the Iceberg v2 table-metadata rules")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
