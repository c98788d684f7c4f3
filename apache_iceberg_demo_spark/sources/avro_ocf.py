"""Minimal Avro Object Container File (OCF) writer/reader, pure Python.

Why hand-rolled: the Iceberg v2 table spec stores manifest lists and
manifests as Avro OCF files. This container ships no ``avro``/``fastavro``
package and is offline, but the interop export (``iceberg_v2.py``) needs
REAL spec-shaped bytes, not JSON stand-ins. The Avro format is small and
fully public (Avro 1.11 specification: "Object Container Files" + "Binary
Encoding"); this module implements exactly the subset Iceberg metadata
uses: null / boolean / int / long / float / double / bytes / string
primitives, records, ``["null", X]``-style unions, arrays, maps, and
fixed — with the spec-default ``null`` codec or ``deflate`` (raw RFC-1951
via zlib).

Conformance is proven against an INDEPENDENT implementation: Spark's JVM
bundles the reference Java Avro library (``avro-1.12.1.jar``), and
``tests/test_iceberg_v2.py`` reads these bytes back through
``org.apache.avro.file.DataFileReader`` via py4j and compares values.

Reference parity: the reference demo's Iceberg tables are written by
Spark's bundled Iceberg libraries (``/root/reference/scripts/csv_to_ice.py``)
— their manifest files are this same OCF format.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- encoding


def _write_long(buf: bytearray, n: int) -> None:
    """Zigzag varint (Avro int and long share this encoding)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.extend(b)


class _SchemaEnv:
    """Named-type registry so record definitions can be referenced by name
    later in the same schema (Iceberg reuses e.g. ``r508``)."""

    def __init__(self) -> None:
        self.named: dict[str, dict] = {}

    def resolve(self, schema):
        if isinstance(schema, str) and schema in self.named:
            return self.named[schema]
        if isinstance(schema, dict) and schema.get("type") == "record":
            self.named[schema["name"]] = schema
        return schema


def _encode(schema, datum, buf: bytearray, env: _SchemaEnv) -> None:
    schema = env.resolve(schema)
    if isinstance(schema, list):  # union: pick the branch by datum
        if datum is None:
            idx = next(
                i for i, s in enumerate(schema) if s == "null"
            )
            _write_long(buf, idx)
            return
        idx, branch = next(
            (i, s) for i, s in enumerate(schema) if s != "null"
        )
        _write_long(buf, idx)
        _encode(branch, datum, buf, env)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.append(1 if datum else 0)
    elif t in ("int", "long"):
        _write_long(buf, int(datum))
    elif t == "float":
        buf.extend(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.extend(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(buf, bytes(datum))
    elif t == "string":
        _write_bytes(buf, datum.encode("utf-8"))
    elif t == "fixed":
        if len(datum) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.extend(datum)
    elif t == "record":
        env.resolve(schema)
        for f in schema["fields"]:
            if f["name"] in datum:
                val = datum[f["name"]]
            elif "default" in f:
                val = f["default"]
            else:
                raise KeyError(
                    f"record {schema['name']}: missing field {f['name']!r}"
                )
            _encode(f["type"], val, buf, env)
    elif t == "array":
        if datum:
            _write_long(buf, len(datum))
            for item in datum:
                _encode(schema["items"], item, buf, env)
        _write_long(buf, 0)
    elif t == "map":
        if datum:
            _write_long(buf, len(datum))
            for k, v in datum.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(schema["values"], v, buf, env)
        _write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(schema, r: _Reader, env: _SchemaEnv):
    schema = env.resolve(schema)
    if isinstance(schema, list):
        return _decode(schema[r.read_long()], r, env)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "record":
        env.resolve(schema)
        return {f["name"]: _decode(f["type"], r, env) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # size-prefixed block form
                r.read_long()
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], r, env))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], r, env)
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------- container


def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "null",
) -> int:
    """Write one OCF with a single data block; returns the file length.

    ``metadata`` adds extra header key-values (Iceberg stores the table
    schema / partition spec / format-version in manifest headers)."""
    env = _SchemaEnv()
    body = bytearray()
    for rec in records:
        _encode(schema, rec, body, env)
    raw = bytes(body)
    if codec == "deflate":
        # Avro deflate = raw RFC-1951 stream (no zlib wrapper/checksum)
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        raw = co.compress(raw) + co.flush()
    elif codec != "null":
        raise NotImplementedError(f"codec {codec!r}")

    header = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    meta.update(metadata or {})
    _write_long(header, len(meta))
    for k, v in meta.items():
        _write_bytes(header, k.encode("utf-8"))
        _write_bytes(header, v.encode("utf-8"))
    _write_long(header, 0)
    sync = os.urandom(16)
    header.extend(sync)

    block = bytearray()
    _write_long(block, len(records))
    _write_long(block, len(raw))
    block.extend(raw)
    block.extend(sync)

    with open(path, "wb") as f:
        f.write(bytes(header) + bytes(block))
    return os.path.getsize(path)


def read_ocf(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Read an OCF; returns (writer schema, header metadata, records)."""
    with open(path, "rb") as f:
        data = f.read()
    return read_ocf_bytes(data, label=path)


def read_ocf_bytes(
    data: bytes, label: str = "<bytes>"
) -> tuple[dict, dict[str, str], list[dict]]:
    """``read_ocf`` over in-memory bytes (executor-side manifest reads)."""
    path = label
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, str] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes().decode("utf-8", errors="replace")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    sync = r.read(16)
    env = _SchemaEnv()
    records: list[dict] = []
    while r.pos < len(data):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(schema, br, env))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return schema, meta, records
