"""Iceberg partition transforms (public spec, "Partition Transforms" +
Appendix B "32-bit Hash Requirements").

The warehouse writes hidden-partitioned tables by materializing a derived
partition column at write time (``Warehouse._apply_transform``); this
module holds the spec-conformant pieces shared by the writer, the v2
exporter (``sources/iceberg_v2.py``), the spec reader's pruning, and the
standalone metadata validator:

- ``murmur3_32`` — MurmurHash3 x86 32-bit, seed 0, the exact function the
  spec mandates for ``bucket[N]``; pinned against the spec's published
  test vectors (int 34 → 2017239379, string "iceberg" → 1210000089,
  date 2017-11-16 → -653330422, …) in tests/test_iceberg_v2.py. An
  engine that buckets with any other hash (Spark's ``F.hash`` is
  murmur3 with seed 42 and different byte layouts; ``xxhash64`` is a
  different function entirely) would make FOREIGN readers prune the
  wrong files — conformance here is a correctness requirement, not
  style.
- ``bucket_value`` — spec byte layouts per source type + the
  ``(hash & Integer.MAX_VALUE) % N`` projection.
- ``parse_spec`` — ``"days(ts)"`` / ``"bucket(16, id)"`` /
  ``"truncate(4, col)"`` / plain-column spec strings → a Transform
  record carrying the spec-facing transform name (``day``,
  ``bucket[16]``, ``truncate[4]``, ``identity``), the derived column
  name, and the result type rule.
- ``partition_value_to_spec`` — the warehouse's human-readable hive dir
  value (``"1995-03"``) → the spec's result-typed value (int months
  since epoch), used when exporting manifests.
- ``prune_disjoint`` — conservative transformed-space pruning: given a
  simple conjunct on the SOURCE column and a manifest/file's partition
  bound range in transformed space, decide whether no row can match.
  Monotonic transforms (day/month/year/hour/truncate) map inequalities
  through; bucket prunes equality only.
"""

from __future__ import annotations

import datetime
import decimal
import re
import struct
from dataclasses import dataclass
from typing import Optional

_EPOCH = datetime.date(1970, 1, 1)


# ----------------------------------------------------------- murmur3


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (public domain algorithm), SIGNED int32
    result — the spec's required hash for bucket transforms."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def min_signed_bytes(n: int) -> bytes:
    """MINIMAL-length big-endian two's complement — the spec's decimal
    serialization for both bucket hashing and bounds. The naive
    ``(bit_length()+8)//8`` emits a redundant 0xFF byte for negative
    powers of two (-128 → ``ff80`` instead of ``80``), which changes the
    murmur3 hash a conformant reader computes."""
    if n >= 0:
        length = n.bit_length() // 8 + 1
    else:
        length = (-n - 1).bit_length() // 8 + 1
    return n.to_bytes(length, "big", signed=True)


def _bucket_bytes(value) -> Optional[bytes]:
    """Spec Appendix B byte layouts: int/long/date/time/timestamp hash as
    the 8-byte little-endian LONG; string as UTF-8; decimal as the
    minimal big-endian two's-complement unscaled value."""
    if isinstance(value, bool) or value is None:
        return None
    if isinstance(value, int):
        return struct.pack("<q", value)
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, datetime.datetime):
        # hash the UTC INSTANT: an aware value's offset must not cancel
        # (epoch in the value's own tz would hash the local wall clock);
        # micros via exact integer arithmetic — float total_seconds()
        # truncates beyond 2^53 µs
        if value.tzinfo is not None:
            epoch = datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc
            )
        else:
            epoch = datetime.datetime(1970, 1, 1)
        td = value - epoch
        micros = (
            td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
        )
        return struct.pack("<q", micros)
    if isinstance(value, datetime.date):
        return struct.pack("<q", (value - _EPOCH).days)
    if isinstance(value, decimal.Decimal):
        unscaled = int(value.scaleb(-value.as_tuple().exponent))
        return min_signed_bytes(unscaled)
    return None


def bucket_value(value, n: int) -> Optional[int]:
    """Iceberg ``bucket[N]``: ``(murmur3(v) & Integer.MAX_VALUE) % N``;
    None for null or an unhashable source type (including an int64-range
    overflow — a literal no stored value can equal must simply not
    prune, never crash the read). Accepts numpy scalars / NaN / NaT as
    delivered by Arrow-batched pandas UDFs."""
    try:
        import numpy as np

        if isinstance(value, np.generic):
            value = value.item()
    except ImportError:
        pass
    try:
        if value != value:  # pandas null: float NaN, and NaT (datetime-ish)
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(value, float) and value.is_integer():
        value = int(value)
    try:
        b = _bucket_bytes(value)
    except (struct.error, OverflowError, ValueError):
        return None
    if b is None:
        return None
    return (murmur3_32(b) & 0x7FFFFFFF) % int(n)


def bucket_udf(n: int):
    """Arrow-OPTIMIZED udf computing ``bucket[n]`` of a column (not a
    pandas UDF): Arrow hands the worker exact Python values — int, str,
    datetime, Decimal, or None. The previous pandas_udf was SILENTLY
    WRONG for int64 sources ≥ 2^53 whenever a NULL shared the batch:
    Arrow→pandas turns nullable int64 into float64, the value collapses
    one ulp before ``bucket_value`` ever runs, and the row routes to the
    WRONG bucket (r14 probe: ``k = 2^53+1`` read returned nothing).
    Write-path only; transfer stays Arrow-batched."""
    from pyspark.sql.functions import udf

    return udf(lambda v: bucket_value(v, n), "int", useArrow=True)


# ----------------------------------------------------------- spec parse


@dataclass(frozen=True)
class Transform:
    """One parsed partition-spec term."""

    kind: str            # identity | day | month | year | hour | bucket | truncate
    source: str          # source column name
    param: Optional[int]  # N for bucket, W for truncate, else None
    derived: str         # the warehouse's materialized column name

    @property
    def spec_name(self) -> str:
        """The transform string the Iceberg spec JSON uses."""
        if self.kind == "bucket":
            return f"bucket[{self.param}]"
        if self.kind == "truncate":
            return f"truncate[{self.param}]"
        return self.kind

    def result_type(self, source_ice_type: str) -> str:
        """Iceberg result type of the transform (spec table): day → date,
        month/year/hour/bucket → int, identity/truncate → source type."""
        if self.kind == "day":
            return "date"
        if self.kind in ("month", "year", "hour", "bucket"):
            return "int"
        return source_ice_type


#: warehouse spec-string function → spec transform kind. Both the
#: warehouse's plural spellings (days/months/…, matching Spark's
#: partitioning functions) and Iceberg's own singular names are accepted.
_FN_TO_KIND = {
    "days": "day",
    "day": "day",
    "months": "month",
    "month": "month",
    "years": "year",
    "year": "year",
    "hours": "hour",
    "hour": "hour",
    "bucket": "bucket",
    "truncate": "truncate",
}


def parse_spec(spec: Optional[str]) -> Optional[Transform]:
    """Parse one warehouse partition-spec string. Plain column → identity;
    unknown function names raise (same contract as _apply_transform)."""
    if spec is None:
        return None
    spec = spec.strip()
    if "(" not in spec:
        return Transform("identity", spec, None, spec)
    fn, arg = spec.split("(", 1)
    fn, arg = fn.strip(), arg.rstrip(")").strip()
    kind = _FN_TO_KIND.get(fn)
    if kind is None:
        raise ValueError(f"unknown partition transform {spec!r}")
    if kind in ("bucket", "truncate"):
        n, col = [a.strip() for a in arg.split(",")]
        suffix = "bucket" if kind == "bucket" else "trunc"
        return Transform(kind, col, int(n), f"{col}_{suffix}")
    # derived name normalized to the plural suffix regardless of which
    # spelling the spec used ("day(ts)" and "days(ts)" are one layout)
    return Transform(kind, arg, None, f"{arg}_{kind}s")


def term_str(tr: Transform) -> str:
    """Serialize one Transform back to the warehouse spec-string form
    (plural time spellings, param-first bucket/truncate) — the inverse
    of ``parse_spec`` up to spelling normalization."""
    if tr.kind == "identity":
        return tr.source
    if tr.kind in ("bucket", "truncate"):
        return f"{tr.kind}({tr.param}, {tr.source})"
    return f"{tr.kind}s({tr.source})"


def split_spec_terms(spec: Optional[str]) -> list[str]:
    """Split a multi-term partition spec string on TOP-LEVEL commas only —
    ``"days(ts), bucket(16, user_id)"`` → two terms; the comma inside
    ``bucket(16, user_id)`` is not a separator. Whitespace-trimmed, empty
    terms dropped."""
    if spec is None:
        return []
    terms, depth, cur = [], 0, []
    for ch in str(spec):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            terms.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    terms.append("".join(cur).strip())
    return [t for t in terms if t]


def parse_spec_list(spec) -> list[Transform]:
    """Parse a partition spec into its Transform terms. Accepts a single
    term, a comma-joined multi-term string (Iceberg's
    ``PARTITIONED BY (days(ts), bucket(16, id))`` shape), or a list of
    term strings. Duplicate derived column names raise — two spec fields
    may not share a partition directory."""
    if spec is None:
        return []
    terms = (
        [t for s in spec for t in split_spec_terms(str(s))]
        if isinstance(spec, (list, tuple))
        else split_spec_terms(str(spec))
    )
    out = [parse_spec(t) for t in terms]
    seen: set[str] = set()
    for tr in out:
        if tr.derived in seen:
            raise ValueError(
                f"partition spec {spec!r}: duplicate derived column "
                f"{tr.derived!r}"
            )
        seen.add(tr.derived)
    return out


def spec_name_to_transform(
    spec_name: str, source: str = "", derived: str = ""
) -> Optional[Transform]:
    """Inverse of ``Transform.spec_name`` for reader/validator use:
    ``"bucket[16]"`` → Transform. None for void/unknown (callers must
    treat unknown transforms as un-pruneable, never as identity)."""
    if spec_name == "identity":
        return Transform("identity", source, None, derived or source)
    for kind in ("bucket", "truncate"):
        if spec_name.startswith(kind + "[") and spec_name.endswith("]"):
            try:
                param = int(spec_name[len(kind) + 1:-1])
            except ValueError:
                return None
            return Transform(kind, source, param, derived)
    if spec_name in ("day", "month", "year", "hour"):
        return Transform(spec_name, source, None, derived)
    return None


# ------------------------------------------------- value conversions


def partition_value_to_spec(tr: Transform, raw: str, source_ice_type: str):
    """Hive-dir partition value (always a string, the warehouse's
    human-readable form) → the spec's result-typed value for manifests:
    day ``"1995-03-04"`` → days since epoch, month ``"1995-03"`` →
    months since epoch, year ``"1995"`` → years since 1970, hour
    ``"1995-03-04-07"`` → hours since epoch, bucket → int as-is,
    truncate → int/long parsed, other source types kept as written.
    ``None`` passes through (null partition value)."""
    if raw is None:
        return None
    if tr.kind == "identity":
        return raw
    if tr.kind == "day":
        return (datetime.date.fromisoformat(raw) - _EPOCH).days
    if tr.kind == "month":
        y, m = int(raw[0:4]), int(raw[5:7])
        return (y - 1970) * 12 + (m - 1)
    if tr.kind == "year":
        return int(raw) - 1970
    if tr.kind == "hour":
        d = datetime.date.fromisoformat(raw[:10])
        return ((d - _EPOCH).days * 24) + int(raw[11:13])
    if tr.kind == "bucket":
        return int(raw)
    if tr.kind == "truncate":
        # accepts Iceberg names AND Spark spellings (the warehouse-native
        # pruner passes Spark-JSON types — "integer", not "int")
        if source_ice_type in _INT_TYPES:
            return int(raw)
        return raw
    raise ValueError(f"unconvertible transform {tr.kind}")


#: integer source-type spellings across Iceberg ("int"/"long"), Spark
#: simpleString ("bigint"/"smallint"/"tinyint"), and Spark JSON ("integer")
_INT_TYPES = frozenset(
    {"int", "integer", "long", "bigint", "smallint", "tinyint"}
)


def _exact_int_literal(v) -> Optional[int]:
    """Parse a predicate literal as an EXACT int, or None (no prune).
    Quoted literals parse through int() (arbitrary precision); numeric
    literals arrive as float64 from the conjunct parser, which silently
    rounds past 2^53 — a rounded key would truncate/bucket to the wrong
    partition and unsoundly prune (found by the r12 hypothesis property
    test on a 2^54-scale literal)."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        if not v.is_integer() or abs(v) >= 2.0**53:
            return None
        return int(v)
    try:
        return int(str(v).strip())
    except ValueError:
        try:
            return _exact_int_literal(float(str(v)))
        except (ValueError, OverflowError):
            return None


def apply_py(tr: Transform, value, source_ice_type: str = "string"):
    """Evaluate the transform on a PREDICATE LITERAL driver-side (for
    pruning): value is the parsed literal — ISO date string, int/float
    number, or plain string. None when the literal can't be transformed
    (callers must not prune then)."""
    if value is None:
        return None
    try:
        if tr.kind == "identity":
            return value
        if tr.kind == "day":
            return (datetime.date.fromisoformat(str(value)[:10]) - _EPOCH).days
        if tr.kind == "month":
            s = str(value)
            return (int(s[0:4]) - 1970) * 12 + (int(s[5:7]) - 1)
        if tr.kind == "year":
            return int(str(value)[0:4]) - 1970
        if tr.kind == "hour":
            s = str(value)
            d = datetime.date.fromisoformat(s[:10])
            hh = int(s[11:13]) if len(s) >= 13 else 0
            return (d - _EPOCH).days * 24 + hh
        if tr.kind == "bucket":
            # the literal must hash in the SOURCE column's byte layout —
            # a quoted numeric literal ('5' against an int key) must be
            # coerced to the int layout, or the hash lands in the wrong
            # bucket and pruning drops a matching file
            v = value
            if source_ice_type in _INT_TYPES:
                v = _exact_int_literal(v)
                if v is None:
                    return None
            elif source_ice_type == "string":
                if not isinstance(v, str):
                    return None
            elif source_ice_type == "date":
                v = datetime.date.fromisoformat(str(v)[:10])
            elif source_ice_type in ("timestamp", "timestamptz"):
                v = datetime.datetime.fromisoformat(str(v))
            elif source_ice_type.startswith("decimal("):
                v = decimal.Decimal(str(v))
            elif isinstance(v, float) and v.is_integer():
                v = int(v)
            return bucket_value(v, tr.param)
        if tr.kind == "truncate":
            # coerce by SOURCE type, like bucket: a quoted numeric
            # literal against an int column must int-truncate, never
            # string-prefix (wrong space compared successfully against
            # the int-space partition value and unsoundly pruned)
            if source_ice_type in _INT_TYPES:
                iv = _exact_int_literal(value)
                if iv is None:
                    return None
                return iv - (iv % tr.param)  # python % is floor-mod
            if source_ice_type == "string":
                return value[: tr.param] if isinstance(value, str) else None
            return None  # unsupported truncate source: never prune
    except (ValueError, decimal.InvalidOperation, struct.error, OverflowError):
        return None
    return None


# ------------------------------------------------------------- pruning

_SIMPLE_CONJ_RE = re.compile(
    r"\s*(\w+)\s*(<=|>=|==|=|<|>)\s*('([^']*)'|[-0-9.]+)\s*"
)

_QUOTED_RE = re.compile(r"'[^']*'")


def split_and_conjuncts(where: str) -> Optional[list[str]]:
    """Split a predicate on TOP-LEVEL ``AND`` with quoted literals masked
    first — the single tokenizer every pruner must use. Splitting the raw
    text would let data INSIDE a string literal fabricate conjuncts
    (``note = 'a AND k = 5 AND b'`` must remain ONE unrecognized conjunct,
    never inject ``k = 5``). BETWEEN expands to its inequality pair
    before the split, also mask-aware. Returns None when a top-level OR
    is present (an AND split of a mixed predicate is unsound to prune
    on)."""
    literals: list[str] = []

    def _mask(m: "re.Match[str]") -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    def _unmask(s: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], s
        )

    masked = _QUOTED_RE.sub(_mask, where)
    if re.search(r"\bOR\b", masked, re.IGNORECASE):
        return None
    masked = re.sub(
        r"(\w+)\s+BETWEEN\s+(\x00\d+\x00|[-0-9.]+)\s+AND\s+"
        r"(\x00\d+\x00|[-0-9.]+)",
        r"\1 >= \2 AND \1 <= \3",
        masked,
        flags=re.IGNORECASE,
    )
    return [
        _unmask(part)
        for part in re.split(r"\s+AND\s+", masked, flags=re.IGNORECASE)
    ]


def simple_conjuncts(where: Optional[str]) -> list[tuple]:
    """Parse a predicate into recognized ``(col, op, literal)`` AND-
    conjuncts for transformed-space pruning. Any top-level OR → no
    conjuncts; unrecognized conjuncts are simply dropped (conservative:
    fewer pruning opportunities, never a fabricated one)."""
    if where is None:
        return []
    parts = split_and_conjuncts(where)
    if parts is None:
        return []
    out = []
    for part in parts:
        m = _SIMPLE_CONJ_RE.fullmatch(part)
        if m:
            col, op, raw, s_lit = m.group(1), m.group(2), m.group(3), m.group(4)
            if s_lit is not None:
                lit: object = s_lit
            else:
                # [-0-9.]+ admits junk like `1.2.3` or a bare `-`: drop
                # the conjunct, never crash the pruner (conservative
                # contract above). Integral text parses as EXACT int —
                # float()-ing an int64 literal ≥ 2^53 collapses neighbors
                # and downstream monotonic-compare pruning could wrongly
                # skip (r14, same class as Warehouse._can_skip).
                lit = exact_number(raw)
                if lit is None:
                    continue
            out.append((col, op, lit))
    return out


def exact_number(s):
    """Parse a numeric literal EXACTLY: integral text → int, else float;
    None if unparseable. Comparisons must stay in native types — Python
    compares int vs float mathematically exactly at any magnitude."""
    t = str(s).strip()
    try:
        if t.lstrip("-").isdigit():
            return int(t)
        return float(t)
    except ValueError:
        return None

#: transforms through which `c op lit ⇒ T(c) op' T(lit)` holds with
#: op' the weakened operator below (monotonic non-decreasing transforms)
_MONOTONIC = {"identity", "day", "month", "year", "hour", "truncate"}


def prune_disjoint(tr: Transform, op: str, lit, lo, hi,
                   source_ice_type: str = "string") -> bool:
    """True iff NO source value satisfying ``col op lit`` can land in a
    partition whose transformed value lies in ``[lo, hi]`` — the sound
    direction for skipping a manifest/file. Conservative: any doubt →
    False (never skip).

    Monotonic transforms: ``c >= L ⇒ T(c) >= T(L)`` (and dually), so a
    range wholly below/above T(L) is disjoint; strict ops weaken to
    non-strict in transformed space (two source values in one day).
    Bucket: equality only — T(L) outside [lo, hi] is disjoint."""
    t_lit = apply_py(tr, lit, source_ice_type)
    if t_lit is None or lo is None or hi is None:
        return False
    try:
        if tr.kind == "bucket":
            return op in ("=", "==") and (t_lit < lo or t_lit > hi)
        if tr.kind not in _MONOTONIC:
            return False
        if op in ("=", "=="):
            return t_lit < lo or t_lit > hi
        if op in (">", ">="):
            return hi < t_lit
        if op in ("<", "<="):
            return lo > t_lit
    except TypeError:  # incomparable types: never skip
        return False
    return False
