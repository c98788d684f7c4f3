"""Testdata table loaders.

The driver's deterministic synthetic tables (TESTDATA.md) play the role of the
reference's NYC-taxi Iceberg table (``/root/reference/scripts/csv_to_ice.py:58``);
one Parquet file per table per scale dir. Reading with ``spark.read.parquet``
gives the same scan-side behavior the reference's engines observably rely on —
column pruning and predicate pushdown into the Parquet reader
(``/root/reference/README.md:162,177,202`` — Presto reads 6.55-54 MB of a 2 GB
table).
"""

from __future__ import annotations

import atexit
import contextlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic scale factor
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# --- scratch-dir management -------------------------------------------------------
# Operators that demo write-side behavior (partitioned rewrites, bucketed
# tables, warehouse snapshots, stream checkpoints) need on-disk scratch space.
# mkdtemp-per-invocation leaks disk across repeated bench/driver runs
# (ADVICE r01), so: one dir per prefix, reused within the process (writers use
# overwrite semantics), all removed at interpreter exit.

_SCRATCH: dict[str, str] = {}
_SCRATCH_UNIQUE: list[str] = []


@atexit.register
def _cleanup_scratch() -> None:
    for d in list(_SCRATCH.values()) + _SCRATCH_UNIQUE:
        shutil.rmtree(d, ignore_errors=True)


def scratch_dir(prefix: str, unique: bool = False) -> str:
    """Temp dir for operator-internal writes, removed at process exit.

    Reused per prefix by default so a re-invoked operator overwrites instead
    of accumulating; ``unique=True`` for consumers that must not share state
    across invocations (streaming checkpoints resume from their contents).
    """
    if unique:
        d = tempfile.mkdtemp(prefix=prefix)
        _SCRATCH_UNIQUE.append(d)
        return d
    if prefix not in _SCRATCH:
        _SCRATCH[prefix] = tempfile.mkdtemp(prefix=prefix)
    return _SCRATCH[prefix]


@contextlib.contextmanager
def nanos_as_long(spark: SparkSession):
    """Scope `spark.sql.legacy.parquet.nanosAsLong` to a read: Spark captures
    the conf when the relation resolves (batch) or when the streaming query
    clones the session at start(), so restoring afterwards leaves the
    session's strict-nanos behavior intact for other readers."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


import functools


@functools.lru_cache(maxsize=64)
def _events_ts_unit(path: str) -> str:
    """On-disk physical unit of ``events.ts`` ('ns', 'us', 'ms', 's', or
    'int64'), read from the parquet footer without starting a Spark job.
    Cached per path — testdata files are immutable within a run, and the
    footer read would otherwise repeat on every events-query invocation."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    # Directory-of-files layouts: inspect the first parquet footer found.
    target = path
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                target = os.path.join(path, entry)
                break
    field = pq.read_schema(target).field("ts")
    if pat.is_timestamp(field.type):
        return field.type.unit
    return "int64"


#: path → Spark-inferred StructType. Testdata files are immutable within a
#: process, but `spark.read.parquet` re-reads the footer on EVERY call
#: (~100 ms of driver-side listing + inference vs ~20 ms with an explicit
#: schema — measured sf0.1). The first load of a path pays the inference;
#: later loads replay the cached schema. Each call still returns a FRESH
#: DataFrame (fresh attribute ids), so self-joins of two load() results
#: never trip AMBIGUOUS_SELF_JOIN.
_SCHEMA_CACHE: dict[str, object] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped in two vintages: parquet TIMESTAMP(NANOS) —
    which Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL) —
    and plain timestamp[us]. The footer decides (schema-adaptive read, the
    engine-neutral "scan what's on disk" property the reference demos across
    three engines, ``/root/reference/README.md:52-53,78``): ns/int64 → read
    nanos as int64 (`nanosAsLong`) and rebuild a µs TimestampType with integer
    division (float64 `/ 1000` loses precision above 2^53 ns); us/ms/s →
    Spark reads it natively as TimestampType already.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    if name == "events":
        from pyspark.sql import functions as F

        unit = _events_ts_unit(path)
        if unit in ("ns", "int64"):
            # the nanosAsLong conf stays scoped to the read even with a
            # cached schema: the reader, not the schema, rejects NANOS
            with nanos_as_long(spark):
                df = _read_parquet(spark, path)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # isAdjustedToUTC=false parquet infers as TIMESTAMP_NTZ in Spark 4;
        # cast to session-TZ TimestampType (session TZ is pinned UTC in
        # session.py, so the instant is identical to the ns-vintage rebuild)
        # to keep one downstream type across vintages.
        df = _read_parquet(spark, path)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return _read_parquet(spark, path)


def register_views(
    spark: SparkSession, sf_dir: str, tables: "tuple[str, ...] | None" = None
) -> None:
    """Register testdata tables as temp views (for the SQL entry point).

    ``tables=None`` registers all of :data:`TABLES` with per-table isolation:
    a table whose loader fails (e.g. an on-disk schema drift) is skipped so
    queries over the *other* tables still work — its own failure surfaces at
    name resolution of whichever query actually reads it. An explicit
    ``tables=`` subset is strict: callers asked for exactly those views, so
    any failure raises immediately.
    """
    if tables is not None:
        for name in tables:
            load(spark, sf_dir, name).createOrReplaceTempView(name)
        return
    errors: list[str] = []
    for name in TABLES:
        try:
            load(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception as exc:  # noqa: BLE001 — isolate per-table failures
            errors.append(f"{name}: {exc}")
    if errors:
        import warnings

        warnings.warn(
            "register_views skipped unloadable tables: " + "; ".join(errors),
            stacklevel=2,
        )
