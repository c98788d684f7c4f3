"""Scoped session-conf tuning for operators that manage their own shuffles.

Some operators (iterative connected components, the banded-LSH pipeline) know
their working-set size far better than the session default does: their frames
are proportional to their INPUT's partitioning, not to whatever
``spark.sql.shuffle.partitions`` the host session runs (the driver gate uses a
plain session at 200 — hundreds of near-empty tasks per stage on small
inputs, and cached subplans block AQE from coalescing them away).

``scoped_conf`` applies conf overrides for the duration of one operator and
ALWAYS restores the previous values — a leaked session conf was an explicit
r01 ADVICE finding, so the restore path is the point of this module.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def scoped_conf(spark: SparkSession, overrides: dict[str, str]) -> Iterator[None]:
    prev: dict[str, str | None] = {}
    for k in overrides:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def input_sized_shuffle(df: DataFrame, floor: int = 8) -> str:
    """Shuffle-partition count proportional to an input frame's own
    partitioning — scale-correct on a 1000-executor cluster (inputs arrive
    with thousands of splits) and overhead-free on a laptop (a 2-split scan
    doesn't fan out to 200 near-empty tasks)."""
    return str(max(floor, df.rdd.getNumPartitions()))


def cpu_spread(df: DataFrame) -> DataFrame:
    """Fan a frame out to the session's full parallelism before a CPU-heavy
    per-row stage (mapInPandas codec kernels, interpreted-HOF shingle/bigram
    builds). Spark sizes scan partitions by BYTES (maxPartitionBytes), the
    wrong currency when per-row CPU dominates per-row I/O: a single-file
    table arrives as 1-2 splits and the whole kernel serializes on 1-2
    cores (measured: c4_jpeg_baseline_decode 20.8 s -> 4.4 s at sf0.1).
    The shuffle's per-row payload is whatever columns the frame carries —
    narrow ids+blobs for the codec kernels, full text for the shingle
    builds — and is negligible only because the kernel CPU is 10-100x the
    move cost; an already-wide frame gets NO shuffle at all: when the
    input arrives with >= defaultParallelism splits (every real-cluster
    scan of real data) this returns it unchanged, so cluster plans pay
    zero — ``repartition(n)`` is never free, it inserts a round-robin
    exchange even when the count doesn't change (r09 ADVICE).

    Spread ONLY when per-row CPU dominates per-row bytes. Measured washes
    and losses (PLANS.md): codegen'd scans+aggregates (full flagship A/B:
    plain 1.22 s vs spread 1.28-1.36 s at sf0.1 — the scan stage still
    decodes the single row group serially and the shuffle then moves
    full-width rows), simhash (banded-join-bound), CDC chunking
    (verification-bound)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)
