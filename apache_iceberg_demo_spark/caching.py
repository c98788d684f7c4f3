"""Keyed result-cache helper shared by operator modules (ADVICE r15).

One implementation of the persist+materialize pattern that was copy-pasted
in operators/text.py, operators/mlprep.py and sources/iceberg_v2.py: a
returned summary frame is persisted and materialized so the driver's
count()-then-collect() executes the upstream pipeline once, and the PREVIOUS
invocation's frame is released first — a fresh invocation always recomputes
from parquet (no result caching across runs; the pop+unpersist happens
before the new persist builds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def keep_result(cache: dict[str, DataFrame], owner: str, df: DataFrame) -> DataFrame:
    """Release ``cache[owner]`` from the previous invocation, then persist,
    materialize and register ``df`` as the new result for ``owner``."""
    prev = cache.pop(owner, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            # the frame's SparkSession was stopped (session-restart
            # consumers, e.g. tools/determinism_probe.py): its cached
            # blocks died with the session — nothing to release
            pass
    df = df.persist()
    df.count()
    cache[owner] = df
    return df
