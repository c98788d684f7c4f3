"""Benchmark harness — prints ONE JSON line (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], one warm SparkSession (per BASELINE.md: the
binding constraint at this scale is fixed per-query overhead, so the harness
warms the JIT with one throwaway pass, then times each query end-to-end
including the action).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "a10_q1_filter_count",       # reference Q1: filter + count
    "a11_q2_filter_avg",         # reference Q2: 2-pred filter + avg
    "a12_q3_group_agg_sort",     # reference Q3: group agg + sort
    "flagship_pricing_summary",  # TPC-H-Q1 shape
]
# widened per milestone as operators land
EXTRA = [
    "b3_join_star_revenue",
    "b5_row_number_topk",
    "b9_tumbling_window",
    "asof_join_events",
    "sessionize_gap30m",
    "c1_dedup_exact_docs",
    "c3_cosine_topk",
    "c3_cosine_topk_batch",
    "c5_token_frequencies",
    "c5_tfidf_top_terms",
]


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main() -> None:
    from apache_iceberg_demo_spark import registry
    from apache_iceberg_demo_spark.session import (
        default_parallelism,
        get_spark,
        sized_shuffle_partitions,
    )

    registry.load_all()
    parts = sized_shuffle_partitions(_dir_bytes(SF_DIR), default_parallelism())
    spark = get_spark("bench", shuffle_partitions=parts)

    names = [n for n in HEADLINE + EXTRA if n in registry.QUERIES]

    def run(n: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up: JIT, codegen cache, parquet footers (the reference's numbers
    # are warm-engine runs too — DuckDB in-process, Presto long-lived server)
    for n in names:
        run(n)

    # steady-state latency: best of 3 (scheduler noise on a shared host
    # dominates at these sub-second scales)
    timings: dict[str, float] = {}
    for n in names:
        timings[n] = round(min(run(n) for _ in range(3)), 4)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
