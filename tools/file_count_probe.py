#!/usr/bin/env python
"""Probe: Iceberg-v2 spec-reader PLANNING cost vs data-FILE count.

The scale probes in PLANS.md scale data VOLUME; the spec reader's
driver-side work — version-hint → metadata.json → Avro manifest decode →
per-entry pruning — scales with FILE COUNT instead. This probe builds
warehouse tables with N data files (per-value partitioning on
``l_orderkey % N`` — Warehouse._write_data's hash-repartition guarantees
one file per partition value), exports each as Iceberg-v2 metadata, and
times the reader's phases separately:

- ``plan``:   read_iceberg_v2() call itself (all driver-side metadata
              work: Avro manifest decode, partition mapping build, lazy
              DataFrame construction — no job runs);
- ``prune``:  same, with a ``where`` that keeps ~1/5 of the files (the
              per-entry _can_skip walk is the added driver cost);
- ``scan``:   count() of the planned frame (executor-side, for context).

Run: timeout 1800 python tools/file_count_probe.py [N1,N2,...]
Default counts: 50,200,500. Prints one JSON line per (N, phase).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    counts = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [50, 200, 500]
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from apache_iceberg_demo_spark.io import load, scratch_dir
    from apache_iceberg_demo_spark.sources.iceberg_v2 import (
        export_iceberg_v2,
        read_iceberg_v2,
    )
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    li = load(spark, sf_dir, "lineitem")
    for n in counts:
        root = scratch_dir(f"fcprobe_{n}_", unique=True)
        wh = Warehouse(spark, os.path.join(root, "wh"))
        df = li.withColumn("bucket", (F.col("l_orderkey") % n).cast("int"))
        wh.create_or_replace("t", df, partition_by="bucket")
        location = export_iceberg_v2(wh, "t", os.path.join(root, "ice"))

        t0 = time.time()
        frame = read_iceberg_v2(spark, location)
        plan_s = time.time() - t0

        t0 = time.time()
        pruned = read_iceberg_v2(spark, location, where=f"bucket < {n // 5}")
        prune_s = time.time() - t0

        t0 = time.time()
        rows = frame.count()
        scan_s = time.time() - t0
        pruned_files = len(pruned.inputFiles())
        print(
            json.dumps(
                {
                    "files": n,
                    "plan_s": round(plan_s, 3),
                    "plan_pruned_s": round(prune_s, 3),
                    "scan_s": round(scan_s, 3),
                    "rows": rows,
                    "files_after_prune": pruned_files,
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
