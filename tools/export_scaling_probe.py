#!/usr/bin/env python
"""Export-cost scaling vs COMMIT COUNT — the fast-append manifest probe.

A cumulative-manifest exporter rewrites every live file's entry into a
fresh manifest for EVERY snapshot, so exporting a K-commit table writes
O(K^2) manifest entries; the fast-append chain re-lists parent manifests
by reference and writes only the added files' entries — O(K) total. This
probe builds a table with N tiny append commits, exports it, and reports
wall time, total manifest-Avro bytes, manifest-file count, and the total
number of manifest ENTRIES written (the O(.) that matters).

Run: timeout 600 python tools/export_scaling_probe.py [N ...]
Prints one JSON line per N.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    ns = [int(a) for a in argv] or [5, 20, 50]
    from pyspark.sql import SparkSession

    from apache_iceberg_demo_spark.sources.avro_ocf import read_ocf
    from apache_iceberg_demo_spark.sources.iceberg_v2 import (
        export_iceberg_v2,
        read_iceberg_v2,
    )
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for n in ns:
        root = tempfile.mkdtemp(prefix=f"exp_scale_{n}_")
        wh = Warehouse(spark, os.path.join(root, "wh"))
        base = spark.range(100).withColumnRenamed("id", "k")
        wh.create_or_replace("t", base)
        for i in range(1, n):
            wh.append("t", spark.range(i * 1000, i * 1000 + 100)
                      .withColumnRenamed("id", "k"))
        t0 = time.time()
        loc = export_iceberg_v2(wh, "t", os.path.join(root, "ice"))
        wall = time.time() - t0
        mdir = os.path.join(loc, "metadata")
        manifests = [
            p for p in glob.glob(os.path.join(mdir, "*.avro"))
            if not os.path.basename(p).startswith("snap-")
        ]
        entries = sum(len(read_ocf(p)[2]) for p in manifests)
        avro_bytes = sum(
            os.path.getsize(p) for p in glob.glob(os.path.join(mdir, "*.avro"))
        )
        t1 = time.time()
        n_rows = read_iceberg_v2(spark, loc).count()
        full_s = time.time() - t1
        assert n_rows == 100 * n, (n_rows, n)
        # incremental scan of just the LAST commit: metadata cost is one
        # manifest list + ONE manifest, regardless of table history
        from apache_iceberg_demo_spark.sources.iceberg_v2 import (
            read_iceberg_v2_changes,
        )

        mpath = os.path.join(mdir, "version-hint.text")
        with open(mpath) as f:
            hint = int(f.read().strip())
        with open(os.path.join(mdir, f"v{hint}.metadata.json")) as f:
            tmeta = json.load(f)
        penult = tmeta["snapshots"][-2]["snapshot-id"] if n > 1 else None
        incr_s, n_incr = None, None
        if penult is not None:
            t2 = time.time()
            n_incr = read_iceberg_v2_changes(
                spark, loc, from_snapshot_id=penult
            ).count()
            incr_s = round(time.time() - t2, 2)
            assert n_incr == 100, n_incr
        print(
            json.dumps(
                {
                    "commits": n,
                    "export_s": round(wall, 2),
                    "manifest_files": len(manifests),
                    "manifest_entries": entries,
                    "metadata_avro_kb": round(avro_bytes / 1024, 1),
                    "full_read_s": round(full_s, 2),
                    "incr_last_commit_s": incr_s,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
