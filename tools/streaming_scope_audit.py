"""Audit state-store partition counts of every streaming operator (r16,
VERDICT item 6).

Runs each b9 streaming operator under DRIVER conditions (plain local[8]
session, 200 shuffle partitions) with a StreamingQueryListener attached and
reports, per operator, every stateful operator's `numShufflePartitions`
from the StreamingQueryProgress feed — the state-store partition count IS
the shuffle-partition count of the stateful stage, so any value above the
core count means a stream escaped its input-sized scope and pays
(partitions × state-store open/commit) per micro-batch (the r15
b9_stateful_sessionize finding, 200 stores → 8).

Usage: python tools/streaming_scope_audit.py [sf_dir] [name ...]
Exit code 1 if any stateful operator reports more partitions than the
session's defaultParallelism.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: every registered operator that starts a streaming query (grep
#: readStream/writeStream in streaming/windows.py)
STREAMING_OPS = [
    "b9_tumbling_window",
    "b9_sliding_window",
    "b9_session_window",
    "b9_stream_stream_interval_join",
    "b9_stateful_sessionize",
    "b9_foreachbatch_merge_sink",
    "b9_stream_static_enrichment",
    "b9_stream_dedup_watermark",
    "b9_stream_left_outer_interval_join",
    "b9_stateful_ewma_anomaly",
    "b9_update_mode_counts",
    "b9_file_sink_exactly_once",
    "b9_stream_progress_metrics",
    "b9_complete_mode_topk",
]


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StreamingQueryListener

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    current = {"name": "?"}
    seen: dict[str, dict[str, tuple[int, int]]] = {}

    class Audit(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = json.loads(event.progress.json)
            ops = p.get("stateOperators") or []
            rec = seen.setdefault(current["name"], {})
            for so in ops:
                op = so.get("operatorName", "state")
                n = int(so.get("numShufflePartitions", -1))
                batches, prev = rec.get(op, (0, -1))
                rec[op] = (batches + 1, max(prev, n))
            if not ops:
                rec.setdefault("(stateless)", (0, 0))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    spark.streams.addListener(Audit())

    from apache_iceberg_demo_spark import registry

    registry.load_all()
    names = sys.argv[2:] or STREAMING_OPS
    for name in names:
        current["name"] = name
        t0 = time.time()
        df = registry.QUERIES[name](spark, SF_DIR)
        df.count()
        df.collect()
        time.sleep(1.5)  # listener events are delivered async
        print(f"[ran] {name}: {time.time() - t0:.1f}s", flush=True)

    bad = 0
    print(f"\n== state-store partition audit (cores={cores}) ==")
    for name in names:
        rec = seen.get(name)
        if not rec:
            print(f"{name:40} NO PROGRESS EVENTS (batch-equivalence path?)")
            continue
        for op, (batches, n) in sorted(rec.items()):
            flag = ""
            if op != "(stateless)" and n > cores:
                flag = "  << ABOVE CORE COUNT"
                bad += 1
            print(f"{name:40} {op:35} progressEvents={batches:3d} "
                  f"numShufflePartitions={n}{flag}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
