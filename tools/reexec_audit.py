"""Double-execution audit: count-vs-collect timing per registered query.

The driver runs count() THEN collect() on every returned frame. A query
that returns an unmaterialized multi-stage pipeline pays the whole pipeline
TWICE (or more, when in-query audit collects already ran it once). This
sweep measures build/count/collect separately and flags queries where
collect re-pays a significant fraction of count — the class that cost
pipeline_rag_retrieval 26→9 s, triangle-count 9.3→7 s, and pagerank
22→19.6 s when fixed in round 7.

Run: timeout 3600 python tools/reexec_audit.py [sf_dir] [name1 ...]
Prints one JSON line per query (build/count/collect seconds) and a final
summary line listing queries whose collect took >= 1.5 s AND >= 60% of
count (double-execution smell). Exit 0 always — the flags are for reading,
some collects are legitimately expensive (wide results).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    flagged = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            t = time.time()
            df = fn(spark, sf_dir)
            tb = time.time() - t
            t = time.time()
            df.count()
            tc = time.time() - t
            t = time.time()
            df.collect()
            td = time.time() - t
            print(
                json.dumps(
                    {
                        "q": name,
                        "build": round(tb, 2),
                        "count": round(tc, 2),
                        "collect": round(td, 2),
                    }
                ),
                flush=True,
            )
            if td >= 1.5 and td >= 0.6 * max(tc, 0.01):
                flagged.append((name, round(tc, 2), round(td, 2)))
        except Exception as ex:  # keep sweeping — report at the end
            print(json.dumps({"q": name, "error": str(ex)[:200]}), flush=True)
    print(
        json.dumps({"flagged_double_execution": flagged}),
        flush=True,
    )


if __name__ == "__main__":
    main()
