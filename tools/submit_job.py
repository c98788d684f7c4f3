"""Minimal ``spark-submit`` entry point — the A17 distributed-submission
surface (SURVEY.md §2; the reference submits its query scripts to a
long-running engine the same way, ``/root/reference/README.md:85-95``).

On a real cluster this exact file ships unchanged:

    spark-submit --master yarn --deploy-mode cluster \
        tools/submit_job.py <sf_dir> <query_name>

and in this sandbox the test harness drives it through ``--master
local[2]`` — same submission tool, same classpath/py-files resolution,
same driver bootstrap; only the cluster manager differs. The script takes
its SparkSession from the submission context (``getOrCreate`` with no
master override) so whatever the submitter chose wins.

Prints exactly one JSON line: {"query": ..., "rows": N, "columns": [...]}.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    sf_dir, name = sys.argv[1], sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"spark-graft:{name}")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        import __spark_entry__ as entry

        df = entry.queries()[name](spark, sf_dir)
        print(
            json.dumps(
                {"query": name, "rows": df.count(), "columns": df.columns}
            ),
            flush=True,
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
