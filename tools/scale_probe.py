"""Scaling-linearity probe — measured evidence that headline plans survive
a scale-up, not just an argument from plan shape.

Replicates the sf0.1 fact tables K× (key-shifted copies, dimensions kept at
1× — the realistic shape: facts grow, dims don't) into /tmp scratch, then
times the headline queries at each multiplier through the exact registered
callables and the bench harness's noop-write action. A query whose plan is
scale-safe (pushed filters, broadcast dims, partial aggs, hash-partitioned
shuffles) shows near-linear wall time; a hidden driver-side loop, all-pairs
join, or collect would show super-linear blow-up here long before a cluster
run would.

Key shifting keeps semantics realistic per copy:
  lineitem/orders  — l_orderkey/o_orderkey shift together (joins stay
                     consistent); part/supp/cust keys stay in 1×-dim range
  events           — event_id and user_id shift: K× distinct users with the
                     same per-user session/asof structure, same time range
  documents        — doc_id shifts, text identical: a duplicate-heavy corpus
                     (exact dedup sees groups of K — the production shape)
  embeddings       — vec_id shifts, vectors identical (timing-only: brute
                     cosine cost is rows × dim regardless of values)

Run:  python tools/scale_probe.py [--mults 1,2,5,10] [--keep]
Emits one JSON line per (mult, query) and a final summary line with
sec-per-mult ratios; paste the table into PLANS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
SCRATCH = os.environ.get("SPARK_GRAFT_SCALE_SCRATCH", "/tmp/spark_graft_scale_probe")

# fact table → columns to shift by i*stride per copy i
SHIFTED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation", "customer", "supplier", "part"]

QUERIES = [
    "a10_q1_filter_count",
    "a12_q3_group_agg_sort",
    "flagship_pricing_summary",
    "b3_join_star_revenue",
    "b5_row_number_topk",
    "asof_join_events",
    "sessionize_gap30m",
    "c1_dedup_exact_docs",
    "c3_cosine_topk_batch",
    "c5_token_frequencies",
]


def build_scaled_dir(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    from apache_iceberg_demo_spark.io import load

    if mult == 1:
        return BASE
    out = os.path.join(SCRATCH, f"m{mult}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for t in COPIED:
        shutil.copy(os.path.join(BASE, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))
    for t, keys in SHIFTED.items():
        df = load(spark, BASE, t)
        strides = {
            k: df.agg(F.max(k)).first()[0] + 1 for k in keys
        }
        copies = [
            df.select(
                *[
                    (F.col(c) + F.lit(i * strides[c])).alias(c) if c in keys else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(mult)
        ]
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        # TIMESTAMP_MICROS: Spark's INT96 default reads back as ns in the
        # footer sniff and would wrongly trigger the nanos-rebuild path
        (
            scaled.repartition(max(4, 2 * mult))
            .write.option("parquet.block.size", 64 << 20)
            .mode("overwrite")
            .parquet(os.path.join(out, f"{t}.parquet"))
        )
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,5,10")
    ap.add_argument("--keep", action="store_true", help="keep scratch dirs")
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    names = [q for q in args.queries.split(",") if q]

    from apache_iceberg_demo_spark import registry
    from apache_iceberg_demo_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale_probe")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def plan_shape(name: str, sf_dir: str) -> dict:
        """Physical-strategy fingerprint: a scale-safe plan keeps the same
        join strategies and exchange count as data grows (broadcasts must
        not silently flip to shuffle joins of the FACT side, and no new
        exchanges may appear)."""
        plan = (
            registry.QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        return {
            "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
        }

    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for mult in mults:
        t0 = time.perf_counter()
        sf_dir = build_scaled_dir(spark, mult)
        build_s = round(time.perf_counter() - t0, 1)
        for n in names:
            run(n, sf_dir)  # warm: footers, codegen
            best = min(run(n, sf_dir) for _ in range(2))
            results[n][mult] = round(best, 3)
            print(
                json.dumps(
                    {"mult": mult, "query": n, "sec": results[n][mult],
                     "plan": plan_shape(n, sf_dir)}
                ),
                flush=True,
            )
        print(json.dumps({"mult": mult, "dir": sf_dir, "build_sec": build_s}), flush=True)

    base_mult = mults[0]
    summary = {
        n: {
            "sec": results[n],
            "ratio_vs_linear": {
                m: round(results[n][m] / max(results[n][base_mult], 1e-9) / (m / base_mult), 2)
                for m in mults[1:]
            },
        }
        for n in names
    }
    print(json.dumps({"summary": summary}), flush=True)
    if not args.keep:
        shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
