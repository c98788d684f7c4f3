"""Dump the ONE-iteration executed chain plan of the pagerank shape with
cache registration outside (before) vs inside (after) the shuffle scope.
The operator's returned frame is a persisted result (explain on it shows
only InMemoryTableScan), so this instrumented dump is the honest plan
evidence for the r16 scope fix. Usage: pr_plan_dump.py {before|after} out.txt
"""
import sys
from pyspark.sql import SparkSession, functions as F
sys.path.insert(0, "/root/repo")
mode, out = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone","UTC").config("spark.driver.memory","2g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.tuning import scoped_conf
sf = "/root/testdata/sf0.01"
li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
e0 = (li.alias("x").join(li.alias("y"),
        (F.col("x.l_orderkey")==F.col("y.l_orderkey")) & (F.col("x.l_partkey")<F.col("y.l_partkey")))
      .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")).distinct())
edges = e0.selectExpr("a AS s","b AS d").unionAll(e0.selectExpr("b AS s","a AS d"))
deg = edges.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("outd"))

def build_caches():
    ew = edges.join(deg,"s").repartition(8,"s").persist()
    nodes = deg.select(F.col("s").alias("node")).persist()
    return ew, nodes

if mode == "before":
    ew, nodes = build_caches()      # registered at the session's 200
scope = scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"})
with scope:
    if mode == "after":
        ew, nodes = build_caches()  # registered inside the 8-wide scope
    n_lit = F.lit(float(nodes.count()))
    ranks = nodes.select("node", (F.lit(1.0)/n_lit).alias("rank"))
    r = ranks.hint("shuffle_hash")
    contrib = (r.join(ew, r["node"]==ew["s"]).groupBy("d")
               .agg(F.sum(F.col("rank")/F.col("outd")).alias("c")))
    it = nodes.join(contrib, nodes["node"]==contrib["d"], "left").select(
        "node", (F.lit(0.15)/n_lit + F.lit(0.85)*F.coalesce(F.col("c"), F.lit(0.0))).alias("rank"))
    it.count()
    plan = it._jdf.queryExecution().executedPlan().toString()
with open(out, "w") as f:
    f.write(f"# instrumented ONE-iteration executed chain plan, mode={mode}\n")
    f.write("# (persist registration {} the 8-wide scope; session at 200)\n".format(
        "OUTSIDE" if mode=="before" else "INSIDE"))
    f.write(plan)
spark.stop()
