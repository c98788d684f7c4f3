"""Pagerank shape: current (r16 fix) vs + e0.persist() in-scope. argv: {cur|e0} [sf]"""
import sys, time
from pyspark.sql import SparkSession, functions as F
sys.path.insert(0, "/root/repo")
mode = sys.argv[1]; sf = sys.argv[2] if len(sys.argv)>2 else "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone","UTC").config("spark.driver.memory","2g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.tuning import input_sized_shuffle, scoped_conf
t0=time.time()
li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
e0 = (li.alias("x").join(li.alias("y"),
        (F.col("x.l_orderkey")==F.col("y.l_orderkey")) & (F.col("x.l_partkey")<F.col("y.l_partkey")))
      .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")).distinct())
nparts = max(int(input_sized_shuffle(li)), spark.sparkContext.defaultParallelism)
with scoped_conf(spark, {"spark.sql.shuffle.partitions": str(nparts)}):
    if mode == "e0": e0 = e0.persist()
    edges = e0.selectExpr("a AS s","b AS d").unionAll(e0.selectExpr("b AS s","a AS d"))
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("outd"))
    ew = edges.join(deg,"s").repartition(nparts,"s").persist()
    nodes = deg.select(F.col("s").alias("node")).persist()
    n_lit = F.lit(float(nodes.count()))
    ranks = nodes.select("node", (F.lit(1.0)/n_lit).alias("rank"))
    for i in range(10):
        r = ranks.hint("shuffle_hash")
        contrib = (r.join(ew, r["node"]==ew["s"]).groupBy("d")
                   .agg(F.sum(F.col("rank")/F.col("outd")).alias("c")))
        ranks = nodes.join(contrib, nodes["node"]==contrib["d"], "left").select(
            "node", (F.lit(0.15)/n_lit + F.lit(0.85)*F.coalesce(F.col("c"), F.lit(0.0))).alias("rank"))
    result = ranks.select("node", F.round(F.col("rank")*n_lit,6).alias("rank_x_n")).persist()
    result.count()
r=result.collect()
print(f"PRV {mode} {time.time()-t0:.1f}s rows={len(r)}")
spark.stop()
