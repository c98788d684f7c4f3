"""Probe: hash-agg percentile() vs sort-based exact percentiles, b4_percentiles shape.
Usage: pctl_probe.py {check|time-hash|time-sort} [sf_dir] [cores]
"""
import sys, time
from pyspark.sql import SparkSession, functions as F, Window as W

mode = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
cores = sys.argv[3] if len(sys.argv) > 3 else "32"
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_returnflag","l_extendedprice")

PS = [(0.5,"p50"),(0.9,"p90"),(0.99,"p99")]

def hash_form():
    return li.groupBy("l_returnflag").agg(
        *[F.round(F.expr(f"percentile(l_extendedprice, {p})"),6).alias(a) for p,a in PS])

def sort_form():
    cnt = li.groupBy("l_returnflag","l_extendedprice").agg(F.count("*").alias("c"))
    wcum = W.partitionBy("l_returnflag").orderBy("l_extendedprice").rowsBetween(W.unboundedPreceding,0)
    wall = W.partitionBy("l_returnflag")
    cum = cnt.select(
        "l_returnflag","l_extendedprice",
        F.sum("c").over(wcum).alias("hi"),
        (F.sum("c").over(wcum)-F.col("c")).alias("lo"),
        F.sum("c").over(wall).alias("n"))
    aggs = [F.first("n").alias("n")]
    for p,a in PS:
        pos = (F.lit(p)*(F.col("n")-1).cast("double"))
        lo_i, hi_i = F.floor(pos), F.ceil(pos)
        aggs.append(F.max(F.when((F.col("lo")<=lo_i)&(lo_i<F.col("hi")),F.col("l_extendedprice"))).alias(f"vlo_{a}"))
        aggs.append(F.max(F.when((F.col("lo")<=hi_i)&(hi_i<F.col("hi")),F.col("l_extendedprice"))).alias(f"vhi_{a}"))
    g = cum.groupBy("l_returnflag").agg(*aggs)
    outs = ["l_returnflag"]
    for p,a in PS:
        pos = (F.lit(p)*(F.col("n")-1).cast("double"))
        lo_i, hi_i = F.floor(pos), F.ceil(pos)
        vlo, vhi = F.col(f"vlo_{a}"), F.col(f"vhi_{a}")
        # Spark Percentile.getPercentile: lower==higher or equal keys -> lowerKey
        val = F.when((lo_i==hi_i)|(vlo==vhi), vlo).otherwise(
            (hi_i.cast("double")-pos)*vlo + (pos-lo_i.cast("double"))*vhi)
        outs.append(F.round(val,6).alias(a))
    return g.select(*outs)

if mode == "check":
    a = sorted(hash_form().collect())
    b = sorted(sort_form().collect())
    print("MATCH" if a==b else f"MISMATCH\n{a}\n{b}")
else:
    f = hash_form if mode=="time-hash" else sort_form
    f().count()  # warm the scan/session once
    t0=time.time(); df=f(); df.count(); r=df.collect(); t1=time.time()
    print(f"{mode} {t1-t0:.3f}s rows={len(r)}")
spark.stop()
