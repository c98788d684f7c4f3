"""Triangle-count shape: a=current(uncached) b=e0 persisted c=e0+oriented persisted (all in-scope)."""
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
with scoped_conf(spark, {"spark.sql.shuffle.partitions": input_sized_shuffle(li)}):
    e0 = (li.alias("x").join(li.alias("y"),
            (F.col("x.l_orderkey")==F.col("y.l_orderkey")) & (F.col("x.l_partkey")<F.col("y.l_partkey")))
          .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")).distinct())
    if mode in ("b","c"): e0 = e0.persist()
    deg = (e0.select(F.col("a").alias("node")).unionAll(e0.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d")))
    keep_ab = (F.col("da.d") < F.col("db.d")) | (F.col("da.d") == F.col("db.d"))
    oriented = (e0.join(F.broadcast(deg.alias("da")), F.col("da.node")==F.col("a"))
                  .join(F.broadcast(deg.alias("db")), F.col("db.node")==F.col("b"))
                  .select(F.when(keep_ab, F.col("a")).otherwise(F.col("b")).alias("u"),
                          F.when(keep_ab, F.col("b")).otherwise(F.col("a")).alias("v")))
    if mode == "c": oriented = oriented.persist()
    wedge = (oriented.alias("e1").join(oriented.alias("e2"),
                (F.col("e1.u")==F.col("e2.u")) & (F.col("e1.v")<F.col("e2.v")))
             .select(F.col("e1.v").alias("v"), F.col("e2.v").alias("w")))
    tri_n = (wedge.join(e0, (F.col("v")==F.col("a")) & (F.col("w")==F.col("b")))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles")))
    wedge_n = wedge.agg(F.count(F.lit(1)).cast("bigint").alias("n_wedges"))
    edge_n = e0.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    result = tri_n.crossJoin(F.broadcast(wedge_n)).crossJoin(F.broadcast(edge_n)).persist()
    result.count()
r = result.collect()
print(f"TRI {mode} {time.time()-t0:.1f}s {r[0]}")
spark.stop()
