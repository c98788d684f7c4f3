"""B9: genuine Structured Streaming runs — batch-equivalence, watermark,
streaming dedup, stateful processing (SURVEY.md §7 phase 5)."""

from __future__ import annotations

import tempfile
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_iceberg_demo_spark import registry
from apache_iceberg_demo_spark.streaming.windows import streaming_tumbling_counts

registry.load_all()

SF = "/root/testdata/sf0.001"


def _event_stream(spark, sf_dir=SF):
    from apache_iceberg_demo_spark.streaming.windows import event_stream_source

    return event_stream_source(spark, sf_dir)


def _events_batch(spark, sf_dir=SF):
    """Batch view of events via io.load (the raw fixture is TIMESTAMP(NANOS),
    which a bare spark.read.parquet rejects now that the legacy conf is
    scoped to io.load instead of leaked session-wide)."""
    from apache_iceberg_demo_spark.io import load

    return load(spark, sf_dir, "events")


def _run_to_memory(df, mode="append"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_streaming_tumbling_equals_batch(spark):
    q, name = streaming_tumbling_counts(spark, SF)
    q.processAllAvailable()
    q.stop()
    stream_rows = {
        (r.window_start, r.event_type, r.n, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch_rows = {
        (r.window_start, r.event_type, r.n, r.total_value)
        for r in registry.QUERIES["b9_tumbling_window"](spark, SF).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_dedup_with_watermark(spark):
    src = _event_stream(spark)
    deduped = src.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    name = _run_to_memory(deduped)
    n = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
    total = _events_batch(spark).count()
    assert n == total  # event_id is unique ⇒ dedup keeps everything


def test_streaming_session_window(spark):
    src = _event_stream(spark)
    sess = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("s.start").alias("session_start"), "n_events")
    )
    name = _run_to_memory(sess, mode="complete")
    stream_n = spark.sql(f"SELECT sum(n_events) AS t FROM {name}").collect()[0].t
    assert stream_n == _events_batch(spark).count()
    batch_n = registry.QUERIES["b9_session_window"](spark, SF).count()
    stream_sessions = spark.sql(f"SELECT count(*) AS c FROM {name}").collect()[0].c
    assert stream_sessions == batch_n


def test_stateful_apply_in_pandas_with_state(spark):
    """Custom stateful operator: running per-user event counter."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = _event_stream(spark).select("user_id", "event_id")

    def count_events(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    counted = src.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id bigint, n bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = _run_to_memory(counted, mode="update")
    got = {
        (r.user_id, r.n) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    expected = {
        (r.user_id, r.n)
        for r in _events_batch(spark)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # final state per user matches the batch count
    final = {}
    for uid, n in sorted(got):
        final[uid] = max(n, final.get(uid, 0))
    assert {(u, n) for u, n in final.items()} == expected


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Feed two micro-batches; rows older than the watermark horizon are
    dropped from the append-mode windowed aggregate."""
    d1 = str(tmp_path / "in")
    schema = "ts timestamp, v double"
    spark.createDataFrame(
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 12:00:00", 1.0)], ["ts_s", "v"]
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "v").write.mode(
        "overwrite"
    ).parquet(d1)

    src = spark.readStream.schema(schema).parquet(d1)
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # batch 2: one in-time row (13:00) and one very late row (09:00, behind
    # the 12:00-10min watermark) — the late row must not resurrect its window
    spark.createDataFrame(
        [("2024-01-01 13:00:00", 1.0), ("2024-01-01 09:00:00", 99.0)], ["ts_s", "v"]
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "v").write.mode(
        "append"
    ).parquet(d1)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    emitted_windows = {r.w.start.hour for r in rows}
    assert 9 not in emitted_windows  # late row dropped


def test_foreach_batch_sink_to_warehouse(spark, tmp_path):
    """B9: exactly-once-style sink — each micro-batch appends a snapshot to
    the versioned warehouse table via foreachBatch (the Iceberg-sink shape)."""
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _event_stream(spark).select("event_id", "user_id", "event_type", "value")

    state = {"first": True}

    def sink(batch_df, epoch_id):
        if state["first"]:
            wh.create_or_replace("events_sink", batch_df)
            state["first"] = False
        else:
            wh.append("events_sink", batch_df)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    total = _events_batch(spark).count()
    assert wh.read("events_sink").count() == total
    assert wh.snapshots("events_sink").count() >= 1


def test_incremental_microbatches_with_watermark(spark, tmp_path):
    """Genuine incremental processing: maxFilesPerTrigger=1 forces one
    micro-batch per input file; the windowed aggregate accumulates across
    batches and matches the batch-mode result at the end."""
    from apache_iceberg_demo_spark.io import load

    src_dir = str(tmp_path / "in")
    ev = load(spark, SF, "events")  # handles the TIMESTAMP(NANOS) parquet
    # split events into 4 files -> 4 micro-batches (ts already µs here)
    ev.repartition(4).write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 4  # one per file (plus possible empty batches)

    got = {
        (r.ws, r.event_type, r.n) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    expected = {
        (r.ws, r.event_type, r.n)
        for r in registry.QUERIES["b9_tumbling_window"](spark, SF)
        .withColumnRenamed("window_start", "ws")
        .select("ws", "event_type", "n")
        .collect()
    }
    assert got == expected


def test_stream_stream_join(spark, tmp_path):
    """Genuine two-stream interval join: clicks and purchases stream from
    the file-replay source, both watermarked, joined on user + 1 h bound in
    append mode — pair count must equal the registered batch form."""
    from apache_iceberg_demo_spark.registry import QUERIES
    from apache_iceberg_demo_spark.streaming.windows import event_stream_source

    batch = QUERIES["b9_stream_stream_interval_join"](spark, SF).collect()[0]

    src = event_stream_source(spark, SF)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
    assert got == batch.n_pairs


def test_foreach_batch_merge_sink_registered(spark):
    """B9+C6 registered op: micro-batched MERGE accumulation into the
    versioned table; the op self-asserts ≥3 snapshots and exact (DECIMAL)
    equality with the one-shot batch aggregate — here we re-check the
    returned totals against an independent recompute."""
    from apache_iceberg_demo_spark.registry import QUERIES, load_all
    from apache_iceberg_demo_spark.io import load
    from pyspark.sql import functions as F

    load_all()
    out = QUERIES["b9_foreachbatch_merge_sink"](spark, "/root/testdata/sf0.001")
    rows = {(r.event_type, r.n) for r in out.collect()}
    expect = {
        (r.event_type, r.n)
        for r in load(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows == expect


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """B9: `dropDuplicatesWithinWatermark` (Spark 3.5+) — duplicates of the
    same key arriving within the watermark horizon collapse to one emission,
    and state for a key is dropped once the watermark passes it (bounded
    state, unlike key-forever dropDuplicates). Planted duplicate event_ids
    across two files must emit exactly once each."""
    import pandas as pd

    src_dir = str(tmp_path / "dup_src")
    base = _events_batch(spark).select("event_id", "ts", "user_id").limit(200)
    base.write.mode("overwrite").parquet(src_dir)
    # second file: the same 50 events re-delivered (at-least-once source)
    base.limit(50).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, user_id bigint")
        .parquet(src_dir)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = _run_to_memory(stream)
    got = spark.sql(f"SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM {name}").collect()[0]
    assert got.n == got.d == base.count()


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """B9 durability: a restarted query on the SAME checkpoint resumes from
    the committed offset log — the second run must process only the file
    added while the stream was down, never re-emitting the first batch
    (exactly-once over restarts, the property checkpoints exist for)."""
    src = str(tmp_path / "resume_src")
    ckpt = str(tmp_path / "resume_ckpt")
    out = str(tmp_path / "resume_out")
    base = _events_batch(spark).select("event_id", "user_id").limit(100)
    base.coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        # file sink, not memory: the memory sink can't recover a checkpoint
        q = (
            spark.readStream.schema("event_id bigint, user_id bigint")
            .parquet(src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    assert run_once() == 100
    # stream is down; 40 more rows arrive
    base.limit(40).withColumn("event_id", F.col("event_id") + 1_000_000).coalesce(
        1
    ).write.mode("append").parquet(src)
    # cumulative output is 140, not 240 — the first batch was not re-emitted
    assert run_once() == 140


def test_stream_static_join_matches_batch(spark):
    """B9: the genuine stream-static join run — file-replay stream joined to
    the static customer dim per micro-batch must equal the batch result."""
    from apache_iceberg_demo_spark.io import load as _load
    from apache_iceberg_demo_spark.registry import QUERIES, load_all

    load_all()
    SFD = "/root/testdata/sf0.001"
    src = _event_stream(spark).filter(F.col("event_type").isin("purchase", "click"))
    dim = _load(spark, SFD, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        src.join(dim, src.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("seg_value"))
    )
    name = _run_to_memory(agg, mode="complete")
    got = {
        (r.c_mktsegment, r.n_events, r.seg_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.c_mktsegment, r.n_events, r.seg_value)
        for r in QUERIES["b9_stream_static_enrichment"](spark, SFD).collect()
    }
    assert got == want


def test_stream_dedup_watermark_exact(spark):
    """At-least-once replay with injected duplicates dedups to exactly the
    base event set (the operator raises internally on any divergence)."""
    row = registry.QUERIES["b9_stream_dedup_watermark"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.dedup_exact
    assert row.n_dups_injected > 0  # the replay genuinely contained dups
    assert row.n_streamed == row.n_base


def test_stream_left_outer_interval_join_exact(spark):
    """Genuine streamed left-outer interval join: matches equal batch,
    settled-region nulls exact, nothing emitted early (the operator raises
    internally on any divergence)."""
    row = registry.QUERIES["b9_stream_left_outer_interval_join"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.outer_semantics_exact
    assert row.n_matched > 0
    # at most the watermark-defining tail stays unsettled
    assert row.n_null_emitted <= row.n_unmatched_batch_total
    assert row.n_null_emitted >= row.n_unmatched_batch_total - 5
