"""Source-format surface (SURVEY.md §2 B1) beyond the testdata parquet.

The reference's only ingest format is CSV (``csv_to_ice.py:17`` — covered by
``ingest.py``); a complete engine also reads/writes JSON-lines and
partitioned parquet. These roundtrips run through temp dirs: write with one
layout decision, read back, verify by aggregate checksum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_iceberg_demo_spark.io import load, scratch_dir
from apache_iceberg_demo_spark.registry import register


@register(
    "b1_json_roundtrip",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 6) AS total
        FROM events
        WHERE event_id < 2000
        GROUP BY event_type
    """,
)
def b1_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: JSON-lines sink + schema-declared source (no inference job —
    explicit schema is the 100 TB rule; inference is a full extra scan).

    Oracle-paired: the oracle computes the same aggregate straight from the
    parquet table — equality proves the JSON write/read preserved every row
    and value exactly (doubles survive via Jackson's shortest-roundtrip
    encoding, timestamps via ISO-8601 with microseconds)."""
    tmp = scratch_dir("json_rt_")
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ev.write.mode("overwrite").json(tmp)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(tmp)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total")
    )


@register(
    "b1_orc_roundtrip",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS total_price
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def b1_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: ORC sink + source roundtrip (Spark-native columnar format beside
    parquet). The oracle computes the same aggregate straight from the
    parquet table — equality proves the ORC write/read preserved every row
    and value exactly. Full table, no sampling, so the roundtrip itself is
    the thing under test."""
    tmp = scratch_dir("orc_rt_")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").orc(tmp)
    back = spark.read.orc(tmp)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 6
        ).alias("total_price"),
    )


@register(
    "b1_partitioned_parquet_roundtrip",
    oracle="""
        SELECT l_returnflag AS rf,
               CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
                   AS total
        FROM lineitem
        WHERE l_returnflag = 'A'
        GROUP BY l_returnflag
    """,
)
def b1_partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: hive-partitioned parquet write + partition-pruned read — the scan
    reads only the selected partition directory (partition pruning at the
    file-listing level, before any footer is opened). Oracle-paired: the
    oracle recomputes the pruned partition's aggregate straight from the
    source table, so equality proves the partitioned layout lost nothing."""
    tmp = scratch_dir("pq_rt_")
    li = load(spark, sf_dir, "lineitem")
    li.withColumn("rf", F.col("l_returnflag")).write.mode("overwrite").partitionBy(
        "rf"
    ).parquet(tmp)
    pruned = spark.read.parquet(tmp).filter(F.col("rf") == "A")
    return pruned.groupBy("rf").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 6
        ).alias("total"),
    )


@register(
    "b1_csv_malformed_modes",
    # The fixture is deterministic (50 clean + 2 malformed lines), so the
    # expected mode-by-mode counts are compile-time constants — the oracle
    # pins them, turning the self-asserts into a driver hash gate too.
    oracle="""
        SELECT CAST(52 AS BIGINT) AS rows_permissive,
               CAST(50 AS BIGINT) AS rows_clean,
               CAST(2 AS BIGINT) AS rows_quarantined,
               CAST(50 AS BIGINT) AS rows_dropmalformed,
               TRUE AS failfast_raised
    """,
)
def b1_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: dirty-CSV ingestion policy — the three Spark parse modes over the
    same file with two malformed lines (wrong arity / unparseable number):

    - PERMISSIVE + `columnNameOfCorruptRecord`: bad lines survive as raw
      text in a quarantine column (the audit-and-reprocess path)
    - DROPMALFORMED: bad lines silently dropped
    - FAILFAST: the load refuses the file outright

    Two measured Spark subtleties the docstring is the warning label for:
    (1) malformedness is judged against the columns the query actually
    READS — `count()` over a column-pruned scan drops nothing, so the
    DROPMALFORMED leg materializes every column; (2) a value-unparseable
    field still null-fills in DROPMALFORMED when that column isn't
    required, so reconciliation must force the full schema on both legs.

    Self-verified: clean/corrupt counts must reconcile across all three
    modes (clean_permissive == clean_drop, corrupt == total - clean,
    FAILFAST must raise). The A1 ingest contract (`csv_to_ice.py:17` reads
    raw CSV with inferSchema) says nothing about bad rows — at 100 TB of
    crawled CSV the quarantine column IS the operator."""
    import os

    from apache_iceberg_demo_spark.io import scratch_dir

    d = scratch_dir("csv_dirty_")
    path = os.path.join(d, "dirty.csv")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write("id,qty,price\n")
            for i in range(50):
                f.write(f"{i},{i % 7},{i * 1.5}\n")
            f.write("50,three,4.5\n")  # unparseable qty
            f.write("51,2,not-a-price\n")  # unparseable price
    schema = "id INT, qty INT, price DOUBLE, _corrupt STRING"

    permissive = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .cache()
    )
    n_total = permissive.count()
    n_corrupt = permissive.filter(F.col("_corrupt").isNotNull()).count()

    dropped = (
        spark.read.schema("id INT, qty INT, price DOUBLE")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    # collect() requires every column, so the parser judges the full row;
    # a pruned count() would read zero columns and drop nothing
    n_drop = len(dropped.collect())

    failed = False
    try:
        (
            spark.read.schema("id INT, qty INT, price DOUBLE")
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(path)
            .collect()
        )
    except Exception:
        failed = True

    permissive.unpersist()
    assert n_corrupt == 2, f"expected 2 corrupt rows, got {n_corrupt}"
    assert n_drop == n_total - n_corrupt, "DROPMALFORMED != clean rows"
    assert failed, "FAILFAST accepted a malformed file"
    return spark.createDataFrame(
        [(n_total, n_total - n_corrupt, n_corrupt, n_drop, failed)],
        "rows_permissive bigint, rows_clean bigint, rows_quarantined bigint, "
        "rows_dropmalformed bigint, failfast_raised boolean",
    )


@register(
    "b1_metadata_columns",
    # Each testdata table is a single parquet file, so the per-file metadata
    # aggregate is fully determined by the table itself: one row, the file's
    # basename, n rows, and a dense 0..n-1 row_index.
    oracle="""
        SELECT 'lineitem.parquet' AS file_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS min_idx,
               CAST(count(*) - 1 AS BIGINT) AS max_idx,
               CAST(count(*) AS BIGINT) AS n_distinct_idx
        FROM lineitem
    """,
)
def b1_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: the hidden ``_metadata`` struct every file scan carries —
    file_name / file_size / row_index per row, surfaced only when selected
    (lineage provenance without storing it; the file-source analogue of
    Iceberg's ``_file`` metadata column).

    Self-verified: per-file row counts recomputed FROM the metadata column
    must equal the parquet footers' own row counts, and row_index must be a
    dense 0..n-1 sequence within each file (min 0, max n-1, n distinct)."""
    import os
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    per_file = (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.row_index").alias("row_index"),
        )
        .groupBy("file_name")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("row_index").alias("min_idx"),
            F.max("row_index").alias("max_idx"),
            F.countDistinct("row_index").cast("bigint").alias("n_distinct_idx"),
        )
    )
    rows = per_file.collect()
    # The oracle pins a single file named lineitem.parquet. If a testdata
    # vintage ever splits the table into part files or renames it, fail HERE
    # with a clear message instead of surfacing a confusing oracle hash
    # mismatch (same drift class as the round-4 events.ts regression).
    if len(rows) != 1 or rows[0]["file_name"] != "lineitem.parquet":
        raise AssertionError(
            "testdata drift: b1_metadata_columns oracle assumes one file "
            f"named lineitem.parquet, scan saw {[r['file_name'] for r in rows]}"
        )
    footer_rows = pq.ParquetFile(path).metadata.num_rows
    got_total = sum(r["n_rows"] for r in rows)
    if got_total != footer_rows:
        raise AssertionError(
            f"_metadata-derived rows {got_total} != parquet footer {footer_rows}"
        )
    for r in rows:
        if not (
            r["min_idx"] == 0
            and r["max_idx"] == r["n_rows"] - 1
            and r["n_distinct_idx"] == r["n_rows"]
        ):
            raise AssertionError(f"row_index not dense in {r['file_name']}: {r}")
    return per_file.orderBy("file_name")


@register(
    "b1_binaryfile_ingest",
    # The blobs are the documents' utf-8 text bytes (multimodal_table), so
    # length and content digest of every read-back file are relational:
    # sha256 over the same bytes on both engines. Environment-specific facts
    # (paths, mtimes) stay out of the frame; byte-identity of EVERY blob is
    # additionally asserted in-query via the full-outer join audit.
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS length,
               substring(sha256(text), 1, 16) AS sha256_prefix
        FROM documents WHERE doc_id < 200
    """,
)
def b1_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+C4: ingest loose binary files (a crawler's image drop) with the
    ``binaryFile`` source — (path, modificationTime, length, content) rows,
    the front door of every multimodal pipeline before blobs land in a
    columnar table.

    The fixture files are written EXECUTOR-SIDE via ``mapInPandas`` (on a
    cluster the directory is an object-store prefix; nothing routes through
    the driver), then read back with ``binaryFile`` + ``pathGlobFilter``.
    The source pushes filters on path/length/modificationTime down to the
    file listing — at 100 TB the listing, not the bytes, is the first
    bottleneck, which is why the blob content is lazy-loaded per matched
    file and a ``length < x`` predicate never opens a single oversized blob.

    Self-verifying: every written blob is read back byte-identical (binary
    equality, not just length), ids round-trip through the filename, and
    the file count matches exactly.
    """
    import os

    import pandas as pd

    from apache_iceberg_demo_spark.operators.multimodal import multimodal_table

    src = multimodal_table(spark, sf_dir).filter(F.col("doc_id") < 200)

    drop_dir = scratch_dir(f"binfiles_{os.path.basename(sf_dir)}_")
    marker = os.path.join(drop_dir, "_ready")
    if not os.path.exists(marker):

        def dump(batches):
            n = 0
            for pdf in batches:
                for did, blob in zip(pdf["doc_id"], pdf["image"]):
                    with open(
                        os.path.join(drop_dir, f"img_{did}.bin"), "wb"
                    ) as f:
                        f.write(blob)
                n += len(pdf)
            yield pd.DataFrame({"n": [n]})

        src.select("doc_id", "image").mapInPandas(dump, "n bigint").agg(
            F.sum("n")
        ).collect()
        open(marker, "w").close()

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "img_*.bin")
        .load(drop_dir)
        .withColumn(
            "doc_id",
            F.regexp_extract(
                F.element_at(F.split("path", "/"), -1), r"img_(\d+)\.bin", 1
            ).cast("bigint"),
        )
    )

    n_src = src.count()
    joined = files.join(src, "doc_id", "full")
    n_bad = joined.where(
        F.col("content").isNull()
        | F.col("image").isNull()
        | (F.col("content") != F.col("image"))
        | (F.col("length") != F.col("n_bytes"))
    ).count()
    if n_bad or files.count() != n_src:
        raise AssertionError(
            f"binaryFile roundtrip diverged: {n_bad} mismatched blobs, "
            f"{files.count()} files vs {n_src} sources"
        )
    return files.select(
        "doc_id",
        "length",
        F.substring(F.sha2("content", 256), 1, 16).alias("sha256_prefix"),
    )


@register(
    "b1_mergeschema_landing",
    # Batch 1 = even doc_ids (doc_id, text, source); batch 2 = odd doc_ids
    # (doc_id, text, lang, n_chars). The merged scan's group-by-source
    # aggregate is therefore pure arithmetic on the source table: batch-2
    # rows land in the NULL-source group, and lang/n_chars are non-null
    # exactly on odd doc_ids.
    oracle="""
        SELECT CASE WHEN doc_id % 2 = 0 THEN source END AS source,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(CASE WHEN doc_id % 2 = 1 THEN lang END) AS BIGINT)
                   AS n_with_lang,
               CAST(count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
                   AS n_with_chars
        FROM documents
        WHERE doc_id < 400
        GROUP BY 1
    """,
)
def b1_mergeschema_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: schema-drifting landing zone — two parquet batches with different
    column sets under one prefix, read with ``mergeSchema=true``. The
    crawler-era batches lack later columns; the merged scan unions the
    schemas and null-fills history, which is how a 100 TB raw zone absorbs
    producer-side schema drift without rewriting old files (footer-level
    merge at planning time; Spark reads each file with its own physical
    schema).

    Self-verifying: merged column set is exactly the union, row counts add,
    early-batch rows carry NULLs for the late columns, and the merged
    content equals the explicit ``unionByName(allowMissingColumns=True)``
    of the two batches (exceptAll both ways empty).
    """
    import os

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    b1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "source")
    b2 = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang", "n_chars"
    )

    zone = scratch_dir(f"mergeschema_{os.path.basename(sf_dir)}_")
    marker = os.path.join(zone, "_ready")
    if not os.path.exists(marker):
        b1.write.mode("overwrite").parquet(os.path.join(zone, "batch=1"))
        b2.write.mode("overwrite").parquet(os.path.join(zone, "batch=2"))
        open(marker, "w").close()

    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", zone)
        .parquet(os.path.join(zone, "batch=1"), os.path.join(zone, "batch=2"))
        .drop("batch")
    )
    cols = set(merged.columns)
    if cols != {"doc_id", "text", "source", "lang", "n_chars"}:
        raise AssertionError(f"merged schema wrong: {sorted(cols)}")
    n1, n2 = b1.count(), b2.count()
    if merged.count() != n1 + n2:
        raise AssertionError("merged row count != sum of batches")
    if merged.where(F.col("lang").isNull()).count() != n1:
        raise AssertionError("early-batch rows must null-fill late columns")
    expected = b1.unionByName(b2, allowMissingColumns=True)
    aligned = merged.select(*expected.columns)
    if aligned.exceptAll(expected).count() or expected.exceptAll(aligned).count():
        raise AssertionError("merged content != explicit unionByName")
    return merged.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        F.count("lang").alias("n_with_lang"),
        F.count("n_chars").alias("n_with_chars"),
    )
