"""Reproducible sampling, mixture weighting, and split assignment (C-surface
extension) — the dataset-curation stage of an LLM training pipeline.

Everything here is **hash-deterministic**, never RNG-seeded: a row's sample /
split membership is a pure function of its key, so membership is stable
across runs, engines, cluster sizes, and re-partitioning — the property that
matters when a 100 TB corpus is re-materialized and the holdout set must not
drift. MD5 produces identical hex on Spark and DuckDB, which also makes every
operator oracle-pairable (seeded `df.sample()` would not be).

Scale notes: each operator is a scan + filter (no shuffle); the mixture
report is one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex chars of the
    key, mod n. Identical on any engine that speaks MD5."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % n_buckets


def _duck_bucket(expr: str, n: int = 100) -> str:
    """DuckDB spelling of the same bucket function."""
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT) % {n}"
    )


@register(
    "s1_hash_sample_10pct",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {_duck_bucket('doc_id')} < 10
    """,
)
def s1_hash_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: reproducible 10% sample by content-key hash — membership is a pure
    function of doc_id (survives re-runs, re-shards, engine changes)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(hash_bucket(F.col("doc_id")) < 10).select("doc_id", "lang")


@register(
    "s1_train_val_test_split",
    oracle=f"""
        SELECT CASE WHEN {_duck_bucket('doc_id')} < 80 THEN 'train'
                    WHEN {_duck_bucket('doc_id')} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
)
def s1_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: 80/10/10 train/val/test assignment by key hash — the same document
    lands in the same split forever; no seed to lose, no shuffle to leak."""
    d = load(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return d.groupBy(split).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "s1_mixture_weighted",
    oracle=f"""
        WITH weighted AS (
            SELECT *,
                   CASE WHEN lang = 'en' THEN 80 ELSE 30 END AS keep_pct
            FROM documents
        )
        SELECT lang, count(*) AS n_kept
        FROM weighted
        WHERE {_duck_bucket('doc_id')} < keep_pct
        GROUP BY lang
    """,
)
def s1_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: mixture re-weighting — per-stratum keep rates (80% en, 30% rest)
    applied via the same hash buckets. This is dataset-mixing (upweight a
    language/source) as one scan-level filter; at 100 TB the weights table
    would broadcast-join instead of inlining as a CASE."""
    d = load(spark, sf_dir, "documents")
    keep_pct = F.when(F.col("lang") == "en", 80).otherwise(30)
    return (
        d.withColumn("keep_pct", keep_pct)
        .filter(hash_bucket(F.col("doc_id")) < F.col("keep_pct"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )


@register(
    "s1_stratified_sample_by",
    # The seeded Bernoulli counts themselves are engine-internal RNG, but
    # the statistical CONTRACT is oracle-checkable (r09 VERDICT item 5):
    # per-stratum population counts + fractions are relational, and the
    # sampled count must sit within exact 6-sigma binomial bounds — the
    # boolean is TRUE on both sides or the value hash goes red.
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(CASE lang WHEN 'en' THEN 0.8 ELSE 0.3 END AS DOUBLE)
                   AS keep_frac,
               TRUE AS sampled_within_6sigma
        FROM documents
        WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')
        GROUP BY lang
        ORDER BY lang
    """,
)
def s1_stratified_sample_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: Spark's native stratified `sampleBy` (per-stratum fractions,
    seeded Bernoulli) — included for API surface; the hash-bucket variants
    above are preferred at scale precisely because THIS one's membership
    depends on seed + partitioning. The driver-checked contract is the
    binomial one: each stratum's sampled count within mu ± (6 sigma + 5)
    of n·p — layout-robust (membership may shift with partitioning, the
    bound holds under any layout) yet strict enough that a broken sampler
    (wrong stratum keys, double-sampling, fraction drift) fails the hash."""
    langs = ["en", "de", "fr", "es", "zh"]
    d = load(spark, sf_dir, "documents").filter(F.col("lang").isin(langs))
    fractions = {"en": 0.8, "de": 0.3, "fr": 0.3, "es": 0.3, "zh": 0.3}
    sampled = (
        d.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    totals = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_total"))
    p = F.when(F.col("lang") == "en", F.lit(0.8)).otherwise(F.lit(0.3))
    mu = F.col("n_total") * p
    sigma = F.sqrt(F.col("n_total") * p * (1.0 - p))
    return (
        totals.join(sampled, "lang", "left")
        .na.fill({"n_sampled": 0})
        .select(
            "lang",
            "n_total",
            p.alias("keep_frac"),
            (F.abs(F.col("n_sampled") - mu) <= 6.0 * sigma + 5.0).alias(
                "sampled_within_6sigma"
            ),
        )
        .orderBy("lang")
    )


@register(
    "s1_mixture_temperature",
    oracle=f"""
        WITH counts AS (
            SELECT source, count(*) AS n FROM documents GROUP BY source
        ),
        rates AS (
            SELECT source,
                   CAST(floor(100.0 * sqrt(n) / (SELECT max(sqrt(n)) FROM counts))
                        AS BIGINT) AS keep_pct
            FROM counts
        )
        SELECT d.source, r.keep_pct, CAST(count(*) AS BIGINT) AS n_kept
        FROM documents d JOIN rates r USING (source)
        WHERE {_duck_bucket('d.doc_id')} < r.keep_pct
        GROUP BY d.source, r.keep_pct
    """,
)
def s1_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: temperature-rebalanced source mixing (T=2 → sampling mass ∝
    sqrt of source size, the multilingual/multi-source rebalancing rule:
    big sources are downweighted, small sources kept near-whole).

    Per-source keep rate = floor(100·√n_s / max_s √n_s), applied with the
    same deterministic hash buckets as every sampler here. Spark-first: the
    rate table is a tiny broadcast join (sources ≪ rows); the scalar max
    rides along via a broadcast 1-row crossJoin — no row shuffle at all
    beyond the one count aggregate."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    max_sqrt = counts.agg(F.max(F.sqrt("n")).alias("mx"))
    rates = (
        counts.crossJoin(F.broadcast(max_sqrt))
        .select(
            "source",
            F.floor(100.0 * F.sqrt("n") / F.col("mx")).cast("bigint").alias("keep_pct"),
        )
    )
    return (
        d.join(F.broadcast(rates), on="source")
        .filter(hash_bucket(F.col("doc_id")) < F.col("keep_pct"))
        .groupBy("source", "keep_pct")
        .agg(F.count("*").alias("n_kept"))
    )


@register(
    "s1_split_leakage_audit",
    oracle=f"""
        WITH g AS (
            SELECT sha256(text) AS fp,
                   count(*) AS n_copies,
                   count(DISTINCT CASE WHEN {_duck_bucket('doc_id')} < 80 THEN 'train'
                                       WHEN {_duck_bucket('doc_id')} < 90 THEN 'val'
                                       ELSE 'test' END) AS n_splits
            FROM documents
            GROUP BY sha256(text)
        )
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_groups,
               CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_leaking_groups,
               CAST(sum(CASE WHEN n_splits > 1 THEN n_copies ELSE 0 END) AS BIGINT)
                   AS n_leaked_docs
        FROM g
    """,
)
def s1_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1×C1: holdout-leakage audit — duplicated CONTENT that straddles the
    train/test boundary. Hash-splitting by doc_id is stable, but two copies
    of the same text with different ids can land in different splits, which
    silently inflates eval scores; this is the check every pipeline should
    run after splitting (and why production splits hash the content
    fingerprint, not the row id).

    One scan → hash aggregate on the 32-byte fingerprint (count copies,
    count distinct splits per group) → 1-row rollup. Reports group/document
    leakage counts; the fix (split by `hash(fp)` instead of `hash(doc_id)`)
    is the `s1_train_val_test_split` expression with a different key."""
    d = load(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    g = (
        d.select(F.sha2(F.col("text"), 256).alias("fp"), split.alias("split"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("split").alias("n_splits"),
        )
    )
    leak = F.col("n_splits") > 1
    return g.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum((F.col("n_copies") > 1).cast("int")).cast("bigint").alias("n_dup_groups"),
        F.sum(leak.cast("int")).cast("bigint").alias("n_leaking_groups"),
        F.sum(F.when(leak, F.col("n_copies")).otherwise(0))
        .cast("bigint")
        .alias("n_leaked_docs"),
    )
