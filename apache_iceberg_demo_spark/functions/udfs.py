"""UDF surface (SURVEY.md §2 B10) — the Python escape hatch, used correctly.

Demonstrates every UDF tier with its cost model stated, oracle-paired where
the semantics are SQL-expressible so even the Python paths get value-hash
verification:

- scalar `@pandas_udf` (Arrow-vectorized Series→Series) — the default
  Python path, ~10-100× faster than row-at-a-time
- grouped-agg `@pandas_udf` (Series→scalar) — vectorized custom aggregates
- `applyInPandas` (grouped map) — per-group pandas frames, for logic that
  genuinely needs the whole group
- `mapInPandas` (partition batch iterator) — custom scans/decoders
- row-at-a-time `F.udf` — included deliberately as the anti-pattern tier,
  pinned to a 25-row dimension table

At 100 TB: the pandas tiers stream Arrow batches per partition (never
driver-side); `applyInPandas` requires the whole group in memory — callers
must bound group size (documented per operator).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@F.pandas_udf(T.DoubleType())
def _net_price(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    return ext * (1.0 - disc) * (1.0 + tax)


@register(
    "b10_pandas_udf_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net
        FROM lineitem
        WHERE l_linenumber = 2
    """,
)
def b10_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: scalar pandas UDF (Arrow batches; float64 math matches SQL)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(_net_price("l_extendedprice", "l_discount", "l_tax"), 6).alias("net"),
    )


@F.pandas_udf(T.DoubleType())
def _median(v: pd.Series) -> float:
    return float(v.median())


@register(
    "b10_grouped_agg_median",
    oracle="""
        SELECT lang, round(median(n_chars), 6) AS median_chars
        FROM documents
        GROUP BY lang
    """,
)
def b10_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: grouped-aggregate pandas UDF — exact median per group (pandas
    linear interpolation == DuckDB median for even counts)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(_median("n_chars"), 6).alias("median_chars")
    )


@register(
    "b10_apply_in_pandas_zscore",
    oracle="""
        SELECT doc_id, lang,
               round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                     / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z
        FROM documents
    """,
)
def b10_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: grouped-map `applyInPandas` — per-lang z-score normalization.

    Group = one language (bounded cardinality ⇒ bounded group memory). The
    same result is SQL-expressible (window funcs), which is exactly why it's
    chosen: the Python path gets full oracle verification.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z": ((pdf["n_chars"] - mu) / sd).round(6),
            }
        )

    return d.groupBy("lang").applyInPandas(zscore, schema="doc_id bigint, lang string, z double")


@register(
    "b10_map_in_pandas_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(text) AS BIGINT) AS n_chars_actual
        FROM documents
    """,
)
def b10_map_in_pandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: `mapInPandas` partition-batch iterator — vectorized tokenize."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int64"),
                    "n_chars_actual": pdf["text"].str.len().astype("int64"),
                }
            )

    return d.mapInPandas(
        count_tokens, schema="doc_id bigint, n_tokens bigint, n_chars_actual bigint"
    )


@register(
    "b10_python_udf_rowwise",
    oracle="""
        SELECT n_nationkey, n_name,
               concat(upper(substr(n_name, 1, 1)), lower(substr(n_name, 2))) AS title_name
        FROM nation
    """,
)
def b10_python_udf_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: row-at-a-time Python UDF — THE ANTI-PATTERN TIER (per-row serde,
    no vectorization, ~100× slower than built-ins). Deliberately confined to
    the 25-row nation dim; at scale this same logic is `F.initcap`."""

    @F.udf(T.StringType())
    def title_case(s: str) -> str:
        return s[:1].upper() + s[1:].lower() if s else s

    n = load(spark, sf_dir, "nation")
    return n.select("n_nationkey", "n_name", title_case("n_name").alias("title_name"))


@register(
    "b10_udtf_explode_bigrams",
    oracle="""
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' '))),
                   i -> string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1]
               )) AS bigram
        FROM documents
        WHERE doc_id < 200
    """,
)
def b10_udtf_explode_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: table-function surface — 1 row → N rows via mapInPandas yielding
    expanded frames (word bigrams per document). Oracle-paired: DuckDB
    rebuilds the same adjacent-word pairs with a list comprehension over the
    split array (1-based; single-word docs expand to zero rows both sides)."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )

    def bigrams(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_bgs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ")
                for i in range(len(words) - 1):
                    out_ids.append(doc_id)
                    out_bgs.append(f"{words[i]} {words[i + 1]}")
            yield pd.DataFrame({"doc_id": out_ids, "bigram": out_bgs})

    return d.mapInPandas(bigrams, schema="doc_id bigint, bigram string")


@register(
    "b10_python_udtf_chunks",
    oracle="""
        WITH d AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
        ),
        c AS (
            SELECT doc_id, n,
                   CASE WHEN n <= 64 THEN 1
                        ELSE CAST(ceil((n - 64) / 48.0) AS INT) + 1 END AS n_chunks
            FROM d
        ),
        e AS (
            SELECT doc_id, n, unnest(range(0, n_chunks)) AS i FROM c
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(i * 48 AS INT) AS start_tok,
               CAST(least(64, n - i * 48) AS INT) AS n_tokens
        FROM e
    """,
)
def b10_python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: genuine Python UDTF (Spark 4 ``@udtf`` class) via LATERAL join —
    the context-window chunker every pretraining pipeline runs: each document
    expands to overlapping token windows (width 64, stride 48; the final
    window carries the tail).

    This is the one UDF tier the others can't express: a *table* function
    whose output cardinality is data-dependent per input row, composed in
    SQL with LATERAL. Executes row-at-a-time in Python workers — acceptable
    here because cost is O(chunks) string splits; a hot 100 TB path would
    move the same loop into `mapInPandas` (see `b10_udtf_explode_bigrams`)
    or `F.sequence` + `F.slice`. Oracle-paired: the chunk layout is pure
    arithmetic on the token count, so DuckDB reproduces it exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, start_tok int, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            n = len(text.split(" "))
            W, S = 64, 48
            idx, start = 0, 0
            while True:
                end = min(start + W, n)
                yield idx, start, end - start
                if end >= n:
                    break
                idx, start = idx + 1, start + S

    from apache_iceberg_demo_spark.io import register_views

    spark.udtf.register("chunk_doc", ChunkDoc)
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.start_tok, c.n_tokens
        FROM documents d, LATERAL chunk_doc(d.text) c
        """
    )


@register(
    "b10_map_in_arrow_stats",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_arrow
        FROM documents
    """,
)
def b10_map_in_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: ``mapInArrow`` — the zero-copy tier below mapInPandas: RecordBatch
    in, RecordBatch out, no pandas conversion at all. The right tier for
    kernels that already speak Arrow (tokenizers, codecs); per-batch cost is
    pure pyarrow.compute, oracle-verified against the SQL equivalent."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.int64()),
                    pc.utf8_length(text).cast(pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_chars_arrow"],
            )

    return d.mapInArrow(
        stats, schema="doc_id bigint, n_tokens bigint, n_chars_arrow bigint"
    )


@register(
    "b10_arrow_scalar_udf",
    oracle="""
        SELECT p_partkey,
               round(p_retailprice * 1.1, 6) AS uplift_price
        FROM part
        WHERE p_size >= 40
    """,
)
def b10_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: Arrow-optimized scalar Python UDF (``F.udf(useArrow=True)``,
    Spark 3.5+) — row signature like a classic UDF but Arrow-batched
    transport, the drop-in upgrade path for legacy row UDFs that can't be
    rewritten as pandas_udf. Pinned to a filtered dimension; the oracle
    verifies values end-to-end. Round-6, not round-2: a 2-decimal price × 1.1
    can land EXACTLY on a 2-decimal midpoint where Python (banker's on the
    binary double) and DuckDB (decimal half-up) disagree; no product of a
    finite double is exactly representable at the 6th decimal, so round-6 is
    the engine-stable form (float discipline, CLAUDE.md)."""
    uplift = F.udf(lambda p: round(p * 1.1, 6), T.DoubleType(), useArrow=True)
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return p.select("p_partkey", uplift("p_retailprice").alias("uplift_price"))


@register(
    "b10_pandas_udf_scalar_iter",
    oracle="""
        SELECT doc_id, round(ln(1 + n_chars), 6) AS model_score
        FROM documents
    """,
)
def b10_pandas_udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: the ITERATOR-form pandas UDF (Iterator[Series] → Iterator[Series])
    — completes the tier matrix. Its reason to exist: expensive per-worker
    init (a model, a tokenizer) runs ONCE per partition's batch stream, not
    once per Arrow batch — the shape every embed/score stage at 100 TB uses.
    Here the "model" is the pre-loop constant; everything after it streams
    Arrow batches through the already-initialized state.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def model_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        model_bias = np.float64(1.0)  # "load the model" — once per stream
        for s in batches:
            yield np.round(np.log(model_bias + s.astype("float64")), 6)

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", model_score(F.col("n_chars")).alias("model_score"))
