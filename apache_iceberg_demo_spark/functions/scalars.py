"""Scalar-function surface (SURVEY.md §2 B8, reference A2/A3).

The reference's only scalar functions are casts (``csv_to_ice.py:19-22``) and
``date_format`` (``csv_to_ice.py:25``); this module provides the full
string / date-time / math / conditional / array / map / JSON gallery the task
spec requires. Everything stays JVM-side (built-in ``pyspark.sql.functions``
inside WholeStageCodegen) — no Python in these hot paths.

Oracle-mapping notes (Spark ↔ DuckDB divergences handled here):
- ``F.log`` is natural log → DuckDB ``ln`` (DuckDB ``log`` is log10)
- ``F.split(s, p)[0]`` is 0-indexed → DuckDB ``string_split(...)[1]``
- ``date_format(ts,'yyyy-MM-dd')`` → DuckDB ``strftime(ts, '%Y-%m-%d')``
- Spark ``dayofweek`` is 1=Sunday → DuckDB ``dayofweek`` is 0=Sunday (+1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register


@register(
    "b8_string_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name)                                   AS name_upper,
               lower(c_mktsegment)                             AS seg_lower,
               length(c_name)                                  AS name_len,
               substr(c_name, 1, 8)                            AS name_prefix,
               concat(c_name, ':', c_mktsegment)               AS name_seg,
               regexp_extract(c_name, '([0-9]+)', 1)           AS name_digits,
               regexp_replace(c_name, '[0-9]', '#', 'g')       AS name_masked,
               string_split(c_name, '#')[1]                    AS name_head,
               reverse(c_mktsegment)                           AS seg_rev,
               trim(concat(' ', c_mktsegment, ' '))            AS seg_trim
        FROM customer
    """,
)
def b8_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: string functions — upper/lower/length/substr/concat/regex/split."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
        F.split("c_name", "#").getItem(0).alias("name_head"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
    )


@register(
    "b8_date_funcs",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d')                        AS order_day,
               CAST(extract(year FROM o_orderdate) AS INT)              AS yr,
               CAST(extract(month FROM o_orderdate) AS INT)             AS mo,
               CAST(extract(day FROM o_orderdate) AS INT)               AS dom,
               CAST(dayofweek(o_orderdate) + 1 AS INT)                  AS dow,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)      AS month_start,
               CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP)         AS due_ts,
               datediff('day', o_orderdate,
                        TIMESTAMP '1998-12-01 00:00:00')                AS days_to_eoy,
               CAST(epoch(o_orderdate) AS BIGINT)                       AS epoch_s
        FROM orders
    """,
)
def b8_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: date/time — format, extract, trunc, interval add, diff, epoch (A3+)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.datediff(
            F.lit("1998-12-01").cast("timestamp"), F.col("o_orderdate")
        ).cast("bigint").alias("days_to_eoy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "b8_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(abs(l_extendedprice - 30000), 6)      AS dist_from_30k,
               round(sqrt(l_extendedprice), 6)             AS root_price,
               round(ln(l_extendedprice + 1), 6)           AS log_price,
               round(pow(l_discount, 2), 6)                AS disc_sq,
               CAST(ceil(l_quantity) AS BIGINT)            AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT)           AS qty_floor,
               CAST(l_linenumber % 3 AS INT)               AS line_mod,
               CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign
        FROM lineitem
        WHERE l_linenumber <= 2
    """,
)
def b8_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: math — abs/sqrt/ln/pow/ceil/floor/mod/sign."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 6).alias("dist_from_30k"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("root_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.signum(F.col("l_extendedprice") - 30000).alias("price_sign"),
    )


@register(
    "b8_conditional",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END                            AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'open')   AS status_label,
               greatest(o_totalprice, 150000.0)               AS floor_price,
               least(o_totalprice, 150000.0)                  AS capped_price,
               CASE WHEN o_orderpriority LIKE '1%'
                    OR o_orderpriority LIKE '2%' THEN true
                    ELSE false END                            AS urgent
        FROM orders
    """,
)
def b8_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: CASE WHEN / coalesce / nullif / greatest / least."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(150000.0)).alias("capped_price"),
        (
            F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%")
        ).alias("urgent"),
    )


@register(
    "b8_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding)                                   AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6)           AS first_component,
               round(list_aggregate(embedding, 'sum'), 6)       AS comp_sum,
               round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS comp_max,
               round(list_aggregate(
                   list_transform(embedding, x -> x * x), 'sum'), 6) AS sq_norm,
               len(list_filter(embedding, x -> x > 0))          AS n_positive
        FROM embeddings
    """,
)
def b8_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: array functions on `array<float>` — size/element_at/aggregate/
    transform/filter. These are the JVM-side primitives the similarity
    operators (C3) build on; no Python UDF in the path."""
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias(
            "first_component"
        ),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 6).alias("comp_sum"),
        F.round(F.array_max(F.col("embedding")).cast("double"), 6).alias("comp_max"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias(
            "n_positive"
        ),
    )


@register(
    "b8_json_funcs",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')               AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT)  AS k_int
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def b8_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: JSON extraction from the `events.props` JSON-string column
    (`get_json_object` + typed `from_json`)."""
    from pyspark.sql import types as T

    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").alias("k_int"),
        )
        .filter(F.col("k_str").isNotNull())
    )


@register(
    "b8_variant_json",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                   AS k_sum,
               min(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
        FROM events
        GROUP BY event_type
    """,
)
def b8_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: VARIANT semi-structured type (Spark 4) — `parse_json` once into
    the binary VARIANT encoding, then typed `variant_get` path extraction.

    The reference stores open-schema event properties as a JSON *string*
    (driver `events.props`); VARIANT is the columnar-engine answer at 100 TB
    — parsed once at ingest, stored binary (shreddable into columns in
    Parquet), every downstream access a typed path lookup instead of a
    re-parse. `b8_json_funcs` registers the string-side functions; this
    registers the typed-value tier over the same data."""
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@register(
    "b8_cast_coercion",
    oracle="""
        SELECT l_orderkey,
               CAST(l_quantity AS INT)                   AS qty_int,
               CAST(l_linenumber AS DOUBLE)              AS line_dbl,
               CAST(l_orderkey AS VARCHAR)               AS key_str,
               CAST(strftime(l_shipdate, '%Y-%m-%d') AS DATE) AS ship_day,
               CAST(l_shipdate AS DATE)                  AS ship_date
        FROM lineitem
        WHERE l_linenumber = 1
    """,
)
def b8_cast_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/B8: the reference's cast surface (``csv_to_ice.py:19-22``) —
    int/double/string/timestamp↔date round-trips."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.date_format("l_shipdate", "yyyy-MM-dd").cast("date").alias("ship_day"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@register(
    "a15_smoke_literal",
    oracle="SELECT 'engine is ready!' AS msg, 1 AS one",
)
def a15_smoke_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: constant select smoke test — the reference's DuckDB readiness
    check (``duckdb_check.py:2``, run at ``cli-steps.txt:12``)."""
    return spark.sql("SELECT 'engine is ready!' AS msg, 1 AS one")


@register(
    "b8_string_distance",
    oracle="""
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS edit_dist
        FROM documents a JOIN documents b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 = 0
    """,
)
def b8_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8/C2: Levenshtein edit distance on blocked prefix pairs — the exact
    string-similarity primitive (O(len²) per pair, so always behind a
    blocking key and a prefix cap at scale)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("source").alias("src_a"),
        F.substring("text", 1, 30).alias("pre_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("source").alias("src_b"),
        F.substring("text", 1, 30).alias("pre_b"),
    )
    return (
        a.join(b, (F.col("src_a") == F.col("src_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pre_a", "pre_b").cast("bigint").alias("edit_dist"),
        )
    )


@register(
    "b8_array_ops_extended",
    oracle="""
        SELECT vec_id,
               round(list_sort(list_transform(embedding, x -> round(CAST(x AS DOUBLE), 3)))[1], 3)
                   AS smallest,
               round(list_reverse_sort(list_transform(embedding, x -> round(CAST(x AS DOUBLE), 3)))[1], 3)
                   AS largest,
               len(list_slice(embedding, 1, 8)) AS head_len,
               CAST(list_contains(list_transform(embedding, x -> x > 0.5),
                    true) AS BOOLEAN) AS has_big_component
        FROM embeddings
    """,
)
def b8_array_ops_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: sort_array / slice / exists over array columns (rounded before
    sorting so float ordering is engine-stable)."""
    e = load(spark, sf_dir, "embeddings")
    rounded = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double"), 3))
    return e.select(
        "vec_id",
        F.round(F.element_at(F.array_sort(rounded), 1), 3).alias("smallest"),
        F.round(F.element_at(F.sort_array(rounded, asc=False), 1), 3).alias("largest"),
        F.size(F.slice(F.col("embedding"), 1, 8)).cast("bigint").alias("head_len"),
        F.exists(F.col("embedding"), lambda x: x > 0.5).alias("has_big_component"),
    )


@register(
    "b8_posexplode_tokens",
    oracle="""
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE doc_id % 20 = 0
    """,
)
def b8_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8/B10: positional explode (UDTF-style 1→N row expansion with the
    element index preserved) — the lateral-view surface."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@register(
    "b8_bitwise_funcs",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255                          AS key_and,
               o_orderkey | 16                           AS key_or,
               xor(o_orderkey, 255)                      AS key_xor,
               (o_orderkey % 1024) << 2                  AS key_shl,
               o_orderkey >> 3                           AS key_shr,
               CAST(bit_count(o_orderkey) AS BIGINT)     AS key_bits
        FROM orders
        WHERE o_orderkey <= 2000
    """,
)
def b8_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: bitwise operators — AND/OR/XOR, shifts, popcount.

    The workhorses behind hash partitioning, bitmap indexes, and bloom-filter
    membership at scale; all stay inside whole-stage codegen (pure JVM
    expressions, no UDF).
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    key = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        key.bitwiseAND(F.lit(255)).alias("key_and"),
        key.bitwiseOR(F.lit(16)).alias("key_or"),
        key.bitwiseXOR(F.lit(255)).alias("key_xor"),
        F.shiftleft(key % 1024, 2).cast("bigint").alias("key_shl"),
        F.shiftright(key, 3).alias("key_shr"),
        F.bit_count(key).cast("bigint").alias("key_bits"),
    )


@register(
    "b8_trig_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(sin(l_discount), 6)                      AS sin_d,
               round(cos(l_discount), 6)                      AS cos_d,
               round(atan2(l_discount, l_tax + 0.01), 6)      AS angle,
               round(degrees(l_discount), 6)                  AS deg_d,
               round(radians(l_quantity), 6)                  AS rad_q,
               round(sqrt(l_discount*l_discount + l_tax*l_tax), 6) AS hyp
        FROM lineitem
        WHERE l_linenumber = 1
    """,
)
def b8_trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: trigonometric battery — sin/cos/atan2/degrees/radians + hypotenuse.

    Geo-distance and embedding-angle math stays JVM-side (codegen'd) instead
    of detouring through numpy; round-6 on every output per float discipline.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    d, t, q = F.col("l_discount"), F.col("l_tax"), F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(d), 6).alias("sin_d"),
        F.round(F.cos(d), 6).alias("cos_d"),
        F.round(F.atan2(d, t + F.lit(0.01)), 6).alias("angle"),
        F.round(F.degrees(d), 6).alias("deg_d"),
        F.round(F.radians(q), 6).alias("rad_q"),
        F.round(F.sqrt(d * d + t * t), 6).alias("hyp"),
    )


@register(
    "b8_struct_funcs",
    oracle="""
        SELECT o_orderkey,
               round(struct_pack(amount := o_totalprice,
                                 status := o_orderstatus).amount, 6)   AS amount,
               struct_pack(amount := o_totalprice,
                           status := o_orderstatus).status             AS status,
               struct_pack(outer_key := o_custkey,
                           inner := struct_pack(pri := o_orderpriority))
                   .inner.pri                                          AS priority
        FROM orders
        WHERE o_orderkey <= 2000
    """,
)
def b8_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: struct construction + (nested) field access — the typed-metadata
    backbone for multimodal columns (``c4_multimodal_metadata`` carries a
    struct payload). Field access is a zero-cost projection in both engines;
    outputs are flattened to scalars because raw struct cells are not
    hash-comparable across engines.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    s = F.struct(
        F.col("o_totalprice").alias("amount"), F.col("o_orderstatus").alias("status")
    )
    nested = F.struct(
        F.col("o_custkey").alias("outer_key"),
        F.struct(F.col("o_orderpriority").alias("pri")).alias("inner"),
    )
    return o.select(
        "o_orderkey",
        F.round(s.getField("amount"), 6).alias("amount"),
        s.getField("status").alias("status"),
        nested.getField("inner").getField("pri").alias("priority"),
    )


@register(
    "b8_try_functions",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice / NULLIF(o_custkey % 7, 0), 6) AS safe_ratio,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
               TRY_CAST(o_orderpriority AS INT) AS bad_cast
        FROM orders
        WHERE o_orderkey % 10 = 0
    """,
)
def b8_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: ANSI-safe `try_*` surface — Spark 4 runs with ANSI mode ON, so a
    plain CAST('2-HIGH' AS INT) or a zero divide THROWS mid-job; `try_cast`
    / `try_divide` are the per-expression opt-outs that degrade to NULL
    instead. On a 100 TB scan one malformed row otherwise kills the whole
    job hours in — the try tier is how pipelines quarantine bad VALUES the
    way PERMISSIVE mode quarantines bad ROWS (`b1_csv_malformed_modes`).
    Oracle spelling: NULLIF for the guarded divide, DuckDB TRY_CAST for the
    casts — NULL outcomes must agree row-for-row."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 7), 6
        ).alias("safe_ratio"),
        F.col("o_orderpriority").substr(1, 1).try_cast("int").alias("prio_num"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
    )
