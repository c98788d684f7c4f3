"""Deduplication operators (north-star C1/C2) — LLM-training-data pipeline.

Exact dedup is a hash aggregate (one shuffle on the dedup key). Near-dup is
the 100 TB-interesting one: all-pairs comparison is O(n²) and impossible at
scale, so both fuzzy variants here are *banded LSH* designs —

- **MinHash + banded LSH** (shingle → k minhashes → b bands → bucket join):
  only documents sharing a band bucket are ever compared, so the join is
  shuffle-bounded by bucket sizes, not n². Candidates are then verified with
  exact n-gram Jaccard (array_intersect/array_union — JVM-side).
- **SimHash**: 64-bit signature from token-hash bit votes; pigeonhole banding
  (4×16-bit chunks) guarantees recall for hamming distance ≤ 3 while joining
  only on chunk equality.

Everything is built from built-in functions (xxhash64, transform, aggregate,
array_*) — no Python in the per-row path, no MLlib dependency, fully
deterministic (fixed hash-family constants), so results are reproducible
across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_iceberg_demo_spark.io import load
from apache_iceberg_demo_spark.registry import register

# Deterministic universal-hash family h_i(x) = (a_i * x32 + b_i) mod P.
# P prime > 2^32; a < 2^30 keeps a*x32 + b < 2^63 (no bigint overflow).
_P = 4294967311
_LCG_M, _LCG_A, _LCG_C = 2**31 - 1, 1103515245, 12345


def _hash_family(k: int, seed: int = 42) -> list[tuple[int, int]]:
    out, x = [], seed
    for _ in range(k):
        x = (_LCG_A * x + _LCG_C) % _LCG_M
        a = (x % (2**30 - 1)) + 1
        x = (_LCG_A * x + _LCG_C) % _LCG_M
        b = x % _P
        out.append((a, b))
    return out


N_HASHES = 32
N_BANDS = 16  # r = 2 rows/band → P(candidate | j=0.6) ≈ 0.999; false candidates
# are cheap because every candidate is exact-Jaccard-verified before emission
_FAMILY = _hash_family(N_HASHES)


def shingles_from_words(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED words column.

    ``words`` must be a bound column (not a `split()` expression): it appears
    inside the transform lambda, and Catalyst inlines lambda-captured
    expressions PER ELEMENT — an inlined split would re-tokenize the document
    ~3×|positions| times (the O(n²) trap measured on c5_fingerprint_winnow;
    fixed here r02: 6.3 s → sub-second per sf0.1 pass)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as a distinct array (JVM-side, no UDF).

    NOTE: evaluates `split()` inside the transform lambda — acceptable for
    tests and one-off expressions, but hot paths must stage the split into
    its own projection and call :func:`shingles_from_words` (see why there)."""
    return shingles_from_words(F.split(text_col, r"\s+"), n)


def hashed_shingles(shingle_col: Column) -> Column:
    """Hash each shingle string ONCE to a 32-bit value; the k minhash
    functions then run on integers (32 string-hash passes would dominate)."""
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(2**32)))


def hashed_word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, hs): 32-bit hashed word-n-gram shingle sets — the production
    shingle path.

    Spark higher-order functions evaluate INTERPRETED (no whole-stage
    codegen), so per-element work must be minimal: instead of building
    n-gram STRINGS and hashing them (one concat_ws + xxhash64 per position —
    measured 6.3 s/5k docs), hash each word once, then combine the n
    word-hashes per position with two arithmetic `zip_with` passes over
    shifted slices (rolling polynomial mix, ~0.6 s/5k docs — 10×). The
    resulting hash family differs from hashing the strings, which is
    irrelevant to MinHash/Jaccard: any fixed deterministic 32-bit shingle
    hash works. Documents shorter than n words have no full n-gram and drop
    out (they can only be exact dups, which C1 catches)."""
    m32 = F.lit(2**32)
    staged = docs.select("doc_id", F.split(F.col("text"), r"\s+").alias("words"))
    wh = staged.select(
        "doc_id",
        F.transform("words", lambda w: F.pmod(F.xxhash64(w), m32)).alias("wh"),
    ).filter(F.size("wh") >= n)
    n_sh = F.size("wh") - (n - 1)
    mixed = F.slice("wh", 1, n_sh)
    for j in range(1, n):
        mixed = F.zip_with(
            mixed,
            F.slice("wh", j + 1, n_sh),
            lambda m, c: F.pmod(m * F.lit(1000003) + c, m32),
        )
    return wh.select("doc_id", F.array_distinct(mixed).alias("hs")).filter(
        F.size("hs") > 0
    )


def minhash_signature(hashed_col: Column) -> Column:
    """k minhashes over pre-hashed shingles: min_i((a*h + b) mod P)."""

    def hasher(a: int, b: int):
        # closure factory: a 1-arg lambda (PySpark counts default args as
        # lambda-variable slots, so `lambda s, a=a: ...` would fail analysis)
        return lambda h: (F.lit(a) * h + F.lit(b)) % _P

    return F.array(
        *[F.array_min(F.transform(hashed_col, hasher(a, b))) for a, b in _FAMILY]
    )


def band_keys(sig_col: Column) -> Column:
    """Group the signature into bands; hash each band to one bucket key."""
    r = N_HASHES // N_BANDS
    return F.array(
        *[
            F.xxhash64(F.concat_ws(",", *[sig_col.getItem(band * r + j).cast("string") for j in range(r)]))
            for band in range(N_BANDS)
        ]
    )


# --- C1: exact dedup -------------------------------------------------------------


@register(
    "c1_dedup_exact_docs",
    oracle="""
        SELECT md5(text) AS content_key,
               min(doc_id) AS keeper_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
)
def c1_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact dedup by content — hash aggregate keyed on md5(text).

    Deterministic keeper (min doc_id), unlike ``dropDuplicates`` which keeps
    an arbitrary row. One shuffle; the shuffled payload is (16-byte key,
    id) — not the document text — which is what makes this viable at 100 TB.
    """
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_key"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


@register(
    "c1_dedup_content_hash",
    oracle="""
        SELECT sha256(concat(text, '|', lang)) AS fingerprint,
               min(doc_id) AS keeper_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY sha256(concat(text, '|', lang))
        HAVING count(*) >= 1
    """,
)
def c1_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: multi-column content fingerprint via SHA-256 (collision-safe key)."""
    d = load(spark, sf_dir, "documents")
    fp = F.sha2(F.concat(F.col("text"), F.lit("|"), F.col("lang")), 256)
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    )


# --- C2: near-dup via MinHash + banded LSH ---------------------------------------

# The hashed-shingle cache from the most recent minhash invocation; the next
# invocation (or tests' teardown) unpersists it so repeated bench/driver runs
# don't accumulate executor storage memory.
_live_caches: list[DataFrame] = []


#: memoized LSH pair results for the registered documents-table op, keyed by
#: sf_dir — c2_dedup_clusters consumes c2_minhash's pairs, and without the
#: memo the whole LSH pipeline (the most expensive plan in the repo) would
#: re-run inside the same process. Cleared with the caches it points into.
_pairs_memo: dict[str, DataFrame] = {}


def _release_caches() -> None:
    _pairs_memo.clear()
    while _live_caches:
        df = _live_caches.pop()
        try:
            df.unpersist()
        except Exception:
            # the frame's SparkSession was stopped (session-restart
            # consumers, e.g. tools/determinism_probe.py): its cached
            # blocks died with the session — nothing to release
            pass


def minhash_lsh_pairs(docs: DataFrame, min_jaccard: float = 0.5) -> DataFrame:
    """Core MinHash banded-LSH near-dup pairs over any (doc_id, text) frame.

    Pipeline: shingle(3-gram) → 32 minhashes → 16 bands of 2 → explode
    bands → self-join on (band_idx, bucket) → exact Jaccard on candidates
    → keep pairs ≥ min_jaccard.
    The banded join is the 100 TB path: candidate generation is linear in
    bucket occupancy; the quadratic all-pairs comparison never happens.
    Recall is property-tested with planted mutants (tests/test_llm_ops.py).
    """
    from apache_iceberg_demo_spark.tuning import (
        cpu_spread,
        input_sized_shuffle,
        scoped_conf,
    )

    _release_caches()
    # hashed shingle sets, computed ONCE and cached: reused by the two sides
    # of the band join and the verification joins (without the cache, Spark
    # re-derives the whole shingle+hash pipeline for every self-join branch).
    # cpu_spread first: the shingle+minhash HOFs are interpreted per-row CPU
    # that would otherwise serialize on a 1-2 split scan (see tuning.py)
    hs = hashed_word_shingles(cpu_spread(docs)).cache()
    _live_caches.append(hs)
    # the band/verify shuffles are sized to the SPREAD frame's partitioning,
    # not the raw scan's (sizing from `docs` — 1-2 splits locally — coalesced
    # the post-shuffle stages back down to the floor of 8, partially undoing
    # the fan-out; r09 ADVICE), and the result is materialized INSIDE that
    # scope (a lazily-returned frame would execute after the conf restore,
    # back at the session default — e.g. 200 near-empty tasks per stage in
    # the driver's plain session)
    with scoped_conf(
        docs.sparkSession,
        {"spark.sql.shuffle.partitions": input_sized_shuffle(hs)},
    ):
        out = _minhash_pairs_plan(hs, min_jaccard).cache()
        out.count()
    _live_caches.append(out)
    return out


def _minhash_pairs_plan(hs: DataFrame, min_jaccard: float) -> DataFrame:
    bands = hs.select(
        "doc_id",
        F.posexplode(band_keys(minhash_signature(F.col("hs")))).alias(
            "band_idx", "bucket"
        ),
    )
    # candidate ids only — the shingle arrays never enter the band shuffle
    a, b = bands.alias("a"), bands.alias("b")
    cand_ids = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact-Jaccard verification: join shingle sets back for candidates only
    pairs = (
        cand_ids.join(hs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")), "doc_a")
        .join(hs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")), "doc_b")
    )
    jac = F.size(F.array_intersect("hs_a", "hs_b")) / F.size(F.array_union("hs_a", "hs_b"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


@register("c2_minhash_lsh_neardup")  # rows-only: hash-family internals aren't ANSI SQL
def c2_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: MinHash banded-LSH near-duplicate pairs on the documents corpus.

    Thin registration wrapper over :func:`minhash_lsh_pairs` — the operator
    dedups the REAL table (no synthetic planting in the production path;
    recall on planted mutants is asserted in tests instead). The materialized
    pair set is memoized per sf_dir so a same-process consumer
    (c2_dedup_clusters) reuses it instead of re-running the LSH pipeline.
    """
    memo = _pairs_memo.get(sf_dir)
    # the memo must be SESSION-aware: a frame built in a since-stopped
    # session crashes any method call (session-restart consumers, e.g.
    # tools/determinism_probe.py) — identity-compare its session and
    # rebuild on mismatch (the PQ/demo-warehouse memos key by session id)
    if memo is not None and memo.sparkSession is spark:
        return memo
    out = minhash_lsh_pairs(load(spark, sf_dir, "documents").select("doc_id", "text"))
    _pairs_memo[sf_dir] = out
    return out


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Core SimHash near-dup pairs over any (doc_id, text) frame — 64-bit
    signature via token bit votes, pigeonhole banding (4×16-bit chunks) for
    hamming ≤ max_hamming, verified with bit_count(xor).

    One aggregation builds all 64 bit votes in a single pass (no explode of
    64× rows); the chunk join is equi — shuffle-bounded, never O(n²).
    """
    tokens = F.array_distinct(F.split(F.col("text"), r"\s+"))
    # bit vote b_i = sum over tokens of (hash bit i ? +1 : -1); sign → bit i
    # (cpu_spread measured a wash here — 3x fresh-process A/B at sf0.1 gave
    # identical distributions; the cost is the banded join + verify, already
    # parallel — so the input is NOT spread: don't shuffle corpus text for
    # no measured win)
    th = docs.select("doc_id", F.explode(tokens).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    # assemble bits JVM-side with shiftleft — a Python `1 << 63` literal
    # overflows the JVM long; bit 63 lands in the sign bit via shiftleft
    bit_terms = [
        F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    acc = bit_terms[0]
    for t in bit_terms[1:]:
        acc = acc.bitwiseOR(t)
    sim = votes.select("doc_id", acc.alias("simhash"))
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)) for c in range(4)])
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


@register("c2_simhash_neardup")  # rows-only: xxhash bit-plane internals not ANSI SQL
def c2_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: SimHash near-dup pairs on the documents corpus (see
    :func:`simhash_pairs`; planted-mutant recall lives in tests)."""
    return simhash_pairs(load(spark, sf_dir, "documents").select("doc_id", "text"))


@register(
    "c2_ngram_jaccard_pairs",
    oracle="""
        WITH sh AS (
            SELECT doc_id, source,
                   list_distinct(string_split(text, ' ')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(
                 CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
        FROM sh a JOIN sh b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
              len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
    """,
)
def c2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: exact token-Jaccard pairs *within a blocking key* (source).

    Blocking on a natural key is the classic scalable exact-verify pattern:
    the quadratic blow-up is bounded per block. Oracle-expressible (DuckDB
    list functions), unlike the hash-based variants.
    """
    from apache_iceberg_demo_spark.tuning import cpu_spread

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    # cpu_spread on the PROBE side (r15): the doc table auto-broadcasts, so
    # the blocked self-join is a BroadcastHashJoin probed by the raw 1-2
    # scan splits — the whole quadratic pair verify serialized on 1-2 cores
    # (13-16 s at sf0.1; 1.6-2.0 s spread across the box). No-op on a real
    # cluster where the scan arrives wide. |A∪B| = |A|+|B|-|A∩B| (exact on
    # the distinct arrays) saves the second per-pair array build.
    a, b = cpu_spread(d).alias("a"), d.alias("b")
    inter = F.size(F.array_intersect("a.toks", "b.toks"))
    jac = inter / (F.size("a.toks") + F.size("b.toks") - inter)
    return (
        a.join(b, (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.9)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "jaccard")
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Connected components by iterative label propagation (small-star style):
    every node repeatedly adopts the minimum component id among itself and
    its neighbors until a fixed point. Returns (node, component).

    Spark-first iteration: each round is two hash joins + an aggregate on the
    edge list; convergence in O(log n) rounds for typical dedup graphs (long
    chains are rare — near-dup clusters are dense). Each round's result is
    cached and the loop exits early when no label changes, so the cost is
    rounds × one shuffle over the edge list — at 100 TB this is the standard
    replacement for a driver-side union-find, which cannot hold the nodes.
    """
    # cache the edge list FIRST: nodes and the symmetrized edge frame each
    # reference it twice, so an uncached (possibly expensive — LSH pipeline)
    # lineage would re-execute up to 4× before the loop even starts
    edges = edges.cache()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # every round joins against a CACHED frame; without this conf AQE must
    # preserve the cached plan's output partitioning and cannot coalesce the
    # (default 200) shuffle partitions — the iteration then pays full-width
    # shuffles on a shrinking frame. Scoped set + restore (no session leak).
    from apache_iceberg_demo_spark.tuning import input_sized_shuffle, scoped_conf

    # size the per-round shuffles to the EDGE data's own partitioning rather
    # than the session default: the iteration's frames are proportional to the
    # edge list, so inheriting e.g. 200 session-wide shuffle partitions turns
    # each of the ~log(n) rounds into hundreds of near-empty tasks. The loop
    # materializes every round inside the scope (cache + aggregate), so the
    # restored conf never touches the returned result.
    with scoped_conf(
        edges.sparkSession,
        {
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
            "spark.sql.shuffle.partitions": input_sized_shuffle(edges),
        },
    ):
        return _cc_loop(nodes, edges, src, dst, max_iter)


def _cc_loop(
    nodes: DataFrame, edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    labels = nodes.withColumn("comp", F.col("node")).cache()
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).cache()

    # convergence probe: labels only ever DECREASE (monotone min), so the
    # component-id sum is strictly decreasing until the fixed point — one
    # cheap aggregate per round instead of a new-vs-old join + count.
    # DECIMAL(38,0) so the sum can't overflow at any node-id scale.
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    changed = 1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
            )
            .cache()
        )
        new_sum = _label_sum(new_labels)
        changed = int(new_sum != prev_sum)
        prev_sum = new_sum
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # min-label propagation needs O(component diameter) rounds; a chain
        # longer than max_iter hops would silently split into several
        # components — fail loudly instead of returning wrong clusters
        sym.unpersist()
        edges.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(labels still changing); raise max_iter — the graph has a "
            "component with diameter above the round budget"
        )
    sym.unpersist()
    edges.unpersist()
    _live_caches.append(labels)  # released on the next dedup invocation
    return labels


@register("c2_dedup_clusters")  # rows-only: iterative algorithm, not ANSI SQL
def c2_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: near-dup pairs → connected components → one keeper per cluster.

    The full dedup decision pipeline: LSH candidate pairs (c2_minhash) feed a
    distributed connected-components pass; each component keeps its minimum
    doc_id and drops the rest — transitive duplicates (A≈B≈C with A̸≈C)
    collapse into ONE cluster, which pairwise dedup alone cannot do.
    """
    pairs = c2_minhash_lsh_neardup(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comps = connected_components(pairs)
    # NOT persisted deliberately: the final groupBy re-runs per driver
    # action (~1.5 s over cached comps), but persist-and-materialize here
    # measured consistently SLOWER overall (+4 s plain-session: the cache
    # build pays more than the repeat saves), and a scoped conf around the
    # count misses the CC loop's caches entirely (19 s -> 32 s). Measured,
    # both ways, before settling on the plain lazy return.
    return (
        comps.groupBy("comp")
        .agg(
            F.min("node").alias("keeper_id"),
            F.count("*").alias("cluster_size"),
        )
        .select("keeper_id", "cluster_size")
    )


@register(
    "c1_dedup_keep_best",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang, source, n_chars,
                   row_number() OVER (
                       PARTITION BY sha256(concat(text, '|', lang))
                       ORDER BY n_chars DESC, length(source), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
        FROM ranked WHERE rk = 1
    """,
)
def c1_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact dedup with a QUALITY keep-rule — within each content-hash
    group keep the best copy (longest n_chars, then shortest source tag,
    then min doc_id), not just the arbitrary/min-id one. This is the form
    production dedup actually takes: when the same document arrives from
    multiple crawls/sources, the pipeline keeps the highest-quality instance
    and drops the rest.

    Plan: one shuffle on the 32-byte hash, per-group window top-1 (rank
    filter) — identical cost to min-id dedup; the keep-policy is just the
    window ORDER BY, which is the point: any quality ordering slots in
    without changing the dataflow."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    fp = F.sha2(F.concat(F.col("text"), F.lit("|"), F.col("lang")), 256)
    w = W.partitionBy(fp).orderBy(
        F.desc("n_chars"), F.length("source"), F.asc("doc_id")
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", "source", F.col("n_chars").cast("bigint").alias("n_chars"))
    )


@register(
    "c2_containment_pairs",
    oracle="""
        WITH sh AS (
            SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
                     least(len(a.toks), len(b.toks)), 6) AS containment
        FROM sh a JOIN sh b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
              least(len(a.toks), len(b.toks)) >= 0.95
    """,
)
def c2_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: token-set CONTAINMENT pairs — |A∩B| / min(|A|,|B|) within a
    blocking key. The asymmetric cousin of Jaccard: a short document quoted
    whole inside a long one scores ~1.0 here but low on Jaccard (union
    dominated by the long side), so this is the subset/quote-detection pass
    of a dedup pipeline, not a near-identity pass.

    Same bounded block-join shape as `c2_ngram_jaccard_pairs` (quadratic
    only within a block); at 100 TB the block key comes from LSH bands or a
    length bucket instead of `source`, and this exact verify runs on the
    candidate pairs only."""
    from apache_iceberg_demo_spark.tuning import cpu_spread

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    # probe side spread across the box — see c2_ngram_jaccard_pairs (r15)
    a, b = cpu_spread(d).alias("a"), d.alias("b")
    cont = F.size(F.array_intersect("a.toks", "b.toks")) / F.least(
        F.size("a.toks"), F.size("b.toks")
    )
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("containment", F.round(cont, 6))
        .filter(F.col("containment") >= 0.95)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "containment",
        )
    )


@register("c2_minhash_estimate_accuracy")  # rows-only: measured estimator contract
def c2_minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: the MinHash accuracy contract, measured — for a blocked sample of
    document pairs, the fraction of matching signature components (32
    permutations) must estimate the exact shingle Jaccard unbiasedly:
    E[match_frac] = J, σ = sqrt(J(1-J)/32). In-query assertions hold the
    estimator to |bias| ≤ 0.01 and MAE ≤ 0.02 (generous vs the binomial
    bound at this corpus's similarity range); a broken hash family — skewed
    permutations, collisions, band math errors — fails the query rather
    than silently degrading LSH recall. Same evidence pattern as the HLL
    and int8/PQ accuracy contracts.

    Scale: the sample is a fixed hash block (doc_id % 10), pairs bounded
    quadratically in the BLOCK only; at 100 TB this audit runs on the same
    blocked sample, never the corpus."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    hs = hashed_word_shingles(d)
    sig = hs.select("doc_id", minhash_signature(F.col("hs")).alias("sig"), "hs")
    a = sig.select(
        F.col("doc_id").alias("ida"), F.col("sig").alias("sa"), F.col("hs").alias("ha")
    )
    b = sig.select(
        F.col("doc_id").alias("idb"), F.col("sig").alias("sb"), F.col("hs").alias("hb")
    )
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    est = F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v)) / 32.0
    exact = F.size(F.array_intersect("ha", "hb")) / F.size(F.array_union("ha", "hb"))
    row = (
        pairs.select(est.alias("est"), exact.alias("ex"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.avg(F.abs(F.col("est") - F.col("ex"))), 6).alias("mae"),
            F.round(F.avg(F.col("est") - F.col("ex")), 6).alias("bias"),
            F.round(F.avg("ex"), 6).alias("mean_exact_jaccard"),
        )
        .collect()[0]
    )
    if row["n_pairs"] < 100:
        raise AssertionError(f"accuracy sample too small: {row['n_pairs']} pairs")
    if abs(row["bias"]) > 0.01 or row["mae"] > 0.02:
        raise AssertionError(
            f"MinHash estimator out of contract: bias={row['bias']}, mae={row['mae']}"
        )
    return spark.createDataFrame(
        [tuple(row)],
        "n_pairs bigint, mae double, bias double, mean_exact_jaccard double",
    )


@register(
    "c1_dedup_incremental_index",
    # The ledger is relational: fp equality ≡ (text, lang) equality, so the
    # oracle needs no hash at all — seed = rows with doc_id % 5 <> 0, novel
    # = distinct batch keys absent from the seed, re-run passes nothing.
    # (The planted re-deliveries are copies of already-indexed docs, so
    # they can never enter the novel set.)
    oracle="""
        WITH seed AS (
            SELECT text || '|' || lang AS k FROM documents WHERE doc_id % 5 <> 0
        ), novel AS (
            SELECT DISTINCT text || '|' || lang AS k
            FROM documents WHERE doc_id % 5 = 0
              AND text || '|' || lang NOT IN (SELECT k FROM seed)
        )
        SELECT CAST((SELECT count(*) FROM seed) AS BIGINT) AS index_seed,
               CAST((SELECT count(*) FROM novel) AS BIGINT) AS first_pass,
               CAST((SELECT count(*) FROM seed)
                    + (SELECT count(*) FROM novel) AS BIGINT) AS index_after,
               CAST(0 AS BIGINT) AS rerun_pass,
               CAST((SELECT count(*) FROM seed)
                    + (SELECT count(*) FROM novel) AS BIGINT) AS index_final
    """,
)
def c1_dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1×C6: INCREMENTAL dedup — the production shape: a persisted
    content-hash index (a versioned warehouse table) absorbs batches over
    time; each new batch anti-joins the index, only novel documents pass,
    and their hashes append as a new snapshot. Re-delivered documents are
    dropped by the INDEX, not by an in-batch window — dedup state survives
    across pipeline runs, which a one-shot dropDuplicates cannot do.

    Self-verified: a batch containing planted re-deliveries of indexed docs
    passes exactly its novel members; the index grows by exactly that many
    hashes; and the whole operation is IDEMPOTENT — re-running the same
    batch passes 0 documents and commits 0 new hashes.

    Scale: the index stores 32-byte hashes + ids (not documents); the
    anti-join shuffles hashes only, and in production the index table is
    bucketed by hash so the join co-locates."""
    from apache_iceberg_demo_spark.io import load as _load, scratch_dir
    from apache_iceberg_demo_spark.sources.warehouse import Warehouse, _check

    fp = F.sha2(F.concat(F.col("text"), F.lit("|"), F.col("lang")), 256)
    docs = _load(spark, sf_dir, "documents").withColumn("fp", fp)
    seed = docs.filter(F.col("doc_id") % 5 != 0)  # 80% bootstrap corpus
    batch = docs.filter(F.col("doc_id") % 5 == 0).unionByName(
        # planted re-deliveries: 30 already-indexed docs arrive again
        seed.limit(30).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )

    wh = Warehouse(spark, scratch_dir("dedup_idx_wh_", unique=True))
    t = "content_index"
    wh.create_or_replace(t, seed.select("fp", F.col("doc_id").alias("first_doc_id")))
    idx_before = wh.read(t).count()

    def ingest(b):
        index = wh.read(t).select("fp")
        novel = (
            b.join(index, "fp", "left_anti")
            .dropDuplicates(["fp"])  # in-batch dups collapse too
        )
        n = novel.count()
        if n:
            wh.append(t, novel.select("fp", F.col("doc_id").alias("first_doc_id")))
        return n

    n_seed_dupes = 30
    n_batch_novel = batch.join(
        wh.read(t).select("fp"), "fp", "left_anti"
    ).select("fp").distinct().count()

    passed1 = ingest(batch)
    idx_after1 = wh.read(t).count()
    _check(passed1 == n_batch_novel, "novel count != expected distinct new hashes")
    _check(
        idx_after1 == idx_before + passed1, "index growth != passed documents"
    )
    _check(
        batch.count() - passed1 >= n_seed_dupes,
        "planted re-deliveries were not dropped",
    )
    # idempotency: the same batch again adds nothing
    passed2 = ingest(batch)
    idx_after2 = wh.read(t).count()
    _check(passed2 == 0, f"re-ingest passed {passed2} docs")
    _check(idx_after2 == idx_after1, "re-ingest grew the index")

    return spark.createDataFrame(
        [(idx_before, int(passed1), idx_after1, int(passed2), idx_after2)],
        "index_seed bigint, first_pass bigint, index_after bigint, "
        "rerun_pass bigint, index_final bigint",
    )
