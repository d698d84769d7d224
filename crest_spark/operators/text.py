"""Text-analysis operators for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token statistics, and
document fingerprinting — all pure Catalyst column expressions (split /
higher-order array functions / regexp / md5), zero Python in the row path,
so they run inside whole-stage codegen and scale linearly with one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crest_spark.functions.stable import avg4, avg4x, round4, sum4, sum4x
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# (Real pipelines plug fastText/CLD3 in via the same column contract.)
_LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "zu", "in"),
}
_LANG_ORDER = ("en", "es", "de")  # deterministic argmax tie-break


def _docs(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """The documents relation. A small corpus is one parquet file =
    ONE scan partition, so everything before the first exchange
    (tokenize, explode, per-doc scoring) runs single-threaded (guide
    §2.5 "one unsplittable input: repartition after the read").

    ``spread=True`` routes through the dedup module's size-adaptive
    spread (~4 MB of raw text per task, clamped to [8, 4x cores]; since
    r15 the exchange only runs when the scan is NARROWER than that
    target, so a scan that already splits wide keeps its layout and
    pays nothing). OPT-IN per
    entry because the raw-text exchange must be cheaper than the
    single-threaded stage it removes: measured r14 at sf0.1
    (interleaved min-of-4, rows identical), per-doc-heavy entries won
    — repetition 0.35x, lang_id 0.62x, tfidf 0.74x, bm25 0.81x,
    unigram_nll 0.84x, token_stats 0.89x, bigram_nll 0.90x — while
    cheap corpus passes
    LOST (word_counts 1.21x, heavy_hitters 1.13x, fingerprint and
    quality flat) and stay unspread."""
    if spread:
        from crest_spark.operators.dedup import _docs as _spread_docs

        return _spread_docs(spark, sf_dir)
    return load_table(spark, sf_dir, "documents")


def _duck_hits(lang: str) -> str:
    lits = ", ".join(f"'{w}'" for w in _LANG_STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> list_contains([{lits}], t)))"
    )


def _spark_hits(lang: str) -> F.Column:
    arr = F.array(*[F.lit(w) for w in _LANG_STOPWORDS[lang]])
    return F.size(
        F.filter(F.split("text", " "), lambda t: F.array_contains(arr, t))
    ).cast("bigint")


@register(
    "text_lang_id",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST({_duck_hits('en')} AS BIGINT) AS hits_en,
                   CAST({_duck_hits('es')} AS BIGINT) AS hits_es,
                   CAST({_duck_hits('de')} AS BIGINT) AS hits_de
            FROM documents
        )
        SELECT doc_id, hits_en, hits_es, hits_de,
               CASE
                 WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
                 WHEN hits_es >= hits_de THEN 'es'
                 ELSE 'de'
               END AS pred_lang
        FROM scored
        ORDER BY doc_id
    """,
    tags=("llm", "text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with a deterministic argmax tie-break."""
    d = _docs(spark, sf_dir, spread=True)
    scored = d.select(
        "doc_id",
        _spark_hits("en").alias("hits_en"),
        _spark_hits("es").alias("hits_es"),
        _spark_hits("de").alias("hits_de"),
    )
    pred = (
        F.when(
            (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_de")),
            "en",
        )
        .when(F.col("hits_es") >= F.col("hits_de"), "es")
        .otherwise("de")
    )
    return scored.withColumn("pred_lang", pred).orderBy("doc_id")


@register(
    "text_quality",
    oracle=f"""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {round4("CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' '))")} AS avg_tok_len,
               {round4(f"CAST({_duck_hits('en')} AS DOUBLE) / len(string_split(text, ' '))")} AS stopword_ratio,
               CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 1000
                     AND CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')) BETWEEN 2 AND 12
                    THEN 1 ELSE 0 END AS quality_pass
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style length/ratio quality gates as one projection pass."""
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    avg_tok = n_chars.cast("double") / n_tokens
    stop_ratio = _spark_hits("en").cast("double") / n_tokens
    quality = F.when(
        n_tokens.between(5, 1000) & avg_tok.between(2, 12), 1
    ).otherwise(0)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.expr(round4("CAST(LENGTH(text) AS DOUBLE) / size(split(text, ' '))")).alias(
            "avg_tok_len"
        ),
        F.expr(
            round4(
                "CAST(size(filter(split(text, ' '),"
                " t -> array_contains(array('the','a','of','and','to','in'), t)))"
                " AS DOUBLE) / size(split(text, ' '))"
            )
        ).alias("stopword_ratio"),
        quality.cast("int").alias("quality_pass"),
    ).orderBy("doc_id")


@register(
    "text_token_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
               {round4("CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))")} AS ttr,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "text", "tokens"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + regex (BPE-ish word/number pieces) token counting and
    type-token ratio."""
    d = _docs(spark, sf_dir, spread=True)
    toks = F.split("text", " ")
    n_ws = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_unique.alias("n_unique"),
        F.expr(
            round4(
                "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)"
                " / size(split(text, ' '))"
            )
        ).alias("ttr"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
        .cast("bigint")
        .alias("n_re_tokens"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(text) AS content_md5,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS shuffle_invariant_md5
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: raw md5 plus a token-order-invariant variant
    (sorted distinct token bag) for word-shuffle dup detection."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            ).cast("binary")
        ).alias("shuffle_invariant_md5"),
    ).orderBy("doc_id")


@register(
    "text_word_counts",
    oracle="""
        SELECT w, COUNT(*) AS c
        FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> ''
        GROUP BY w
        ORDER BY c DESC, w
        LIMIT 20
    """,
    tags=("llm", "text", "wordcount"),
)
def text_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies (Q23): explode + count + top-k."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Vocabulary heavy hitters (Misra-Gries sketch -> exact recount)
# ---------------------------------------------------------------------------

_HH_PHI = 0.002  # report words with frequency >= 0.2% of all tokens
_HH_K = 2048  # Misra-Gries counters per partition (>= 1/phi guarantees
# the candidate set is a SUPERSET of every true phi-heavy hitter)


@register(
    "text_heavy_hitters",
    oracle=f"""
        WITH words AS (
            SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
        ),
        total AS (SELECT COUNT(*) AS n FROM words)
        SELECT word, COUNT(*) AS n_occurrences
        FROM words, total
        GROUP BY word, total.n
        HAVING COUNT(*) >= {_HH_PHI} * total.n
        ORDER BY n_occurrences DESC, word
    """,
    tags=("llm", "text", "sketch", "heavy-hitters"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi-heavy-hitter words via the two-pass sketch pattern:

    pass 1 — a Misra-Gries summary per partition (``mapInPandas``,
    k = 2048 >= 1/phi counters) emits each partition's candidate words;
    MG guarantees any item with global frequency >= phi survives in at
    least one partition's summary, so the union is a SUPERSET of the
    true heavy hitters at bounded memory (k counters per task, no
    full-vocabulary shuffle);
    pass 2 — only the candidates (a tiny broadcast semi-join) are
    exactly recounted and thresholded.

    Output is EXACT (hence the SQL oracle) while the full-vocabulary
    groupBy a naive plan needs — billions of distinct tokens at 100 TB —
    never happens: the only wide shuffle carries candidate hits.
    """
    from collections import Counter
    from typing import Iterator

    import pandas as pd

    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    )

    k = _HH_K

    def mg_summary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch Misra-Gries: merge each Arrow batch's value_counts (C
        # speed, no per-row Python), then trim to k counters by
        # subtracting the (k+1)-th largest count from everyone and
        # dropping the non-positive. One trim by `cutoff` equals
        # `cutoff` classic decrement-all rounds, and every trim removes
        # >= (k+1)*cutoff total mass, so across a partition of n words
        # the total undercount is < n/(k+1) <= phi*n — any word with
        # global frequency >= phi still ends positive in at least one
        # partition's summary (the superset guarantee).
        counters: Counter = Counter()
        for pdf in batches:
            counters.update(pdf["word"].value_counts().to_dict())
            if len(counters) > k:
                cutoff = sorted(counters.values(), reverse=True)[k]
                counters = Counter(
                    {w: c - cutoff for w, c in counters.items() if c > cutoff}
                )
        if counters:
            yield pd.DataFrame({"word": list(counters.keys())})

    # candidate-set size is bounded by partitions x k (NOT corpus
    # tokens); no broadcast HINT — at extreme partition counts that
    # bound can outgrow the threshold, and AQE already broadcasts the
    # post-distinct set whenever it actually fits
    candidates = words.mapInPandas(mg_summary, "word string").distinct()

    # token total without a second explode: one scalar scan of sizes
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()["n"]
    threshold = _HH_PHI * total
    return (
        words.join(candidates, "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= threshold)
        .orderBy(F.desc("n_occurrences"), "word")
    )


# ---------------------------------------------------------------------------
# Repetition scoring (Gopher-style duplicate n-gram filters)
# ---------------------------------------------------------------------------

@register(
    "text_repetition",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, UNNEST(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1])) AS gram
            FROM documents
        ),
        per_gram AS (
            SELECT doc_id, gram, COUNT(*) AS c
            FROM grams GROUP BY doc_id, gram
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_grams,
               {round4("CAST(MAX(c) AS DOUBLE) / SUM(c)")} AS top_gram_ratio,
               {round4("1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c)")} AS dup_gram_fraction
        FROM per_gram
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("llm", "text", "quality", "repetition"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: the most frequent
    word-2-gram's share of all 2-grams and the duplicated-2-gram
    fraction — the filters that catch boilerplate/template spam which
    length and stopword ratios miss.

    Plan: explode 2-grams (adjacent-word zip, pure Catalyst), count per
    (doc, gram), fold to per-doc ratios — two hash aggregations that
    both partition by doc_id (the second reuses the first's
    partitioning: EnsureRequirements inserts no second exchange), so the
    whole operator is one shuffle of (doc, gram) pairs."""
    d = _docs(spark, sf_dir, spread=True)
    toks = F.split("text", " ")
    grams = d.select(
        "doc_id",
        F.explode(
            # guard: sequence(1, 0) DESCENDS for 1-token docs, yielding
            # null grams that diverge from the oracle's empty series —
            # such docs have no 2-grams at all
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat(split(text, ' ')[i - 1], ' ', split(text, ' ')[i]))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.expr(round4("CAST(MAX(c) AS DOUBLE) / SUM(c)")).alias(
                "top_gram_ratio"
            ),
            F.expr(round4("1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c)")).alias(
                "dup_gram_fraction"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "text_unigram_nll",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, w
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE w <> ''
        ),
        freq AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
        tot AS (SELECT SUM(c) AS t FROM freq)
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               {avg4("-LN(CAST(c AS DOUBLE) / t)")} AS nll
        FROM words JOIN freq USING (w) CROSS JOIN tot
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM negative log-likelihood per document — the perplexity-
    filtering quality signal (CCNet / RedPajama style) with the corpus
    itself as the language model: nll(doc) = -avg ln p(w), p(w) =
    corpus_count(w) / corpus_tokens.  High nll = rare-token soup
    (boilerplate, garbled text); low = stereotypical text.  Real
    pipelines swap in a pretrained KenLM via the same column contract;
    the self-corpus unigram model keeps the operator closed over its
    inputs and SQL-expressible for the oracle gate.

    Plan: ONE explode of the corpus feeds both sides — the vocabulary
    count (groupBy w, map-side combinable) and the per-doc score (join
    tokens back to frequencies, then groupBy doc_id).  The frequency
    table is vocabulary-sized (Heaps' law: ~10^6-10^7 for natural
    corpora), so the token->freq join is a BROADCAST at any corpus
    scale; the corpus-total is the broadcast-scalar crossJoin pattern.
    Only shuffles: the vocab groupBy and the doc groupBy — both on
    fine-grained keys.  Per-token ln routes through DECIMAL(30,8)
    before summing (avg4), so engines' 1-ulp ln differences cannot
    reorder the aggregate.
    """
    d = _docs(spark, sf_dir, spread=True)
    words = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return (
        words.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr(avg4x("-LN(CAST(c AS DOUBLE) / t)")).alias("nll"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_tfidf",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ),
        tf AS (
            SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY 1, 2
        ),
        df AS (
            SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.w,
                   {round4("tf * " + round4("LN(CAST((SELECT n_docs FROM n) AS DOUBLE) / df)"))}
                       AS tfidf
            FROM tf JOIN df ON tf.w = df.w
        ),
        ranked AS (
            SELECT doc_id, w, tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, w ASC
                   ) AS rn
            FROM scored
        )
        SELECT doc_id, w AS term, tfidf
        FROM ranked WHERE rn <= 3
        ORDER BY doc_id, rn
    """,
    tags=("text", "tfidf", "ranking"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Classic two-aggregate shape:
    term frequencies shuffle once on (doc, term), document frequencies
    once on term; the tiny per-term IDF relation broadcasts back onto
    the tf side, and the per-doc ranking window reuses the doc_id
    partitioning. IDF's ln() is pinned to 4 dp through DECIMAL before
    the tf multiply (then the product is pinned again), so 1-ulp libm
    differences between engines can't reach the hash. Deterministic
    tie-break (score desc, term asc)."""
    docs = _docs(spark, sf_dir, spread=True)
    n_docs = docs.count()
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    idf = (
        words.groupBy("w")
        .agg(F.count_distinct("doc_id").alias("df"))
        .select(
            "w",
            F.expr(
                round4(f"LN(CAST({n_docs} AS DOUBLE) / df)")
            ).alias("idf"),
        )
    )
    scored = tf.join(F.broadcast(idf), "w").select(
        "doc_id", "w", F.expr(round4("tf * idf")).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("w"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", F.col("w").alias("term"), "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


_BM25_TERMS = ("merge", "stream", "window")
_BM25_K1 = "1.2"
_BM25_B = "0.75"
# (k1+1) = 2.2; (1 - b) = 0.25 — spelled as literals so BOTH engines
# evaluate the identical IEEE expression tree
_BM25_TFPART = "((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))"


@register(
    "text_bm25_topk",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS dl,
                   UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ),
        tf AS (
            SELECT doc_id, dl, w, COUNT(*) AS tf
            FROM base
            WHERE w IN {str(_BM25_TERMS)}
            GROUP BY doc_id, dl, w
        ),
        df AS (
            SELECT w, COUNT(DISTINCT doc_id) AS df
            FROM base WHERE w IN {str(_BM25_TERMS)} GROUP BY w
        ),
        corpus AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                       / COUNT(*) AS avgdl
            FROM documents
        ),
        idf AS (
            SELECT w,
                   {round4("LN(1 + ((SELECT n_docs FROM corpus) - df + 0.5)"
                           " / (df + 0.5))")} AS idf
            FROM df
        ),
        scored AS (
            SELECT tf.doc_id,
                   {round4(_BM25_TFPART + " * idf")} AS s
            FROM tf
            JOIN idf ON tf.w = idf.w
            CROSS JOIN (SELECT avgdl FROM corpus) c(avgdl)
        )
        SELECT doc_id, {sum4("s")} AS score
        FROM scored
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 10
    """,
    tags=("text", "bm25", "ranking"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) document ranking for a fixed multi-term
    query — the retrieval scorer a corpus-curation pipeline uses to
    mine topical subsets. Top-10 docs by summed per-term score, total
    order (score DESC, doc_id) so the cut is deterministic.

    Plan: tokens filter to the query terms BEFORE the tf aggregation
    (the explode's output is pruned at the source of the shuffle — at
    100 TB this is the difference between shuffling every token and
    shuffling only query-term hits), doc length rides the tf key as a
    functionally-dependent column so no separate dl join is needed, and
    the 3-row IDF relation broadcasts. Corpus scalars (N, avgdl) are
    one bounded aggregate collect. Float discipline: idf's ln() pins to
    4 dp through DECIMAL; the tf saturation part is pure rational IEEE
    arithmetic from integer inputs (bit-identical across engines by
    construction); their product pins again; the cross-term sum runs as
    DECIMAL so partition order can't move the hash."""
    docs = _docs(spark, sf_dir, spread=True)
    toks = F.split(F.col("text"), " ")
    scalars = docs.select(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(toks)).alias("s")
    ).first()
    n_docs, sum_dl = scalars["n"], scalars["s"]
    avgdl = f"(CAST({sum_dl} AS DOUBLE) / {n_docs})"

    words = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("w")
    ).where(F.col("w").isin(*_BM25_TERMS))
    tf = words.groupBy("doc_id", "dl", "w").agg(
        F.count(F.lit(1)).alias("tf")
    )
    idf = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "w",
            F.expr(
                round4(f"LN(1 + ({n_docs} - df + 0.5) / (df + 0.5))")
            ).alias("idf"),
        )
    )
    scored = tf.join(F.broadcast(idf), "w").select(
        "doc_id",
        F.expr(
            round4(_BM25_TFPART.replace("avgdl", avgdl) + " * idf")
        ).alias("s"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.expr(sum4x("s")).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_BIGRAM_LAMBDA = "0.75"  # interpolation weight on the bigram term

# shared SQL shape: cleaned token list -> adjacent bigrams; counts are
# all integers, the interpolated probability is one rational per
# position, and ln routes through DECIMAL before averaging (avg4) so
# 1-ulp ln differences cannot reorder the aggregate
_BIGRAM_NLL_ORACLE = """
    WITH ct AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT doc_id, w1, w2
        FROM (
            SELECT doc_id,
                   UNNEST(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> struct_pack(w1 := toks[i], w2 := toks[i+1])
                   )) AS p
            FROM ct
        ) t, LATERAL (SELECT p.w1 AS w1, p.w2 AS w2)
    ),
    bfreq AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
    cfreq AS (SELECT w1, SUM(cb) AS c1 FROM bfreq GROUP BY 1),
    ufreq AS (
        SELECT w AS w2, COUNT(*) AS cu
        FROM (SELECT UNNEST(toks) AS w FROM ct)
        GROUP BY 1
    ),
    tot AS (SELECT SUM(cu) AS t FROM ufreq)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           {avg}
    FROM bg
    JOIN bfreq USING (w1, w2)
    JOIN cfreq USING (w1)
    JOIN ufreq USING (w2)
    CROSS JOIN tot
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
"""

_BIGRAM_P = (
    f"-LN({_BIGRAM_LAMBDA} * CAST(cb AS DOUBLE) / c1"
    f" + (1 - {_BIGRAM_LAMBDA}) * CAST(cu AS DOUBLE) / t)"
)


@register(
    "text_bigram_nll",
    oracle=_BIGRAM_NLL_ORACLE.format(avg=avg4(_BIGRAM_P) + " AS nll"),
    tags=("llm", "text", "quality", "lm"),
)
def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM negative log-likelihood per document —
    the context-aware upgrade of ``text_unigram_nll``: p(w2|w1) =
    0.75*c(w1,w2)/c(w1·) + 0.25*c(w2)/T, so repeated-but-rare word
    PAIRS (garbled interleavings, shuffled boilerplate) score badly
    even when every individual token is common. Same role as the KenLM
    perplexity filters in CCNet/RedPajama, closed over the corpus so
    the oracle gate stays exact.

    Plan: one pass builds the cleaned token array JVM-side; adjacent
    bigrams come from an array zip (no self-join, no window); the
    bigram/context/unigram count tables hang off the same explode.
    The per-occurrence stream joins the MODEL TABLE exactly once, and
    every shuffle ships 8-BYTE HASH KEYS, never the strings (r9 — the
    same lesson as the minhash verify path): occurrences reduce to
    (doc_id, xxhash64(w1·w2)) and the (bigram, context, unigram) count
    tables key on xxhash64 of their tokens, so the corpus-scale
    exchanges move 16-byte rows instead of ~100-byte string pairs.
    (The previous string-keyed shape joined the occurrence stream three
    times — on (w1,w2), then w1, then w2 — and still measured a
    1.26-1.33 sweep step at 512k docs from shuffle byte volume alone.)
    The model is assembled by joining the VOCABULARY-sized count tables
    among themselves first; all model joins stay UNHINTED — the bigram
    vocabulary grows with the corpus (unlike the unigram table), so a
    forced broadcast would be the q58 OOM anti-pattern; AQE broadcasts
    while small and shuffle-joins on the fine-grained key once it is
    not. 64-bit keys make counts collide only at ~n²/2⁶⁴ odds —
    immaterial against the scoring role (and the sf0.01 oracle gate
    exercises the exact same keyed plan). Per-position ln routes
    through DECIMAL (avg4) before averaging."""
    d = _docs(spark, sf_dir, spread=True)
    ct = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    )
    n = F.size("toks")
    sep = F.lit(" ")  # token-boundary-safe pair key
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.xxhash64(
                F.concat(F.col("toks")[i - 1], sep, F.col("toks")[i])
            ).alias("b"),
            F.xxhash64(F.col("toks")[i - 1]).alias("k1"),
            F.xxhash64(F.col("toks")[i]).alias("k2"),
        ),
    )
    bg = (
        ct.where(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.col("p.b").alias("b"),
            F.col("p.k1").alias("k1"),
            F.col("p.k2").alias("k2"),
        )
    )
    # k1/k2 are functionally dependent on b: carrying them through the
    # bigram-count aggregate costs 16 bytes/row and saves re-deriving
    # them for the context/unigram joins
    bfreq = bg.groupBy("b", "k1", "k2").agg(F.count(F.lit(1)).alias("cb"))
    cfreq = bfreq.groupBy("k1").agg(F.sum("cb").alias("c1"))
    ufreq = (
        ct.select(F.explode("toks").alias("w"))
        .select(F.xxhash64("w").alias("k2"))
        .groupBy("k2")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = ufreq.agg(F.sum("cu").alias("t"))
    model = bfreq.join(cfreq, "k1").join(ufreq, "k2")
    return (
        bg.select("doc_id", "b")
        .join(model, "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(avg4x(_BIGRAM_P)).alias("nll"),
        )
        .orderBy("doc_id")
    )
