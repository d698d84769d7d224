"""End-to-end corpus curation pipeline: the composed flow a training-data
user runs over a raw crawl — quality gate -> exact dedup -> near-dup
removal -> language filter — expressed as one lazy DataFrame chain so
Catalyst fuses the stages (single scan, no materialization between
stages).

The oracle-gated variant uses the exact (SQL-expressible) versions of
each stage; swapping the near-dup stage for MinHash-LSH
(``dedup_minhash_lsh``) is a one-line change at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crest_spark.functions.stable import sum4, sum4x
from crest_spark.operators.dedup import _DUCK_SHINGLES, _docs, with_shingles
from crest_spark.registry import register

_MIN_TOKENS = 15
_JACCARD_T = 0.5


@register(
    "llm_curation_pipeline",
    oracle=f"""
        WITH quality AS (
            SELECT doc_id, text, lang,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
            WHERE len(string_split(text, ' ')) >= {_MIN_TOKENS}
        ),
        exact_kept AS (
            SELECT MIN(doc_id) AS doc_id
            FROM quality GROUP BY md5(text)
        ),
        surv AS (
            SELECT q.* FROM quality q JOIN exact_kept k USING (doc_id)
        ),
        sh AS (
            SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS s FROM surv
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        near_dups AS (
            SELECT DISTINCT b.doc_id
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            JOIN sizes sa ON sa.doc_id = a.doc_id
            JOIN sizes sb ON sb.doc_id = b.doc_id
            GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
            HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n + sb.n - COUNT(*)) >= {_JACCARD_T}
        )
        SELECT s.doc_id, s.lang, CAST(s.n_tokens AS BIGINT) AS n_tokens
        FROM surv s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM near_dups)
          AND s.lang IN ('en', 'es', 'de')
        ORDER BY s.doc_id
    """,
    tags=("llm", "pipeline", "curation"),
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate -> exact dedup (keep lowest id) -> exact near-dup
    removal (drop the HIGHER id of every similar pair) -> language
    allowlist. One lazy plan; each stage is an operator from this repo."""
    docs = _docs(spark, sf_dir)

    # 1. quality gate (text_quality's length rule)
    n_tokens = F.size(F.split("text", " "))
    quality = docs.where(n_tokens >= _MIN_TOKENS).withColumn(
        "n_tokens", n_tokens.cast("bigint")
    )

    # 2. exact dedup: keep the lowest doc_id per content hash
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    exact_kept = (
        quality.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 3. near-dup removal: exact shingle-Jaccard pairs, drop the higher id
    sh = with_shingles(exact_kept).select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    near_dups = (
        inter.join(sa, "da")
        .join(sb, "db")
        .where(
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
            >= _JACCARD_T
        )
        .select(F.col("db").alias("doc_id"))
        .distinct()
    )
    survivors = exact_kept.join(near_dups, "doc_id", "left_anti")

    # 4. language allowlist
    return (
        survivors.where(F.col("lang").isin("en", "es", "de"))
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Dataset mixing: per-stratum deterministic sampling
# ---------------------------------------------------------------------------

# lang -> keep rate, expressed as a 2-hex-digit md5-prefix threshold out
# of 256 ('40'=25%, '80'=50%, 'c0'=75%, '19'=~10%, 'zz'=keep all). The
# thresholds are string compares on the hash prefix — identical bytes in
# any engine, so the sample is reproducible across engines, reruns, AND
# partitionings (rand()-based sampling is none of those).
_MIX_RATES = {"en": "40", "es": "80", "de": "c0", "fr": "19", "zh": "zz"}


@register(
    "curation_stratified_sample",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
            CASE lang
                {' '.join(f"WHEN '{k}' THEN '{v}'" for k, v in _MIX_RATES.items())}
                ELSE '00' END
        ORDER BY doc_id
    """,
    tags=("llm", "sampling", "curation"),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: per-language keep rates applied as deterministic
    content-hash thresholds (the q25 pattern, stratified).

    This is how a training-data pipeline rebalances sources: each
    stratum gets its own md5-prefix cutoff, evaluated row-local in the
    scan — no shuffle, no state, embarrassingly parallel, and the same
    doc survives on every engine/rerun/cluster size. Unknown strata
    default to keep-nothing (fail-closed for new sources)."""
    d = _docs(spark, sf_dir)
    prefix = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    cutoff = F.lit("00")
    for k, v in reversed(_MIX_RATES.items()):
        cutoff = F.when(F.col("lang") == k, F.lit(v)).otherwise(cutoff)
    return (
        d.where(prefix < cutoff)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

# md5-prefix thresholds out of 16^4: ~90% train / ~5% val / ~5% test
_SPLIT_VAL_LO = "e666"  # 16^4 * 0.9
_SPLIT_TEST_LO = "f333"  # 16^4 * 0.95


@register(
    "curation_train_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                         >= '{_SPLIT_TEST_LO}' THEN 'test'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                         >= '{_SPLIT_VAL_LO}' THEN 'val'
                    ELSE 'train' END AS split
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "curation", "split"),
)
def curation_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~90/5/5) by content-hash
    range — the split every training pipeline needs to be REPRODUCIBLE:
    row-local (scan-embedded, no shuffle, no state), stable across
    engines, reruns, cluster sizes, and dataset growth (a doc's split
    never changes when other docs are added — unlike randomSplit, which
    reshuffles assignments on every change of partitioning or seed
    handling). Pure Catalyst: md5 + substring + range compare."""
    d = _docs(spark, sf_dir)
    prefix = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
    )
    return (
        d.select(
            "doc_id",
            F.when(prefix >= _SPLIT_TEST_LO, "test")
            .when(prefix >= _SPLIT_VAL_LO, "val")
            .otherwise("train")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Sequence packing (token-budget binning via scalable prefix sum)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per packed training sequence


@register(
    "curation_pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_tokens
            FROM toks
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT)
                   AS seq_id
        FROM cum
        ORDER BY doc_id
    """,
    tags=("llm", "curation", "packing"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents in stable doc_id order are
    assigned to fixed-token-budget training sequences by their global
    running token offset (seq_id = completed budgets before the doc).

    The global prefix sum — the part a naive plan does with a
    single-partition window (ORDER BY doc_id over ALL rows: one task owns
    100 TB) — runs as the scalable two-level pattern instead:
    range-partition on doc_id, per-partition window cumsum, then each
    partition's total is prefix-summed (a few hundred numbers, broadcast
    back) and added as the partition's offset. Every row is touched in
    parallel; only the per-partition totals ever leave their partition.
    Deterministic regardless of where the range boundaries land."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    # partition count follows the session's shuffle parallelism (sized to
    # the cluster), not a constant: the offsets side stays one row per
    # partition either way
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = d.repartitionByRange(n_parts, "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("_local_cum", F.sum("n_tokens").over(w_local))
    # per-partition totals -> exclusive prefix offsets (a handful of rows)
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_ptot"))
        .withColumn("_offset", F.sum("_ptot").over(w_off) - F.col("_ptot"))
        .select("_pid", "_offset")
    )
    budget = float(_PACK_BUDGET)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (F.col("_offset") + F.col("_local_cum") - F.col("n_tokens"))
                / budget
            )
            .cast("bigint")
            .alias("seq_id"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------

_DECON_N = 8  # overlap n-gram width (13 is the common LLM choice; the
# synthetic docs are short, 8 keeps the fixture non-degenerate)
_DECON_BENCH = 10  # doc_id < 10 stands in for the benchmark/eval corpus


@register(
    "curation_decontaminate",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, UNNEST(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - {_DECON_N - 1}),
                       i -> array_to_string(string_split(text, ' ')[i : i + {_DECON_N - 1}], ' ')))
                   AS gram
            FROM documents
        ),
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < {_DECON_BENCH})
        SELECT DISTINCT g.doc_id
        FROM grams g JOIN bench b ON g.gram = b.gram
        WHERE g.doc_id >= {_DECON_BENCH}
        ORDER BY g.doc_id
    """,
    tags=("llm", "curation", "decontamination"),
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs that share ANY word
    {_n}-gram with the eval/benchmark corpus (stand-in: doc_id < 10) are
    flagged for removal — the n-gram-overlap scrub every LLM data
    pipeline runs against its eval suites.

    Plan: both sides explode to (doc_id, gram); benchmark grams are
    distinct-ed and the overlap is a LEFT SEMI join on the gram hash
    followed by DISTINCT doc_id. At 100 TB the benchmark side is tiny
    (eval suites are small) and broadcast, so the training-side scan
    never shuffles its grams — flagging is map-side; the only exchange
    is the final distinct on flagged doc_ids (bounded by corpus rows,
    not grams). Hashing grams (xxhash64) instead of shipping strings
    keeps the broadcast build in the tens of MB per million benchmark
    grams; a 64-bit collision can only over-flag (~1e-13/pair), which
    errs on the safe side for decontamination."""
    d = _docs(spark, sf_dir)
    n = _DECON_N
    toks = "split(text, ' ')"
    grams = d.select(
        "doc_id",
        F.explode(
            # guard: sequence(1, k) DESCENDS for k < 1 (docs shorter
            # than n tokens), which would hit slice(.., 0, ..) and
            # throw at runtime — such docs simply have no n-grams
            F.expr(
                f"CASE WHEN size({toks}) >= {n} THEN "
                f"transform(sequence(1, size({toks}) - {n - 1}),"
                f" i -> concat_ws(' ', slice({toks}, i, {n})))"
                f" ELSE array() END"
            )
        ).alias("gram"),
    ).select("doc_id", F.xxhash64("gram").alias("gh"))
    bench = (
        grams.where(F.col("doc_id") < _DECON_BENCH).select("gh").distinct()
    )
    return (
        grams.where(F.col("doc_id") >= _DECON_BENCH)
        .join(F.broadcast(bench), "gh", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


# --- PII scrubbing ------------------------------------------------------
#
# Patterns are written to the RE2 ∩ java.util.regex common subset (no
# lookaround, no backreferences; \b and character classes behave
# identically on ASCII) so the same literal pattern runs JVM-side in
# Spark and in the DuckDB oracle.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d[\d-]{6,}\d"


@register(
    "curation_pii_scrub",
    oracle=f"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                        AS raw
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(
                   regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IP}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(
                   regexp_replace(regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                                  '{_PII_IP}', '<IP>', 'g'),
                   '{_PII_PHONE}')) AS BIGINT) AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IP}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
        FROM injected
        ORDER BY doc_id
    """,
    tags=("llm", "curation", "pii"),
)
def curation_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data pipeline
    runs before anything ships: emails, IPv4 addresses, and phone
    numbers replaced by typed placeholders, with per-doc match counts
    for audit sampling.

    The synthetic corpus contains no PII, so the query first injects
    deterministic doc_id-derived PII into every row IN BOTH ENGINES —
    the redaction patterns are exercised on every document rather than
    vacuously matching nothing.

    Scale shape: pure Catalyst `regexp_replace` chain — JVM-side,
    whole-stage-codegen, zero shuffles, linear in corpus bytes; the scan
    partitioning IS the parallelism. Counts are computed on the partial
    scrubs in pattern order (email, then IP, then phone) so overlapping
    matches are attributed exactly once, matching the replace chain.

    Reference parity: crest has no text operators (its transforms live
    upstream in RisingWave, `/root/reference/README.md:13`); this is
    part of the LLM-pipeline extension surface the brief mandates."""
    d = _docs(spark, sf_dir)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    d = d.select("doc_id", raw.alias("raw"))
    no_email = F.regexp_replace("raw", _PII_EMAIL, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, _PII_IP, "<IP>")
    scrubbed = F.regexp_replace(no_ip, _PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(_PII_EMAIL), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(_PII_IP), 0))
        .cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(no_ip, F.lit(_PII_PHONE), 0))
        .cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    ).orderBy("doc_id")


# --- domain mixing (computed rates) -------------------------------------

# target mixture over sources; sources absent from the mix are dropped.
# All weights go through binary64 in BOTH engines (explicit DOUBLE casts
# in the oracle — DuckDB would otherwise do DECIMAL arithmetic on the
# literals and disagree with Spark at the floor() boundary).
_MIX_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}


@register(
    "curation_domain_mix",
    oracle=f"""
        WITH tgt(source, w) AS (
            VALUES {", ".join(f"('{s}', CAST({w} AS DOUBLE))"
                              for s, w in _MIX_TARGETS.items())}
        ),
        counts AS (
            SELECT d.source, COUNT(*) AS c
            FROM documents d JOIN tgt USING (source)
            GROUP BY d.source
        ),
        bottleneck AS (
            SELECT MIN(CAST(c AS DOUBLE) / w) AS t
            FROM counts JOIN tgt USING (source)
        ),
        rates AS (
            SELECT counts.source,
                   (b.t * tgt.w) / CAST(counts.c AS DOUBLE) AS rate
            FROM counts JOIN tgt USING (source), bottleneck b
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                   AS BIGINT)
              < CAST(FLOOR(r.rate * 65536) AS BIGINT)
        ORDER BY d.doc_id
    """,
    tags=("llm", "curation", "mixing"),
)
def curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture sampling with COMPUTED rates: hit a target domain
    mix (web/books/code/...) exactly at the proportions the corpus can
    support. The bottleneck source (largest count/target ratio deficit)
    is kept whole; every other source is down-sampled so the output
    matches ``_MIX_TARGETS`` — the standard two-pass recipe for
    assembling a training mix from skewed crawls.

    Scale shape: pass 1 is a per-source COUNT (map-side combined, tiny
    result); the rate table is a handful of rows, broadcast; pass 2 is a
    scan with a row-local deterministic md5-threshold filter — no
    shuffle of the corpus, reproducible across engines, reruns, and
    cluster sizes (same property as ``curation_train_split``). The
    bottleneck scalar is a broadcast nested-loop of a 1-row aggregate,
    not a driver collect."""
    d = _docs(spark, sf_dir)
    tgt = spark.createDataFrame(
        list(_MIX_TARGETS.items()), "source string, w double"
    )
    counts = (
        d.join(F.broadcast(tgt), "source")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rates = counts.join(F.broadcast(tgt), "source")
    bottleneck = rates.agg(
        F.min(F.col("c").cast("double") / F.col("w")).alias("t")
    )
    rates = rates.crossJoin(F.broadcast(bottleneck)).select(
        "source",
        ((F.col("t") * F.col("w")) / F.col("c").cast("double")).alias("rate"),
    )
    prefix = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
    )
    return (
        d.join(F.broadcast(rates), "source")
        .where(
            F.conv(prefix, 16, 10).cast("long")
            < F.floor(F.col("rate") * 65536).cast("long")
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Context-window chunking (fixed token windows with overlap)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64  # tokens per chunk
_CHUNK_STRIDE = 48  # start-to-start distance (=> 16-token overlap)


@register(
    "curation_chunk_documents",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
        ),
        starts AS (
            SELECT doc_id, t,
                   UNNEST(generate_series(1, len(t), {_CHUNK_STRIDE})) AS s
            FROM toks
        )
        SELECT doc_id,
               CAST((s - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(len(t[s : LEAST(s + {_CHUNK_SIZE} - 1, len(t))]) AS BIGINT)
                   AS n_tokens,
               array_to_string(
                   t[s : LEAST(s + {_CHUNK_SIZE} - 1, len(t))], ' '
               ) AS chunk_text
        FROM starts
        ORDER BY doc_id, chunk_id
    """,
    tags=("llm", "curation", "chunking"),
)
def curation_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the doc -> training-sample step: each
    document's token stream becomes overlapping fixed-size windows
    (size {_CHUNK_SIZE}, stride {_CHUNK_STRIDE}). Pure Catalyst: token
    split, ``sequence`` of window starts, one ``explode`` — chunking is
    embarrassingly row-local, so the operator is a single map stage that
    scales with the scan (no shuffle at all until a consumer asks for
    one). Every document yields >= 1 chunk (the token array is never
    empty); ragged tails are kept, matching what a packing/padding stage
    downstream expects."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.size(F.col("t")), F.lit(_CHUNK_STRIDE)
    )
    return (
        d.select("doc_id", toks.alias("t"))
        .select("doc_id", F.col("t"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.floor((F.col("s") - 1) / _CHUNK_STRIDE)
            .cast("bigint")
            .alias("chunk_id"),
            F.size(F.slice(F.col("t"), F.col("s"), _CHUNK_SIZE))
            .cast("bigint")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("t"), F.col("s"), _CHUNK_SIZE), " "
            ).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "curation_shuffle_order",
    oracle="""
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '#42'), doc_id
               ) AS BIGINT) AS shuffle_pos
        FROM documents
        ORDER BY shuffle_pos
    """,
    tags=("llm", "curation", "shuffle"),
)
def curation_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a stable pseudo-random position from the md5 of its id plus a seed —
    reproducible across runs/engines (seeded hash, not rand()), which is
    what makes a training data order auditable. Changing the seed
    re-shuffles; re-running doesn't.

    The global ROW_NUMBER over the hash order is the same shape as
    pack_sequences' prefix sum, and runs as the same scalable two-level
    pattern: range-partition on the shuffle key, per-partition local
    rank, per-partition COUNTS prefix-summed (one row per partition,
    broadcast back) as offsets — no single-task global window. At 100 TB
    you'd write the range-sorted output to sequentially-named shards;
    the explicit position column is what makes the contract
    oracle-checkable."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).select("doc_id")
    shuffle_key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit("#42"))
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    keyed = d.withColumn("_sk", shuffle_key)
    parts = keyed.repartitionByRange(n_parts, "_sk", "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy("_sk", "doc_id")
    local = parts.withColumn("_local_rn", F.row_number().over(w_local))
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_pcnt"))
        .withColumn("_offset", F.sum("_pcnt").over(w_off) - F.col("_pcnt"))
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            "doc_id",
            (F.col("_offset") + F.col("_local_rn"))
            .cast("bigint")
            .alias("shuffle_pos"),
        )
        .orderBy("shuffle_pos")
    )


@register(
    "curation_oversample",
    oracle="""
        WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        mx AS (SELECT MAX(n) AS m FROM c),
        r AS (SELECT lang, CAST(m AS DOUBLE) / n AS rate FROM c CROSS JOIN mx),
        d AS (
            SELECT d0.doc_id, d0.lang,
                   CAST(FLOOR(rate) AS BIGINT) +
                   CASE WHEN substring(md5(CAST(d0.doc_id AS VARCHAR)), 1, 4) <
                        lower(lpad(to_hex(CAST(FLOOR((rate - FLOOR(rate))
                            * 65536) AS BIGINT)), 4, '0'))
                   THEN 1 ELSE 0 END AS copies
            FROM documents d0 JOIN r USING (lang)
        )
        SELECT doc_id, lang, CAST(copy_id AS BIGINT) AS copy_id
        FROM d, LATERAL (SELECT unnest(generate_series(1, copies)) AS copy_id)
        ORDER BY doc_id, copy_id
    """,
    tags=("llm", "curation", "sampling"),
)
def curation_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic UPsampling toward the largest stratum — the
    complement of domain-mix down-sampling: every language is replicated
    to match the biggest one's count in expectation. Each doc gets
    floor(rate) copies plus one more iff its md5 fraction falls under
    the fractional part — reproducible across engines/reruns (seeded
    hash, not rand()), so epochs see a stable corpus.

    Plan: rates are a two-pass count -> broadcast (one tiny dim), the
    copy decision is row-local, and replication is one explode — output
    rows scale with the TARGET corpus size, the inherent cost of
    materialized oversampling. (Real pipelines often keep (doc, weight)
    instead; the explode form is what a packing/shuffle stage consumes.)
    """
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("m"))
    rates = counts.crossJoin(F.broadcast(mx)).select(
        "lang", (F.col("m").cast("double") / F.col("n")).alias("rate")
    )
    joined = d.join(F.broadcast(rates), "lang")
    frac_hex = (
        "lower(lpad(hex(CAST(FLOOR((rate - FLOOR(rate)) * 65536) AS BIGINT))"
        ", 4, '0'))"
    )
    copies = F.expr(
        f"CAST(FLOOR(rate) AS BIGINT) + CASE WHEN "
        f"substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 4)"
        f" < {frac_hex} THEN 1 ELSE 0 END"
    )
    return (
        joined.withColumn("copies", copies)
        .select(
            "doc_id",
            "lang",
            F.explode(F.expr("sequence(1L, copies)")).alias("copy_id"),
        )
        .orderBy("doc_id", "copy_id")
    )


_PARA_W = 10  # pseudo-paragraph width (words); real corpora split on \n\n


@register(
    "curation_paragraph_dedup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        paras AS (
            SELECT doc_id,
                   CAST((s - 1) // {_PARA_W} AS BIGINT) AS pid,
                   array_to_string(
                       t[s : LEAST(s + {_PARA_W} - 1, len(t))], ' '
                   ) AS ptext
            FROM (
                SELECT doc_id, t,
                       UNNEST(generate_series(1, len(t), {_PARA_W})) AS s
                FROM toks
            )
        ),
        ranked AS (
            SELECT doc_id, pid, ptext,
                   ROW_NUMBER() OVER (
                       PARTITION BY ptext ORDER BY doc_id, pid
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY doc_id) AS n_paras
            FROM paras
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(MAX(n_paras) - COUNT(*) AS BIGINT) AS n_dropped,
               STRING_AGG(ptext, ' ' ORDER BY pid) AS text_clean
        FROM ranked
        WHERE rn = 1
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("llm", "curation", "dedup", "paragraph"),
)
def curation_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph-level dedup (the CCNet / RefinedWeb shape):
    every paragraph that textually repeats ANYWHERE in the corpus keeps
    only its first occurrence in (doc_id, position) order; documents are
    reassembled from their surviving paragraphs (a fully-duplicated doc
    disappears). Boilerplate — headers, footers, licence blocks — dies
    corpus-wide in one pass. Paragraphs here are fixed {_PARA_W}-word
    windows (the synthetic corpus has no newlines); swap the splitter
    for split-on-blank-line on real data, the dedup shape is unchanged.

    Scale: two shuffles, both on natural keys — first the global
    first-occurrence window partitioned BY PARAGRAPH (hash-distributed;
    hot boilerplate paragraphs each land on one partition, and per-key
    state is one counter), then the doc_id regroup to reassemble. At
    100 TB, partition the window on a 128-bit content hash instead of
    shipping paragraph text twice and re-verify exact text inside the
    bucket — same plan, smaller shuffle payload."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.size(F.col("t")), F.lit(_PARA_W))
    paras = (
        d.select("doc_id", toks.alias("t"))
        .select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.floor((F.col("s") - 1) / _PARA_W).cast("bigint").alias("pid"),
            F.array_join(
                F.slice(F.col("t"), F.col("s"), _PARA_W), " "
            ).alias("ptext"),
        )
    )
    first = Window.partitionBy("ptext").orderBy("doc_id", "pid")
    per_doc = Window.partitionBy("doc_id")
    ranked = paras.select(
        "doc_id",
        "pid",
        "ptext",
        F.row_number().over(first).alias("rn"),
        F.count(F.lit(1)).over(per_doc).alias("n_paras"),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            (F.max("n_paras") - F.count(F.lit(1)))
            .cast("bigint")
            .alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pid", "ptext"))
                    ),
                    lambda e: e["ptext"],
                ),
                " ",
            ).alias("text_clean"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169) — the hashed-n-gram importance weights used to pick
# web data that "looks like" a target domain.
# ---------------------------------------------------------------------------

_DSIR_B = 512  # hashed feature buckets (the paper uses 10k; fixed B makes
# the bucket model a CONSTANT-size table at any corpus scale)
_DSIR_TARGET_LANG = "en"  # target distribution: the English slice

# engine-agnostic bucket hash: first 6 hex chars of md5 -> int -> mod B.
# (Spark's xxhash64/hash and DuckDB's hash() are different functions;
# md5 is bit-identical in both.)
_DUCK_BUCKET = (
    f"CAST(('0x' || substring(md5(f), 1, 6)) AS BIGINT) % {_DSIR_B}"
)

_DSIR_ORACLE = f"""
    WITH ct AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    feats AS (
        SELECT doc_id, lang, UNNEST(list_concat(
            toks,
            list_transform(generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1])
        )) AS f
        FROM ct
    ),
    bucketed AS (SELECT doc_id, lang, {_DUCK_BUCKET} AS b FROM feats),
    model AS (
        SELECT b,
               COUNT(*) AS cr,
               COUNT(*) FILTER (lang = '{_DSIR_TARGET_LANG}') AS ct_
        FROM bucketed GROUP BY b
    ),
    tot AS (SELECT SUM(cr) AS tr, SUM(ct_) AS tt FROM model)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           {sum4("LN(CAST(ct_ + 1 AS DOUBLE) / (tt + " + str(_DSIR_B) + ")) - LN(CAST(cr + 1 AS DOUBLE) / (tr + " + str(_DSIR_B) + "))")} AS dsir_logw
    FROM bucketed JOIN model USING (b) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
"""


@register(
    "curation_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("llm", "curation", "dsir", "sampling"),
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: log w(x) = Σ_features ln p_target(b) −
    ln p_raw(b) over hashed unigram+bigram buckets, add-1 smoothed —
    the importance-resampling selector that upgrades heuristic quality
    gates when a trusted target corpus exists (here: the corpus's
    English slice stands in as the target distribution).

    Scale contract: the bucket space is FIXED (B=512), so the model
    table is constant-size at any corpus — its groupBy is map-side
    combinable down to <= B rows per task, and the stream->model join
    is a broadcast BY CONSTRUCTION (unlike the bigram-NLL model, which
    grows with the corpus and must stay unhinted). One corpus-scale
    shuffle total: the per-doc aggregation; the bucket hash is md5-hex
    (bit-identical across engines) so the gate stays exact, and the
    per-feature log terms route through DECIMAL so the sum is
    order-independent."""
    d = _docs(spark, sf_dir)
    ct = d.select(
        "doc_id",
        "lang",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    )
    n = F.size("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat(
            F.col("toks")[i - 1], F.lit(" "), F.col("toks")[i]
        ),
    )
    feats = ct.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(F.col("toks"), F.when(n >= 2, bigrams).otherwise(F.array()))
        ).alias("f"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("f").cast("binary")), 1, 6), 16, 10)
        .cast("long")
        % _DSIR_B
    )
    bucketed = feats.select("doc_id", "lang", bucket.alias("b"))
    model = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, F.lit(1))
        ).alias("ct_"),
    )
    tot = model.agg(
        F.sum("cr").alias("tr"), F.sum("ct_").alias("tt")
    )
    v = (
        f"LN(CAST(ct_ + 1 AS DOUBLE) / (tt + {_DSIR_B}))"
        f" - LN(CAST(cr + 1 AS DOUBLE) / (tr + {_DSIR_B}))"
    )
    return (
        bucketed.join(F.broadcast(model), "b")  # <= B rows: broadcast by
        # construction, never corpus-dependent
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.expr(sum4x(v)).alias("dsir_logw"),
        )
        .orderBy("doc_id")
    )
