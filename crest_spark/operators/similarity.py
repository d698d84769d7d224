"""Similarity search over embedding columns (``array<float>``).

Three plans, in increasing scale posture:

  q22_cosine_topk    single query vector, brute-force, pure Catalyst fold
  ann_brute_topk     K query vectors x N corpus, Arrow/numpy matmul
  ann_lsh_topk       random-hyperplane LSH bucketing (sub-quadratic)

At 100 TB the corpus side stays partitioned; query vectors are broadcast
(driver-side literal or broadcast join); the numpy path processes Arrow
batches (no per-row Python), and LSH trades recall for candidate-set size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crest_spark.functions.stable import round4
from crest_spark.functions.vectors import cosine_sim
from crest_spark.registry import register
from crest_spark.sources.tables import load_table

from crest_spark.operators.dedup import _DUCK_COS  # shared oracle cosine


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "q22_cosine_topk",
    oracle=f"""
        WITH q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT b.vec_id,
                   {round4(_DUCK_COS.replace('a.embedding', 'q.qemb'))} AS sim
            FROM embeddings b CROSS JOIN q
            WHERE b.vec_id <> 0
        )
        SELECT vec_id, sim FROM scored
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """,
    tags=("llm", "similarity", "topk"),
)
def q22_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of vec_id=0: the query vector is a 64-float
    broadcast literal (no join at all on the probe side); ordering is on
    the ROUNDED similarity so engine-level 1e-16 float noise cannot flip
    ranks — ties broken by vec_id."""
    em = _emb(spark, sf_dir)
    qvec = em.where(F.col("vec_id") == 0).select("embedding").first()[0]
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    scored = (
        em.where(F.col("vec_id") != 0)
        .withColumn("_sim_raw", cosine_sim(F.col("embedding"), qlit))
        .select("vec_id", F.expr(round4("_sim_raw")).alias("sim"))
    )
    return scored.orderBy(F.desc("sim"), "vec_id").limit(10)


_ANN_K = 5  # neighbors per query
_N_QUERIES = 5  # vec_ids 0..4 are the query set


@register(
    "ann_brute_topk",
    oracle=f"""
        WITH pairs AS (
            SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                   {round4(_DUCK_COS)} AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < {_N_QUERIES}
             AND b.vec_id <> a.vec_id
        ),
        ranked AS (
            SELECT query_id, vec_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rn
            FROM pairs
        )
        SELECT query_id, vec_id, sim, CAST(rn AS INT) AS rn
        FROM ranked WHERE rn <= {_ANN_K}
        ORDER BY query_id, rn
    """,
    tags=("llm", "similarity", "ann"),
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact K-NN for a query set via Arrow-batched numpy matmul.

    The Q query vectors are broadcast to every task inside a closure; each
    Arrow batch of the corpus becomes one numpy (B x D) block and a single
    (B x D)@(D x Q) GEMM scores all query-corpus pairs in the batch —
    no per-row Python, no shuffle until the final per-query top-k
    (a window over Q*K candidate rows after per-batch pre-truncation)."""
    import numpy as np

    em = _emb(spark, sf_dir)
    qrows = (
        em.where(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    out_schema = "query_id long, vec_id long, sim_raw double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ q_norm.T  # (B x Q)
            vec_ids = pdf["vec_id"].to_numpy()
            frames = []
            for qi, qid in enumerate(q_ids):
                mask = vec_ids != qid
                s = sims[mask, qi]
                v = vec_ids[mask]
                # per-batch pre-truncation with a tie-safety margin (final
                # ranking is on ROUNDED sim; margin >> any plausible number
                # of 1e-4-tied candidates at the cut)
                keep = _ANN_K + 16
                if len(s) > keep:
                    idx = np.argpartition(-s, keep)[:keep]
                    s, v = s[idx], v[idx]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": v, "sim_raw": s}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    candidates = em.select("vec_id", "embedding").mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    return (
        candidates.withColumn("sim", F.expr(round4("sim_raw")))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _ANN_K)
        .select("query_id", "vec_id", "sim", "rn")
        .orderBy("query_id", "rn")
    )


@register("ann_lsh_topk", oracle=None, tags=("llm", "similarity", "ann", "lsh"))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate K-NN via random-hyperplane (sign) LSH.

    16-bit signatures from seeded hyperplanes; corpus is bucketed by
    signature band (4 bands x 4 bits), queries probe their buckets only,
    exact cosine re-ranks the candidates. Sub-quadratic: candidate count
    scales with bucket occupancy, not corpus size. Approximate => no SQL
    oracle; pytest measures recall vs ann_brute_topk."""
    import random

    import numpy as np

    rng = random.Random(7)
    dim = 64
    n_bits = 16
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]

    def sig_expr(emb_col: str):
        bits = []
        for j, p in enumerate(planes):
            lit = F.array(*[F.lit(x) for x in p])
            d = F.aggregate(
                F.zip_with(
                    F.col(emb_col).cast("array<double>"), lit, lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out.cast("int")

    em = _emb(spark, sf_dir).withColumn("sig", sig_expr("embedding"))
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("sig"), bi * 4).bitwiseAND(F.lit(0xF)).alias("chunk"),
            )
            for bi in range(4)
        ]
    )
    exploded = em.select(
        "vec_id", "embedding", F.explode(bands).alias("bk")
    ).select(
        "vec_id",
        "embedding",
        F.col("bk.band").alias("band"),
        F.col("bk.chunk").alias("chunk"),
    )
    queries = exploded.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        "band",
        "chunk",
    )
    cand = (
        queries.join(exploded, ["band", "chunk"])
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("sim_raw", cosine_sim(F.col("qemb"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.withColumn("sim", F.expr(round4("sim_raw")))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _ANN_K)
        .select("query_id", "vec_id", "sim", "rn")
        .orderBy("query_id", "rn")
    )


@register("ann_ivf_topk", oracle=None, tags=("llm", "similarity", "ann", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate K-NN via IVF (inverted-file) partitioning.

    Centroids are fit driver-side on a deterministic sample (seeded
    k-means, a few Lloyd iterations on <=2k vectors — O(sample) not
    O(corpus)), then broadcast; every corpus vector is assigned to its
    nearest centroid cell in one Arrow-batched GEMM pass, and each query
    probes only its ``nprobe`` nearest cells. Candidate count scales with
    cell occupancy — the classic sub-linear ANN layout (FAISS IVF-flat
    shape) expressed as a Spark shuffle key. Approximate => rows-only
    driver check; pytest measures recall vs ann_brute_topk."""
    import numpy as np

    n_cells = 16
    nprobe = 4

    em = _emb(spark, sf_dir)
    # --- fit centroids on a seeded sample (driver-side, tiny) ---
    sample = np.array(
        [r[0] for r in em.select("embedding").limit(2000).collect()],
        dtype=np.float64,
    )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(13)
    centroids = sample[rng.choice(len(sample), n_cells, replace=False)]
    for _ in range(5):  # Lloyd iterations
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    b_cent = spark.sparkContext.broadcast(centroids)

    # --- assign corpus vectors to cells (one GEMM per Arrow batch) ---
    def assign_cells(batches):
        import pandas as pd

        cent = b_cent.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = (mat @ cent.T).argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": cells.astype("int32"),
                }
            )

    assigned = em.select("vec_id", "embedding").mapInPandas(
        assign_cells, "vec_id long, embedding array<float>, cell int"
    )

    # --- queries probe their nprobe nearest cells ---
    def probe_cells(batches):
        import pandas as pd

        cent = b_cent.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(mat @ cent.T), axis=1)[:, :nprobe]
            rows = {"query_id": [], "qemb": [], "cell": []}
            for i in range(len(pdf)):
                for c in order[i]:
                    rows["query_id"].append(pdf["vec_id"].iloc[i])
                    rows["qemb"].append(pdf["embedding"].iloc[i])
                    rows["cell"].append(int(c))
            yield pd.DataFrame(rows)

    queries = (
        em.where(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(probe_cells, "query_id long, qemb array<float>, cell int")
    )

    cand = (
        queries.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim_raw", cosine_sim(F.col("qemb"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.withColumn("sim", F.expr(round4("sim_raw")))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _ANN_K)
        .select("query_id", "vec_id", "sim", "rn")
        .orderBy("query_id", "rn")
    )
