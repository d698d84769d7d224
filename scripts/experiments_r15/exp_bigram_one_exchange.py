"""r15 VERDICT #3: text_bigram_nll residual — the tokenize+explode subtree
plans 5x and relies on AQE runtime exchange-reuse. Variants:

  V1: the q58 treatment — repartition the (doc_id, b, k1, k2) occurrence
      stream ONCE by the bigram key; the bigram-count aggregate and the
      scoring join both reuse that single exchange (ReusedExchange), so
      the tokenize+explode subtree runs once for both consumers.
  V2: V1 + derive the unigram counts from the SAME single combined
      explode (per-position struct carrying k2 always and b/k1 for
      positions >= 1), removing the second tokenize+explode pass.

Row identity vs the registry entry + interleaved min-of-k A/B.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.registry import load_all
from crest_spark.operators.text import _docs, _BIGRAM_P
from crest_spark.functions.stable import avg4x

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark(app_name="exp_bigram")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/documents.parquet").count()


def _ct():
    d = _docs(spark, SF, spread=True)
    return d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    )


def _bg(ct):
    n = F.size("toks")
    sep = F.lit(" ")
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
    return (
        ct.where(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.col("p.b").alias("b"),
            F.col("p.k1").alias("k1"),
            F.col("p.k2").alias("k2"),
        )
    )


def v1():
    ct = _ct()
    bg = _bg(ct).repartition("b")
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


def v2():
    ct = _ct()
    # one combined per-position explode: k2 for every token, b/k1 only
    # for positions >= 1 (the bigram ending at that position)
    entries = F.expr(
        "transform(toks, (x, i) -> struct("
        " xxhash64(x) AS k2,"
        " CASE WHEN i >= 1 THEN"
        "   xxhash64(concat(element_at(toks, i), ' ', x)) END AS b,"
        " CASE WHEN i >= 1 THEN xxhash64(element_at(toks, i)) END AS k1))"
    )
    rows = ct.select("doc_id", F.explode(entries).alias("p")).select(
        "doc_id",
        F.col("p.k2").alias("k2"),
        F.col("p.b").alias("b"),
        F.col("p.k1").alias("k1"),
    )
    bg = rows.where(F.col("b").isNotNull()).repartition("b")
    bfreq = bg.groupBy("b", "k1", "k2").agg(F.count(F.lit(1)).alias("cb"))
    cfreq = bfreq.groupBy("k1").agg(F.sum("cb").alias("c1"))
    ufreq = rows.select("k2").groupBy("k2").agg(F.count(F.lit(1)).alias("cu"))
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


specs = load_all()
base_fn = specs["text_bigram_nll"].fn

base_rows = sorted(map(tuple, base_fn(spark, SF).collect()))
for tag, fn in (("v1", v1), ("v2", v2)):
    rows = sorted(map(tuple, fn().collect()))
    print(f"{tag}: rows_identical={rows == base_rows}")


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


b_t, v1_t, v2_t = [], [], []
for _ in range(REPS):
    b_t.append(time_noop(base_fn(spark, SF)))
    v1_t.append(time_noop(v1()))
    v2_t.append(time_noop(v2()))
print(f"base min {min(b_t):.3f}s {sorted(b_t)}")
print(f"v1   min {min(v1_t):.3f}s {sorted(v1_t)} ratio {min(v1_t)/min(b_t):.2f}x")
print(f"v2   min {min(v2_t):.3f}s {sorted(v2_t)} ratio {min(v2_t)/min(b_t):.2f}x")
