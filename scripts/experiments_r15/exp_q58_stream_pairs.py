"""r15 ADVICE fix: q58 pair expansion — flatten-then-explode (r14, whole
O(k^2) pair array materialized per basket row) vs chained generators
(posexplode + sliced explode, O(k) per-row memory). Row identity + an
interleaved A/B on the full q58 entry at the given SF."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.registry import load_all
from crest_spark.operators.behavioral import (
    _MB_MIN_N,
    basket_item_arrays,
)
from crest_spark.sources.tables import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark(app_name="exp_q58_stream")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/lineitem.parquet").count()


def pairs_flatten(grouped, min_support=_MB_MIN_N):
    # the r14 form, reproduced verbatim for the A side
    pair_arr = F.flatten(
        F.expr(
            "transform(pks, (x, i) -> transform("
            "slice(pks, i + 2, size(pks)), y -> struct(x AS a, y AS b)))"
        )
    )
    return (
        grouped.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )


def grouped():
    b = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    return basket_item_arrays(b)


from crest_spark.operators.behavioral import basket_pairs_from_arrays

a = sorted(map(tuple, pairs_flatten(grouped()).collect()))
b = sorted(map(tuple, basket_pairs_from_arrays(grouped()).collect()))
print("pairs_identical:", a == b, f"({len(a)} pairs)")

specs = load_all()
q58 = specs["q58_market_basket"].fn


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# A = pure pair stage with flatten; B = pure pair stage streamed;
# C = the full q58 entry (streamed form now in source)
olds, news, fulls = [], [], []
for _ in range(REPS):
    olds.append(time_noop(pairs_flatten(grouped())))
    news.append(time_noop(basket_pairs_from_arrays(grouped())))
    fulls.append(time_noop(q58(spark, SF)))
print(
    f"pair stage: flatten min {min(olds):.3f}s {sorted(olds)}"
    f" | streamed min {min(news):.3f}s {sorted(news)}"
    f" | ratio {min(news)/min(olds):.2f}x"
)
print(f"full q58 (streamed): min {min(fulls):.3f}s {sorted(fulls)}")
