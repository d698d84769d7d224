"""A/B: q59_audience_overlap current (distinct + self-join on user) vs
collect_set-per-user pair generation (one corpus exchange on u).

Equality asserted on the full rowset before timing; interleaved
old/new, min-of-N, noop sink. Run:
python scripts/experiments_r14/exp_q59_collect.py /root/testdata/sf0.1
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from crest_spark.functions.stable import round4  # noqa: E402
from crest_spark.operators.behavioral import (  # noqa: E402
    q59_audience_overlap,
)
from crest_spark.session import get_spark  # noqa: E402
from crest_spark.sources.tables import load_table  # noqa: E402


def q59_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.select(F.col("event_type").alias("t"), F.col("user_id").alias("u"))
        .groupBy("u")
        .agg(F.array_sort(F.collect_set("t")).alias("ts"))
    )
    sizes = (
        g.select(F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_arr = F.flatten(
        F.expr(
            "transform(ts, (x, i) -> transform("
            "slice(ts, i + 2, size(ts)), y -> struct(x AS a, y AS b)))"
        )
    )
    inter = (
        g.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("t").alias("type_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col("t").alias("type_b"), F.col("n").alias("_nb"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("i").cast("long").alias("n_shared"),
            F.expr(round4("CAST(i AS DOUBLE) / (_na + _nb - i)")).alias(
                "jaccard"
            ),
        )
        .orderBy("type_a", "type_b")
    )


def noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("exp-q59")
    old_rows = [tuple(r) for r in q59_audience_overlap(spark, sf_dir).collect()]
    new_rows = [tuple(r) for r in q59_collect(spark, sf_dir).collect()]
    assert old_rows == new_rows, (
        f"MISMATCH\nold={old_rows[:5]}\nnew={new_rows[:5]}"
    )
    print(f"rows identical ({len(old_rows)} rows)")
    olds, news = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"q59 old rep{i}")
        olds.append(noop(q59_audience_overlap(spark, sf_dir)))
        spark.sparkContext.setJobDescription(f"q59 new rep{i}")
        news.append(noop(q59_collect(spark, sf_dir)))
    spark.sparkContext.setJobDescription(None)
    print("old:", [f"{t:.3f}" for t in olds], "min", f"{min(olds):.3f}")
    print("new:", [f"{t:.3f}" for t in news], "min", f"{min(news):.3f}")
    print(f"ratio new/old (min): {min(news) / min(olds):.3f}")


if __name__ == "__main__":
    main()
