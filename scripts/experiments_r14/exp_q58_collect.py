"""A/B: q58_market_basket current (distinct + self-join) vs collect_set
pair generation (ONE corpus exchange on ok instead of distinct's (ok,pk)
exchange followed by the join's re-exchange on ok).

Equality is asserted on the full returned rowset before any timing.
Interleaved old/new timing, min-of-N, noop sink (bench methodology).

Run: python scripts/experiments_r14/exp_q58_collect.py /root/testdata/sf0.1
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from crest_spark.functions.stable import round4  # noqa: E402
from crest_spark.operators.behavioral import (  # noqa: E402
    _MB_MIN_N,
    q58_market_basket,
)
from crest_spark.session import get_spark  # noqa: E402
from crest_spark.sources.tables import load_table  # noqa: E402


def q58_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set form: one corpus exchange on ok; pairs, singles, and
    the basket census all derive from the grouped relation."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .groupBy("ok")
        .agg(F.array_sort(F.collect_set("pk")).alias("pks"))
    )
    nb = g.groupBy().agg(F.count(F.lit(1)).cast("double").alias("_n_orders"))
    single = g.select(F.explode("pks").alias("pk")).groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_p")
    )
    pair_arr = F.flatten(
        F.expr(
            "transform(pks, (x, i) -> "
            "transform(slice(pks, i + 2, size(pks)), y -> struct(x AS a, y AS b)))"
        )
    )
    pairs = (
        g.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _MB_MIN_N)
    )
    sa = single.select(F.col("pk").alias("part_a"), F.col("n_p").alias("_na"))
    sb = single.select(F.col("pk").alias("part_b"), F.col("n_p").alias("_nb"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(nb)
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.expr(
                round4("CAST(n_ab AS DOUBLE) * _n_orders / (_na * _nb)")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


def noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("exp-q58")
    old_df = q58_market_basket(spark, sf_dir)
    new_df = q58_collect(spark, sf_dir)

    old_rows = [tuple(r) for r in old_df.collect()]
    new_rows = [tuple(r) for r in new_df.collect()]
    assert old_rows == new_rows, (
        f"MISMATCH\nold={old_rows[:5]}\nnew={new_rows[:5]}"
    )
    print(f"rows identical ({len(old_rows)} rows)")

    olds, news = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"q58 old rep{i}")
        olds.append(noop(q58_market_basket(spark, sf_dir)))
        spark.sparkContext.setJobDescription(f"q58 new rep{i}")
        news.append(noop(q58_collect(spark, sf_dir)))
    spark.sparkContext.setJobDescription(None)
    print("old:", [f"{t:.3f}" for t in olds], "min", f"{min(olds):.3f}")
    print("new:", [f"{t:.3f}" for t in news], "min", f"{min(news):.3f}")
    print(f"ratio new/old (min): {min(news) / min(olds):.3f}")


if __name__ == "__main__":
    main()
