"""A/B: _stage_changes' two-exceptAll diff vs a single signed-count
aggregate deriving both directions (pre = net>0, post = net<0).

Spark rewrites EXCEPT ALL into exactly this aggregate internally
(RewriteExceptAll), so the two directions are sign-inverted copies of
the same corpus-scale aggregate that AQE cannot share; one aggregate
computes both. Equality asserted (multiset, per change type) before
timing; interleaved, min-of-N, real parquet write like the production
path. Run: python scripts/experiments_r14/exp_stage_changes.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, "/root/repo")

from crest_spark.session import get_spark  # noqa: E402
from crest_spark.sources.tables import load_table  # noqa: E402

KEYS = ["event_id"]


def classify(pre: DataFrame, post: DataFrame, keys: list[str]) -> DataFrame:
    pre_keys = pre.select(*keys).distinct()
    post_keys = post.select(*keys).distinct()
    ct = "_change_type"
    return (
        pre.join(post_keys, keys, "left_semi")
        .withColumn(ct, F.lit("update_preimage"))
        .unionByName(
            pre.join(post_keys, keys, "left_anti").withColumn(
                ct, F.lit("delete")
            )
        )
        .unionByName(
            post.join(pre_keys, keys, "left_semi").withColumn(
                ct, F.lit("update_postimage")
            )
        )
        .unionByName(
            post.join(pre_keys, keys, "left_anti").withColumn(
                ct, F.lit("insert")
            )
        )
    )


def stage_old(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    return classify(old.exceptAll(new), new.exceptAll(old), keys)


def stage_new(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    cols = old.columns
    net = (
        old.withColumn("__d", F.lit(1).cast("long"))
        .unionByName(new.withColumn("__d", F.lit(-1).cast("long")))
        .groupBy(*cols)
        .agg(F.sum("__d").alias("__net"))
        .where(F.col("__net") != 0)
    )
    pre = (
        net.where(F.col("__net") > 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__net"))))
        .drop("__i", "__net")
    )
    post = (
        net.where(F.col("__net") < 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), -F.col("__net"))))
        .drop("__i", "__net")
    )
    return classify(pre, post, keys)


def write_time(df: DataFrame) -> float:
    d = tempfile.mkdtemp(prefix="crest_stage_ab_")
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(d)
    dt = time.perf_counter() - t0
    shutil.rmtree(d, ignore_errors=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("exp-stage-changes")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # old = current touched region; new = merged rowset (hot-key update
    # wave + tombstones + inserts — the lake_mor_cdf shape, incl. dup
    # rows surviving unchanged so exceptAll multiset semantics matter)
    old = ev
    new = (
        ev.where(F.col("event_id") % 17 != 0)
        .select(
            "event_id",
            F.when(F.col("event_id") % 11 == 0, F.lit("w1"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(
                F.col("event_id") % 11 == 0, F.col("value") + 1000.0
            )
            .otherwise(F.col("value"))
            .alias("value"),
        )
        .unionByName(
            ev.where(F.col("event_id") % 503 == 0).select(
                (F.col("event_id") + 20_000_000).alias("event_id"),
                F.lit("new").alias("event_type"),
                F.lit(-1.0).alias("value"),
            )
        )
    )

    a = sorted(map(tuple, stage_old(old, new, KEYS).collect()))
    b = sorted(map(tuple, stage_new(old, new, KEYS).collect()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"changes identical ({len(a)} rows)")

    olds, news = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"stage old rep{i}")
        olds.append(write_time(stage_old(old, new, KEYS)))
        spark.sparkContext.setJobDescription(f"stage new rep{i}")
        news.append(write_time(stage_new(old, new, KEYS)))
    spark.sparkContext.setJobDescription(None)
    print("old:", [f"{t:.3f}" for t in olds], "min", f"{min(olds):.3f}")
    print("new:", [f"{t:.3f}" for t in news], "min", f"{min(news):.3f}")
    print(f"ratio new/old (min): {min(news) / min(olds):.3f}")


if __name__ == "__main__":
    main()
