"""r15: q54_rolling_active_users — the single aggregate computes TWO
distinct aggregates with different children, so Catalyst plans an
Expand(x2) over the 7x-exploded spans: 14 copies of every (user, day)
pair cross the exchange. Variant: DAU derives from the already-distinct
(user, day) relation with a plain count (no distinct, no explode), WAU
stays a single countDistinct over the 7x spans (no Expand needed for
one distinct child), joined day-wise. Rows identical; shuffled copies
14x -> 7x + day-sized sides."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.registry import load_all
from crest_spark.sources.tables import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
_DAY = 86400

spark = get_spark(app_name="exp_q54")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/events.parquet").count()


def v_split():
    ev = load_table(spark, SF, "events")
    ud = (
        ev.select(
            "user_id",
            F.expr(f"unix_timestamp(ts) DIV {_DAY}").alias("d"),
        )
        .distinct()
    )
    days = ud.select(F.col("d").alias("day_epoch")).distinct()
    spans = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6))).alias(
            "day_epoch"
        ),
    )
    dau = ud.groupBy(F.col("d").alias("day_epoch")).agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    wau = (
        spans.join(F.broadcast(days), "day_epoch", "left_semi")
        .groupBy("day_epoch")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(wau, "day_epoch").orderBy("day_epoch")


specs = load_all()
base_fn = specs["q54_rolling_active_users"].fn
a = sorted(map(tuple, base_fn(spark, SF).collect()))
b = sorted(map(tuple, v_split().collect()))
print("rows_identical:", a == b, f"({len(a)} days)")


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


olds, news = [], []
for _ in range(REPS):
    olds.append(time_noop(base_fn(spark, SF)))
    news.append(time_noop(v_split()))
print(f"base  min {min(olds):.3f}s {sorted(olds)}")
print(f"split min {min(news):.3f}s {sorted(news)} ratio {min(news)/min(olds):.2f}x")
