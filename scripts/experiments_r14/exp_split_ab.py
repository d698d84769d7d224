"""Interleaved A/B: decimal-sum vs split-BIGINT aggregate shapes at sf0.1."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="exp_split_ab")
spark.sparkContext.setLogLevel("ERROR")

_B = 1 << 20
_B2 = 1 << 40


def split_total(expr, scale=8):
    q = 10 ** scale
    u = f"CAST(CAST(({expr}) AS DECIMAL({12 + scale},{scale})) * {q} AS BIGINT)"
    lo = f"PMOD({u}, {_B})"
    midhi = f"(({u}) - PMOD({u}, {_B})) DIV {_B}"
    mid = f"PMOD({midhi}, {_B})"
    hi = f"(({midhi}) - PMOD({midhi}, {_B})) DIV {_B}"
    return (f"CAST(CAST(SUM({hi}) AS DECIMAL(38,0)) * {_B2}"
            f" + CAST(SUM({mid}) AS DECIMAL(38,0)) * {_B}"
            f" + CAST(SUM({lo}) AS DECIMAL(38,0)) AS DECIMAL(30,0))")


def sumdec(expr, scale=8):
    q = 10 ** scale
    return f"CAST({split_total(expr, scale)} / {q} AS DECIMAL(38,{scale}))"


li = load_table(spark, SF, "lineitem")
o = load_table(spark, SF, "orders")
ev = load_table(spark, SF, "events")

CASES = {
    # stats_moments shape: S1 (scale 8) + S2 (scale 6) over orders
    "moments_old": lambda: o.agg(
        F.expr("CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,8))) AS DOUBLE)").alias("s1"),
        F.expr("CAST(SUM(CAST((o_totalprice * o_totalprice) AS DECIMAL(38,6))) AS DOUBLE)").alias("s2"),
        F.count(F.lit(1)).alias("n")),
    "moments_new": lambda: o.agg(
        F.expr(f"CAST({sumdec('o_totalprice')} AS DOUBLE)").alias("s1"),
        F.expr(f"CAST({sumdec('o_totalprice * o_totalprice', 6)} AS DOUBLE)").alias("s2"),
        F.count(F.lit(1)).alias("n")),
    # stats_correlation shape: 5 decimal sums over lineitem by returnflag
    "corr_old": lambda: li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.expr(f"CAST(SUM(CAST({e} AS DECIMAL(30,8))) AS DOUBLE)").alias(a)
          for e, a in [("l_quantity", "sx"), ("l_extendedprice", "sy"),
                       ("l_quantity * l_quantity", "sxx"),
                       ("l_extendedprice * l_extendedprice", "syy"),
                       ("l_quantity * l_extendedprice", "sxy")]]),
    "corr_new": lambda: li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.expr(f"CAST({sumdec(e)} AS DOUBLE)").alias(a)
          for e, a in [("l_quantity", "sx"), ("l_extendedprice", "sy"),
                       ("l_quantity * l_quantity", "sxx"),
                       ("l_extendedprice * l_extendedprice", "syy"),
                       ("l_quantity * l_extendedprice", "sxy")]]),
    # welch shape over events (groupBy event_type)
    "welch_old": lambda: ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)").alias("s1"),
        F.expr("CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)").alias("s2")),
    "welch_new": lambda: ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST({sumdec('value')} AS DOUBLE)").alias("s1"),
        F.expr(f"CAST({sumdec('value * value', 6)} AS DOUBLE)").alias("s2")),
    # q46 minute-level cascade first stage over events
    "q46min_old": lambda: ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("decimal(30,8)")).alias("sv")),
    "q46min_new": lambda: ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr(sumdec("value")).alias("sv")),
}

for name, fn in CASES.items():
    fn().write.format("noop").mode("overwrite").save()  # warm/compile

times = {k: [] for k in CASES}
for rep in range(4):
    for name, fn in CASES.items():
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.time() - t0)

for name, ts in times.items():
    print(f"{name:14s} min={min(ts):.3f}  all={[round(t,3) for t in ts]}")
spark.stop()
