"""A/B round 2: welch/moments at 5M rows; high-card shapes; label sum."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark

spark = get_spark(app_name="exp_split_ab2")
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


# 5M-row synthetic event-like table, 6 low-card groups, checkpointed so
# generation isn't billed
big = spark.sql(
    "SELECT id % 6 AS g, CAST(id % 100003 AS BIGINT) AS hk,"
    " (id % 9973) * 0.037 + 0.5 AS value FROM range(5000000)"
).localCheckpoint()
big.count()

CASES = {
    # welch/anova/moments shape at volume: s8 + s6 sums, low-card groups
    "welch5M_old": lambda: big.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)").alias("s1"),
        F.expr("CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)").alias("s2")),
    "welch5M_new": lambda: big.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST({sumdec('value')} AS DOUBLE)").alias("s1"),
        F.expr(f"CAST({sumdec('value * value', 6)} AS DOUBLE)").alias("s2")),
    # high-cardinality groups (100k), single sum — q41/gini/q46min shape
    "hicard_old": lambda: big.groupBy("hk").agg(
        F.sum(F.col("value").cast("decimal(30,8)")).alias("sv")),
    "hicard_new": lambda: big.groupBy("hk").agg(
        F.expr(sumdec("value")).alias("sv")),
    # global integer label sum (components convergence check)
    "label_old": lambda: big.agg(
        F.expr("SUM(CAST(hk AS DECIMAL(38,0)))").alias("s")),
    "label_new": lambda: big.agg(
        F.expr(f"CAST(CAST(SUM((hk - PMOD(hk, {_B})) DIV {_B}) AS DECIMAL(38,0)) * {_B}"
               f" + CAST(SUM(PMOD(hk, {_B})) AS DECIMAL(38,0)) AS DECIMAL(38,0))").alias("s")),
}

for name, fn in CASES.items():
    fn().write.format("noop").mode("overwrite").save()

times = {k: [] for k in CASES}
for rep in range(4):
    for name, fn in CASES.items():
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.time() - t0)

for name, ts in times.items():
    print(f"{name:12s} min={min(ts):.3f}  all={[round(t,3) for t in ts]}")
spark.stop()
