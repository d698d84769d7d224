"""A/B round 4: q39, q30, q66, q32 actual bodies old vs new."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table

spark = get_spark(app_name="exp_split_ab4")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

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


from crest_spark.operators.tpch_shapes2 import _REV  # revenue expr snippet

li = load_table(spark, SF, "lineitem")
part = load_table(spark, SF, "part")
o = load_table(spark, SF, "orders")
c = load_table(spark, SF, "customer")
n1 = load_table(spark, SF, "nation")
r = load_table(spark, SF, "region")
s = load_table(spark, SF, "supplier")
ev = load_table(spark, SF, "events")

_Q8_NUM_O = ("SUM(CASE WHEN s_nationkey = 9 "
             f"THEN CAST(({_REV}) AS DECIMAL(30,8)) "
             "ELSE CAST(0 AS DECIMAL(30,8)) END)")
_Q8_DEN_O = f"SUM(CAST(({_REV}) AS DECIMAL(30,8)))"
_Q8_NUM_N = sumdec(f"CASE WHEN s_nationkey = 9 THEN ({_REV}) ELSE 0.0 END")
_Q8_DEN_N = sumdec(f"({_REV})")


def q39(new):
    num, den = (_Q8_NUM_N, _Q8_DEN_N) if new else (_Q8_NUM_O, _Q8_DEN_O)
    share = (f"CAST(ROUND(CAST(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"
             " AS DECIMAL(30,12)), 4) AS DOUBLE)")
    pp = part.where(F.col("p_type") == "ECONOMY")
    oo = o.where((F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    rr = r.where(F.col("r_name") == "AMERICA")
    return (li.join(F.broadcast(pp), F.col("p_partkey") == F.col("l_partkey"))
            .join(oo, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(rr), F.col("n_regionkey") == F.col("r_regionkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.expr(share).alias("mkt_share")).orderBy("o_year"))


def q66(new):
    credited = ev.select(
        "event_type",
        (F.col("value") * 0.01).alias("amount"),
        F.when(F.col("event_id") % 3 == 0, F.lit(1.0))
         .when(F.col("event_id") % 3 == 1, F.lit(0.4))
         .otherwise(F.lit(0.2)).alias("credit"))
    if new:
        aggs = [F.expr(f"CAST({sumdec('ROUND(credit, 6)', 6)} AS DOUBLE)").alias("conversions"),
                F.expr(f"CAST({sumdec('ROUND(credit * amount, 4)', 4)} AS DOUBLE)").alias("revenue")]
    else:
        aggs = [F.expr("CAST(SUM(CAST(ROUND(credit, 6) AS DECIMAL(38,6))) AS DOUBLE)").alias("conversions"),
                F.expr("CAST(SUM(CAST(ROUND(credit * amount, 4) AS DECIMAL(38,4))) AS DOUBLE)").alias("revenue")]
    return credited.groupBy("event_type").agg(*aggs).orderBy("event_type")


CASES = {
    "q39_old": lambda: q39(False), "q39_new": lambda: q39(True),
    "q66sh_old": lambda: q66(False), "q66sh_new": lambda: q66(True),
}
for base in ("q39", "q66sh"):
    a, b = CASES[f"{base}_old"]().collect(), CASES[f"{base}_new"]().collect()
    print(base, "rows_equal:", a == b, f"({len(a)} rows)")
for name, fn in CASES.items():
    fn().write.format("noop").mode("overwrite").save()
times = {k: [] for k in CASES}
for rep in range(4):
    for name, fn in CASES.items():
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        times[name].append(time.time() - t0)
for name, ts in times.items():
    print(f"{name:10s} min={min(ts):.3f}  all={[round(t,3) for t in ts]}")
spark.stop()
