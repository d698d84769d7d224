"""A/B round 3: actual q15d/q15e/q28e entry bodies, old vs new."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.functions.stable import round4, sum4x

spark = get_spark(app_name="exp_split_ab3")
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


li = load_table(spark, SF, "lineitem")
o = load_table(spark, SF, "orders")
c = load_table(spark, SF, "customer")


def q15d_old():
    pv = (li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"])
          .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)"))).na.fill(0.0))
    return pv.select("l_returnflag", F.expr(round4("F")).alias("F"),
                     F.expr(round4("O")).alias("O")).orderBy("l_returnflag")


def q15d_new():
    pv = (li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"])
          .agg(F.expr(sumdec("l_quantity"))).na.fill(0.0))
    return pv.select("l_returnflag", F.expr(round4("F")).alias("F"),
                     F.expr(round4("O")).alias("O")).orderBy("l_returnflag")


def q15e_core(qty_expr, price_expr):
    agg = li.groupBy("l_returnflag").agg(
        F.expr(qty_expr).alias("sum_qty"), F.expr(price_expr).alias("sum_price"))
    return agg.unpivot(ids=["l_returnflag"], values=["sum_qty", "sum_price"],
                       variableColumnName="metric", valueColumnName="value"
                       ).orderBy("l_returnflag", "metric")


def q15e_old():
    return q15e_core(round4("SUM(CAST(l_quantity AS DECIMAL(30,8)))"),
                     round4("SUM(CAST(l_extendedprice AS DECIMAL(30,8)))"))


def q15e_new():
    return q15e_core(sum4x("l_quantity"), sum4x("l_extendedprice"))


def q28e_core(filter_new):
    big = li.groupBy("l_orderkey").agg(
        F.expr(sum4x("l_quantity")).alias("sum_qty"),
        *( [F.expr(split_total("l_quantity")).alias("_exact_u")] if filter_new
           else [F.expr("SUM(CAST(l_quantity AS DECIMAL(30,8)))").alias("_exact_qty")] ))
    big = (big.where(F.col("_exact_u") > 30000000000).drop("_exact_u") if filter_new
           else big.where(F.col("_exact_qty") > 300).drop("_exact_qty"))
    return (big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_name", "c_custkey", "o_orderkey",
                    F.expr(round4("o_totalprice")).alias("total_price"), "sum_qty")
            .orderBy(F.desc("total_price"), "o_orderkey"))


CASES = {
    "q15d_old": q15d_old, "q15d_new": q15d_new,
    "q15e_old": q15e_old, "q15e_new": q15e_new,
    "q28e_old": lambda: q28e_core(False), "q28e_new": lambda: q28e_core(True),
}

# row equality first
for base in ("q15d", "q15e", "q28e"):
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
