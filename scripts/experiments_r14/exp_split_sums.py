"""Validate generalized split-BIGINT sums vs decimal sums (value equality)."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"
spark = get_spark(app_name="exp_split")
spark.sparkContext.setLogLevel("ERROR")

_B = 1 << 20
_B2 = 1 << 40


def split_total(expr: str, scale: int = 8) -> str:
    q = 10 ** scale
    u = f"CAST(CAST(({expr}) AS DECIMAL({12 + scale},{scale})) * {q} AS BIGINT)"
    lo = f"PMOD({u}, {_B})"
    midhi = f"(({u}) - PMOD({u}, {_B})) DIV {_B}"
    mid = f"PMOD({midhi}, {_B})"
    hi = f"(({midhi}) - PMOD({midhi}, {_B})) DIV {_B}"
    return (
        f"CAST(CAST(SUM({hi}) AS DECIMAL(38,0)) * {_B2}"
        f" + CAST(SUM({mid}) AS DECIMAL(38,0)) * {_B}"
        f" + CAST(SUM({lo}) AS DECIMAL(38,0)) AS DECIMAL(30,0))"
    )


def sumdec(expr: str, scale: int = 8) -> str:
    q = 10 ** scale
    return f"CAST({split_total(expr, scale)} / {q} AS DECIMAL(38,{scale}))"


def check(df, old_expr, new_expr, group=None, label=""):
    g = df.groupBy(*group) if group else df.groupBy(F.lit(1).alias("_g"))
    a = g.agg(F.expr(old_expr).alias("v"))
    b = g.agg(F.expr(new_expr).alias("v"))
    bad = a.exceptAll(b).unionAll(b.exceptAll(a)).count()
    ta = dict(a.dtypes)["v"]; tb = dict(b.dtypes)["v"]
    print(f"{label:45s} mismatch_rows={bad}  dtype {ta} vs {tb}")
    return bad == 0 and ta == tb


li = load_table(spark, SF, "lineitem")
ev = load_table(spark, SF, "events")
o = load_table(spark, SF, "orders")

ok = True
# scale 8, plain
ok &= check(li, "SUM(CAST(l_extendedprice AS DECIMAL(30,8)))",
            sumdec("l_extendedprice"), ["l_returnflag"], "s8 extendedprice")
# scale 8, squares (corr entry domain)
ok &= check(li, "SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8)))",
            sumdec("l_extendedprice * l_extendedprice"), ["l_returnflag"], "s8 price^2")
# scale 6: welch/anova S2 over o_totalprice^2  (DECIMAL(38,6) original)
ok &= check(o, "SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6)))",
            sumdec("o_totalprice * o_totalprice", 6), None, "s6 totalprice^2")
# scale 6 over events value^2
ok &= check(ev, "SUM(CAST(value * value AS DECIMAL(38,6)))",
            sumdec("value * value", 6), ["event_type"], "s6 value^2")
# scale 4 of pre-rounded (q66 revenue shape)
ok &= check(ev, "SUM(CAST(ROUND(value * 3.7, 4) AS DECIMAL(38,4)))",
            sumdec("ROUND(value * 3.7, 4)", 4), ["event_type"], "s4 rounded product")
# negative + NULL handling
mix = spark.sql(
    "SELECT CASE WHEN id % 7 = 0 THEN NULL ELSE (id - 500000) * 0.000030518"
    " END AS v, id % 3 AS g FROM range(1000000)"
)
ok &= check(mix, "SUM(CAST(v AS DECIMAL(30,8)))", sumdec("v"), ["g"], "s8 null/neg synthetic")
ok &= check(mix.where("v IS NULL"), "SUM(CAST(v AS DECIMAL(30,8)))",
            sumdec("v"), ["g"], "s8 all-NULL group")

# pivot compound-agg support (q15d)
try:
    pv = (li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"])
          .agg(F.expr(sumdec("l_quantity"))))
    pv_old = (li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"])
              .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)"))))
    bad = pv.exceptAll(pv_old.select(*pv.columns)).count() + \
        pv_old.select(*pv.columns).exceptAll(pv).count()
    print(f"{'pivot compound agg':45s} mismatch_rows={bad} dtypes {pv.dtypes} vs {pv_old.dtypes}")
except Exception as e:
    print("pivot compound agg FAILED:", type(e).__name__, str(e)[:200])

# pagerank contribution sum: c = ROUND(pr/d, 8)::dec(30,8); SUM(c)::double
pr = spark.sql(
    "SELECT id % 997 AS dst, 1.0/(1.0+id) AS pr, 1 + id % 13 AS d FROM range(300000)"
)
ok &= check(pr, "CAST(SUM(CAST(ROUND(pr / d, 8) AS DECIMAL(30,8))) AS DOUBLE)",
            f"CAST({split_total('ROUND(pr / d, 8)')} / 100000000 AS DOUBLE)",
            ["dst"], "pagerank contrib sum -> double")

# q28e filter equivalence: exact_qty > 300  <=>  split_total > 300e8
a = li.groupBy("l_orderkey").agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(30,8)))").alias("x")) \
      .where("x > 300").select("l_orderkey")
b = li.groupBy("l_orderkey").agg(F.expr(split_total("l_quantity")).alias("x")) \
      .where("x > 30000000000").select("l_orderkey")
bad = a.exceptAll(b).unionAll(b.exceptAll(a)).count()
print(f"{'q28e HAVING filter':45s} mismatch_rows={bad}")

# integer label split (scale 0, direct BIGINT, no decimal cast)
lbl = spark.sql("SELECT CAST(id * 2654435761 % 1000000007 AS BIGINT) AS label FROM range(500000)")
u = "label"
lo = f"PMOD({u}, {_B})"; midhi = f"(({u}) - PMOD({u}, {_B})) DIV {_B}"
mid = f"PMOD({midhi}, {_B})"; hi = f"(({midhi}) - PMOD({midhi}, {_B})) DIV {_B}"
row = lbl.agg(
    F.expr("SUM(CAST(label AS DECIMAL(38,0)))").alias("dec"),
    F.expr(f"CAST(CAST(SUM({hi}) AS DECIMAL(38,0)) * {_B2} + CAST(SUM({mid}) AS DECIMAL(38,0)) * {_B}"
           f" + CAST(SUM({lo}) AS DECIMAL(38,0)) AS DECIMAL(38,0))").alias("spl"),
).collect()[0]
print(f"{'label sum int split':45s} equal={row['dec'] == row['spl']} ({row['dec']})")

print("ALL_OK" if ok else "SOME_FAILED")
spark.stop()
