"""r15 VERDICT #2: pin dims-only broadcasts in the six entries where the
64 MB local threshold broadcasts a raw fact table (lineitem into
q06/q24c/q37/q40, orders into q07/q10), so the benched local plan shape
matches the 100 TB plan shape.

Variants spell each entry with MERGE hints on every SF-scaling join side
(fact-fact joins and fact-scale filtered sides), keeping broadcast hints
only on bounded dims (nation/region/asia_nations).  The script:

  1. proves row-identity base vs pinned (collect + compare) at the given SF,
  2. prints the pinned plan's join nodes (expect SMJ on fact joins,
     BroadcastExchange only above dim relations),
  3. interleaved min-of-k A/B timing via the noop sink.

Usage: python exp_broadcast_pin.py [sf_dir] [reps]
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.registry import load_all
from crest_spark.functions.stable import sum4x

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(app_name="exp_broadcast_pin")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/lineitem.parquet").count()  # warm

_t = lambda name: load_table(spark, SF, name)


def q06_pinned():
    c = _t("customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t("orders")
    li = _t("lineitem")
    return (
        c.hint("merge")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("rev"))
        .orderBy(F.desc("rev"), "o_orderkey")
        .limit(10)
    )


def q07_pinned():
    c = _t("customer")
    o = _t("orders")
    return (
        c.join(o.hint("merge"), c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


def q10_pinned():
    o = _t("orders")
    li = _t("lineitem")
    return (
        o.join(
            li.hint("merge"),
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderkey")
    )


def q24c_pinned():
    o = _t("orders")
    c = _t("customer")
    li = _t("lineitem")
    o.createOrReplaceTempView("_xp_orders")
    c.createOrReplaceTempView("_xp_customer")
    li.createOrReplaceTempView("_xp_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey
        FROM _xp_orders o
        WHERE o_custkey IN (
            SELECT /*+ MERGE */ c_custkey FROM _xp_customer
            WHERE c_mktsegment = 'BUILDING')
          AND NOT EXISTS (
            SELECT /*+ MERGE */ 1 FROM _xp_lineitem l
            WHERE l.l_quantity > 45 AND l.l_orderkey = o.o_orderkey)
        ORDER BY o_orderkey
        """
    )


def q37_pinned():
    o = _t("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = _t("customer")
    li = _t("lineitem")
    s = _t("supplier")
    n = _t("nation")
    r = _t("region").where(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s_asia = s.join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c_asia = c.join(
        F.broadcast(asia_nations.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        o.join(c_asia.hint("merge"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s_asia.hint("merge"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q40_pinned():
    c = _t("customer")
    o = _t("orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t("lineitem").where(F.col("l_returnflag") == "R")
    n = _t("nation")
    return (
        c.hint("merge")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(sum4x("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


specs = load_all()
VARIANTS = {
    "q06_join3_topk": q06_pinned,
    "q07_left_outer": q07_pinned,
    "q10_range_join": q10_pinned,
    "q24c_in_subquery": q24c_pinned,
    "q37_local_supplier_volume": q37_pinned,
    "q40_returned_items": q40_pinned,
}


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for name, variant in VARIANTS.items():
    base_fn = specs[name].fn
    base = base_fn(spark, SF)
    pinned = variant()
    same = rows_of(base) == rows_of(pinned)
    print(f"== {name}: rows_identical={same}")
    if not same:
        continue
    # plan shape: join nodes + broadcast exchanges in the PINNED plan
    plan = pinned._sc._jvm.PythonSQLUtils.explainString(
        pinned._jdf.queryExecution(), "formatted"
    )
    joins = [
        ln.strip()
        for ln in plan.splitlines()
        if "Join" in ln and ("+-" in ln or ":-" in ln)
    ]
    n_bcast = plan.count("BroadcastExchange")
    print(f"   pinned plan: {n_bcast} BroadcastExchange; joins:")
    for j in joins[:10]:
        print(f"     {j}")
    a_times, b_times = [], []
    for _ in range(REPS):
        a_times.append(time_noop(base_fn(spark, SF)))
        b_times.append(time_noop(variant()))
    print(
        f"   base min {min(a_times):.3f}s {sorted(a_times)}"
        f" | pinned min {min(b_times):.3f}s {sorted(b_times)}"
        f" | ratio {min(b_times)/min(a_times):.2f}x"
    )
print("done")
