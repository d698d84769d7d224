"""r15 VERDICT #1: disposition the r14 q37/q38 'regressions'.

The driver measured q37 1.230->1.625s and q38 0.224->0.265s in r14, whose
only change at those call sites was sum4 -> sum4x in the final aggregate
(tpch_shapes2.py:233,271). Plans were identical before/after; the builder
measured them flat. This script re-measures interleaved (sum4 vs sum4x
spellings of the SAME query body, alternating within one process) so box
drift cannot masquerade as a plan cost. Run it twice:

    SPARK_GRAFT_CPUS=32 python exp_q37q38_sum_ab.py
    SPARK_GRAFT_CPUS=8  python exp_q37q38_sum_ab.py

If sum4x reproducibly loses >10% on either entry at either width, revert
those two call sites; otherwise record the pair as noise-exonerated.
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.functions.stable import sum4, sum4x

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = get_spark(app_name="exp_q37q38")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/lineitem.parquet").count()

_t = lambda name: load_table(spark, SF, name)
_REV = "l_extendedprice * (1 - l_discount)"


def q37(sum_fn):
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
        .agg(F.expr(sum_fn(_REV)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q38(sum_fn):
    li = _t("lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.round(F.col("l_discount") * 100).cast("bigint").between(5, 7)
        & (F.col("l_quantity") < 24)
    ).agg(F.expr(sum_fn("l_extendedprice * l_discount")).alias("revenue"))


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


cpus = os.environ.get("SPARK_GRAFT_CPUS", "unset")
for name, builder in (("q37", q37), ("q38", q38)):
    # row identity first
    a = sorted(tuple(r) for r in builder(sum4).collect())
    b = sorted(tuple(r) for r in builder(sum4x).collect())
    old, new = [], []
    for _ in range(REPS):
        old.append(time_noop(builder(sum4)))
        new.append(time_noop(builder(sum4x)))
    print(
        f"{name} cpus={cpus}: rows_identical={a == b}"
        f" | sum4 min {min(old):.3f}s med {sorted(old)[len(old)//2]:.3f}"
        f" | sum4x min {min(new):.3f}s med {sorted(new)[len(new)//2]:.3f}"
        f" | min-ratio(new/old) {min(new)/min(old):.2f}x"
    )
print("done")
