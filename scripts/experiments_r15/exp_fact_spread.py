"""r15: every sf0.1 parquet table is ONE row group => every scan is ONE
task, so scan-adjacent work (partial aggregation, json parsing, Python
batches) runs single-threaded locally (guide §2.5 "one unsplittable
input: repartition immediately after the read" — the same diagnosis the
r14 text/codec spreads fixed for the documents table, never applied to
the fact tables).

This experiment A/Bs a CONDITIONAL post-scan hash repartition (only when
the scan has fewer partitions than the target, so it is a no-op at scale
where the scan's own splits dominate) injected into lineitem/orders
loads, per candidate entry, interleaved min-of-k. Filters/pruning still
reach the scan (Catalyst pushes both through RepartitionByExpression).
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.registry import load_all
from crest_spark.sources import tables as T

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(app_name="exp_fact_spread")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/lineitem.parquet").count()
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

CANDIDATES = [
    "q01_filter_project",
    "q03_agg_pricing_summary",
    "q04_distinct_agg",
    "q12_frame_window",
    "q17_json_extract",
    "q19_tumbling_batch",
    "q26_misc_aggs",
    "q38_revenue_forecast",
    "q58_market_basket",
    "stats_moments",
    "udf_scalar_pandas",
    "dedup_exact",
]

_orig = T.load_table
_KEY = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def spread_load(spark, sf_dir, name):
    df = _orig(spark, sf_dir, name)
    if name in _KEY:
        n = 2 * spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < n:
            df = df.repartition(n, _KEY[name])
    return df


import crest_spark.operators.relational as m_rel
import crest_spark.operators.subqueries as m_sub
import crest_spark.operators.udf as m_udf
import crest_spark.operators.stats as m_stats
import crest_spark.operators.behavioral as m_beh
import crest_spark.operators.timeseries as m_ts
import crest_spark.operators.dedup as m_dedup
import crest_spark.operators.tpch_shapes as m_t1
import crest_spark.operators.tpch_shapes2 as m_t2

MODS = [m_rel, m_sub, m_udf, m_stats, m_beh, m_ts, m_dedup, m_t1, m_t2]


def set_loader(fn):
    for m in MODS:
        if hasattr(m, "load_table"):
            m.load_table = fn


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


specs = load_all()
for name in CANDIDATES:
    fn = specs[name].fn
    set_loader(_orig)
    base_rows = sorted(map(tuple, fn(spark, SF).limit(100).collect())) if False else None
    a, b = [], []
    for _ in range(REPS):
        set_loader(_orig)
        a.append(time_noop(fn(spark, SF)))
        set_loader(spread_load)
        b.append(time_noop(fn(spark, SF)))
    set_loader(_orig)
    print(
        f"{name:28s} base min {min(a):.3f} {sorted(a)[:3]}"
        f" | spread min {min(b):.3f} {sorted(b)[:3]}"
        f" | ratio {min(b)/min(a):.2f}x"
    )
