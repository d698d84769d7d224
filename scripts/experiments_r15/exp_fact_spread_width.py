"""Width tuning for the three fact-spread winners (q03/q26/stats_moments):
interleaved base vs repartition(n, key) for n in {16, 32, 64, 128}."""
import sys, time

sys.path.insert(0, "/root/repo")
from crest_spark.session import get_spark
from crest_spark.registry import load_all
from crest_spark.sources import tables as T

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(app_name="exp_fact_spread_w")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/lineitem.parquet").count()

_orig = T.load_table
_KEY = {"lineitem": "l_orderkey", "orders": "o_orderkey"}

import crest_spark.operators.relational as m_rel
import crest_spark.operators.subqueries as m_sub
import crest_spark.operators.stats as m_stats

MODS = [m_rel, m_sub, m_stats]
WIDTH = [None]


def spread_load(spark, sf_dir, name):
    df = _orig(spark, sf_dir, name)
    if name in _KEY and WIDTH[0]:
        if df.rdd.getNumPartitions() < WIDTH[0]:
            df = df.repartition(WIDTH[0], _KEY[name])
    return df


for m in MODS:
    m.load_table = spread_load


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


specs = load_all()
for name in ("q03_agg_pricing_summary", "q26_misc_aggs", "stats_moments"):
    fn = specs[name].fn
    res = {}
    for _ in range(REPS):
        for w in (None, 16, 32, 64, 128):
            WIDTH[0] = w
            res.setdefault(w, []).append(time_noop(fn(spark, SF)))
    print(
        f"{name}: "
        + "  ".join(f"{w or 'base'}={min(ts):.3f}" for w, ts in res.items())
    )
