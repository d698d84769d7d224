"""r15 VERDICT #4: re-profile dedup_minhash_lsh at sf0.1 under the r14
width changes — which phase holds the 1.4s: signature, candidate mining
(window + bucket explode), or the verify join? Each phase timed as its
own cold-plan action (cumulative), min-of-k.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.registry import load_all
from crest_spark.operators.dedup import (
    _docs,
    with_shingles,
    minhash_band_rows,
    lsh_candidate_pairs,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(app_name="exp_minhash_prof")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(SF + "/documents.parquet").count()
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, "id long").count()


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


specs = load_all()
full_fn = specs["dedup_minhash_lsh"].fn

t_shingle, t_sig, t_cand, t_full = [], [], [], []
for _ in range(REPS):
    t_shingle.append(time_noop(with_shingles(_docs(spark, SF))))
    t_sig.append(time_noop(minhash_band_rows(with_shingles(_docs(spark, SF)))))
    t_cand.append(
        time_noop(
            lsh_candidate_pairs(minhash_band_rows(with_shingles(_docs(spark, SF))))
        )
    )
    t_full.append(time_noop(full_fn(spark, SF)))

bands = minhash_band_rows(with_shingles(_docs(spark, SF)))
cand = lsh_candidate_pairs(bands)
print(f"band rows: {bands.count()}, cand pairs: {cand.count()}")
for tag, ts in (
    ("shingle", t_shingle),
    ("sig (cum)", t_sig),
    ("cand (cum)", t_cand),
    ("full (cum)", t_full),
):
    print(f"{tag:12s} min {min(ts):.3f}s  {sorted(ts)}")
