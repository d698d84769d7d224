"""r15: job-count + wall-time profile of the slowest remaining bench
entries — how many Spark jobs does one noop-sink evaluation launch?
High job counts on sub-2s entries mean driver-action/lifecycle floors,
not data volume."""
import sys, time

sys.path.insert(0, "/root/repo")
from crest_spark.session import get_spark
from crest_spark.registry import load_all

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ENTRIES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "lake_index_rebuild_roundtrip",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "dedup_minhash_lsh",
    "lake_batch_point_lookup",
    "lake_tail_compaction_lookup",
    "curation_dsir_weights",
    "dedup_containment_capped",
    "q17_json_extract",
]

spark = get_spark(app_name="exp_job_counts")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
st = sc.statusTracker()
spark.read.parquet(SF + "/lineitem.parquet").count()
spark.range(128, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

specs = load_all()
for name in ENTRIES:
    for rep in range(2):
        tag = f"jc_{name}_{rep}"
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        specs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        print(f"{name:32s} rep{rep} jobs={len(st.getJobIdsForGroup(tag)):3d} {dt:.2f}s")
