"""r15 VERDICT #6 follow-up: does the incremental view's refresh cost
grow with the number of PENDING MoR deltas it folds across? If yes, a
tighter (delta-count) auto-compaction trigger could cut fold jobs; if
the per-refresh job count is flat in delta depth, the trigger only adds
a rewrite. N MoR CDF merges (disjoint hot-key slices), ONE refresh."""
import sys, time, tempfile

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.lakehouse.catalog import LakehouseCatalog
from crest_spark.lakehouse.matview import IncrementalAggView, AggSpec

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark(app_name="exp_morcdc_depth")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
st = sc.statusTracker()
spark.range(1).count()

for depth in (1, 2, 4, 8):
    events = load_table(spark, SF, "events").select(
        "event_id", "event_type", "value"
    )
    cat = LakehouseCatalog(tempfile.mkdtemp(prefix="crest_morcdc_d_"))
    src = cat.get_or_create_table("ev", events.schema)
    view = IncrementalAggView(
        cat,
        source="ev",
        name="ev_agg",
        group_by=["event_type"],
        aggs={
            "n_events": AggSpec("count"),
            "sum_value_dec": AggSpec("sum", "value_dec"),
        },
        derived_cols={"value_dec": "CAST(value AS DECIMAL(30,8))"},
    )
    src.append(events)
    view.refresh(spark)
    for i in range(depth):
        src.merge(
            spark,
            events.where(F.col("event_id") % depth == i).withColumn(
                "value", F.col("value") + 5.0
            ),
            key="event_id",
            change_feed=True,
            strategy="mor",
        )
    n_pending = len(src._state()["deletes"])
    tag = f"refresh_d{depth}"
    sc.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    view.refresh(spark)
    dt = time.perf_counter() - t0
    print(
        f"depth={depth} pending_deltas={n_pending} "
        f"refresh jobs={len(st.getJobIdsForGroup(tag))} {dt:.2f}s"
    )
    sc.setJobGroup(None, None)
