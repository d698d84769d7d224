"""r15 VERDICT #6: job-count profile of mv_mor_cdc_fold's lifecycle.
Each phase runs under its own job group so the status tracker attributes
every Spark job; wall time per phase alongside."""
import sys, time, tempfile

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.lakehouse.catalog import LakehouseCatalog
from crest_spark.lakehouse.matview import IncrementalAggView, AggSpec

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark(app_name="exp_morcdc_jobs")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
st = sc.statusTracker()
spark.range(1).count()

for rep in range(REPS):
    events = load_table(spark, SF, "events").select(
        "event_id", "event_type", "value"
    )
    cat = LakehouseCatalog(tempfile.mkdtemp(prefix="crest_morcdc_j_"))
    src = cat.get_or_create_table("events_morcdc", events.schema)
    view = IncrementalAggView(
        cat,
        source="events_morcdc",
        name="events_morcdc_agg",
        group_by=["event_type"],
        aggs={
            "n_events": AggSpec("count"),
            "sum_value_dec": AggSpec("sum", "value_dec"),
        },
        derived_cols={"value_dec": "CAST(value AS DECIMAL(30,8))"},
    )

    def phase(tag, fn):
        sc.setJobGroup(f"ph_{rep}_{tag}", tag)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        n = len(st.getJobIdsForGroup(f"ph_{rep}_{tag}"))
        print(f"  {tag:14s} jobs={n:3d}  {dt:.2f}s")
        sc.setJobGroup(None, None)

    print(f"rep {rep}:")
    phase("append", lambda: src.append(events.where(F.col("event_id") % 2 == 0)))
    phase("refresh1", lambda: view.refresh(spark))
    phase(
        "merge_mor_cdf",
        lambda: src.merge(
            spark,
            events.withColumn("value", F.col("value") + 5.0),
            key="event_id",
            change_feed=True,
            strategy="mor",
        ),
    )
    phase("refresh2", lambda: view.refresh(spark))
    phase(
        "delete_cdf",
        lambda: src.delete(spark, {"event_id": (None, 100)}, change_feed=True),
    )
    phase("refresh3", lambda: view.refresh(spark))
    phase("read_out", lambda: view.read(spark).collect())
