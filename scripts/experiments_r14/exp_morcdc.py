"""Phase profile of mv_mor_cdc_fold (body replicated with timers)."""
import sys, time, tempfile

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.lakehouse.catalog import LakehouseCatalog
from crest_spark.lakehouse.matview import IncrementalAggView, AggSpec

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark(app_name="exp_morcdc")
spark.range(1).count()  # warm

for rep in range(REPS):
    t0 = time.time()
    marks = [("start", t0)]

    def mark(name):
        marks.append((name, time.time()))

    events = load_table(spark, SF, "events").select(
        "event_id", "event_type", "value"
    )
    cat = LakehouseCatalog(tempfile.mkdtemp(prefix="crest_morcdc_x_"))
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
    mark("setup")
    src.append(events.where(F.col("event_id") % 2 == 0))
    mark("append")
    view.refresh(spark)
    mark("refresh1")
    src.merge(
        spark,
        events.withColumn("value", F.col("value") + 5.0),
        key="event_id",
        change_feed=True,
        strategy="mor",
    )
    mark("merge_mor")
    view.refresh(spark)
    mark("refresh2")
    src.delete(spark, {"event_id": (None, 100)}, change_feed=True)
    mark("delete")
    view.refresh(spark)
    mark("refresh3")
    out = (
        view.read(spark)
        .where(F.col("n_events") > 0)
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr("CAST(ROUND(sum_value_dec, 4) AS DOUBLE)").alias(
                "sum_value"
            ),
        )
        .orderBy("event_type")
    )
    out.write.format("noop").mode("overwrite").save()
    mark("read_sink")
    prev = t0
    print(f"--- rep {rep}  total {marks[-1][1]-t0:.2f}s")
    for name, ts in marks[1:]:
        print(f"  {name:10s} {ts-prev:6.2f}")
        prev = ts

spark.stop()
