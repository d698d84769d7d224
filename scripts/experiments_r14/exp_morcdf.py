"""Phase/job profile of lake_mor_cdf (body replicated with timers).

Wall times are only comparable on an idle box; Spark job counts are
exact regardless of contention.
"""
import sys, time, tempfile

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from crest_spark.session import get_spark
from crest_spark.sources.tables import load_table
from crest_spark.lakehouse.catalog import LakehouseCatalog

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark(app_name="exp_morcdf")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()  # warm
tracker = spark.sparkContext.statusTracker


def jobs():
    return len(tracker().getJobIdsForGroup(None) or [])


for rep in range(REPS):
    marks = [("start", time.time(), jobs())]

    def mark(name):
        marks.append((name, time.time(), jobs()))

    ev = load_table(spark, SF, "events").select(
        "event_id", "event_type", "value"
    )
    base = ev.withColumn("seq", F.lit(0).cast("long")).withColumn(
        "op_del", F.lit(False)
    )
    cat = LakehouseCatalog(tempfile.mkdtemp(prefix="crest_mor_cdf_x_"))
    t = cat.get_or_create_table("events_cdf", base.drop("op_del").schema)
    n = ev.count()
    t.append(
        base.drop("op_del"),
        cluster_by=["event_id"],
        max_rows_per_file=max(50, n // 8),
    )
    mark("append")
    original_files = set(t._state()["files"])
    w1 = ev.where(F.col("event_id") % 11 == 0).select(
        "event_id",
        F.lit("w1").alias("event_type"),
        (F.col("value") + 1000.0).alias("value"),
        F.lit(2).cast("long").alias("seq"),
        F.lit(False).alias("op_del"),
    )
    w2 = ev.where(F.col("event_id") % 13 == 0).select(
        "event_id",
        F.lit("w2").alias("event_type"),
        (F.col("value") + 2000.0).alias("value"),
        F.lit(1).cast("long").alias("seq"),
        F.lit(False).alias("op_del"),
    )
    tombs = ev.where(F.col("event_id") % 17 == 0).select(
        "event_id",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(3).cast("long").alias("seq"),
        F.lit(True).alias("op_del"),
    )
    inserts = ev.where(F.col("event_id") % 503 == 0).select(
        (F.col("event_id") + 20_000_000).alias("event_id"),
        F.lit("new").alias("event_type"),
        F.lit(-1.0).alias("value"),
        F.lit(3).cast("long").alias("seq"),
        F.lit(False).alias("op_del"),
    )
    for i, wave in enumerate((w1, w2, tombs.unionByName(inserts))):
        t.merge(
            spark,
            wave,
            key="event_id",
            sequence_col="seq",
            delete_col="op_del",
            change_feed=True,
            strategy="mor",
        )
        mark(f"merge{i+1}")
    state = t._state()
    assert set(state["files"]) >= original_files
    assert len(state["deletes"]) == 3
    ch = t.read_changes(spark, after=1, cdf=True)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    folded = (
        t.read(spark, version=1)
        .withColumn("__s", F.lit(1))
        .unionByName(
            ch.withColumn("__s", sign).drop("_change_type", "_commit_version")
        )
        .groupBy("event_id", "event_type", "value", "seq")
        .agg(F.sum("__s").alias("__n"))
        .where(F.col("__n") > 0)
        .drop("__n")
    )
    mark("fold_built")
    scan = t.read(spark)
    a = folded.exceptAll(scan).limit(1).count()
    mark("exceptall_1")
    b = scan.exceptAll(folded).limit(1).count()
    mark("exceptall_2")
    assert a == 0 and b == 0
    u = (
        folded.exceptAll(scan)
        .unionAll(scan.exceptAll(folded))
        .limit(1)
        .count()
    )
    mark("except_union")
    assert u == 0
    folded.orderBy("event_id").write.format("noop").mode("overwrite").save()
    mark("final_noop")

    prev_t, prev_j = marks[0][1], marks[0][2]
    print(f"--- rep {rep}")
    for name, ts, j in marks[1:]:
        print(f"  {name:14s} {ts - prev_t:6.2f}s  {j - prev_j:3d} jobs")
        prev_t, prev_j = ts, j
print("DONE")
