"""Hive-style partitioned layout + partition pruning: a date-partitioned
events table filtered to one day must scan ONLY that partition (the
dominant IO-elimination mechanism for time-series data at 100 TB)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crest_spark.plans.checks import formatted_plan
from crest_spark.sources.tables import load_table


@pytest.fixture()
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part_events") / "events_by_day")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    events.write.partitionBy("event_date").mode("overwrite").parquet(out)
    return out, events


def test_partition_pruning_single_day(spark, partitioned_events):
    out, events = partitioned_events
    df = spark.read.parquet(out).where(F.col("event_date") == "2024-01-02")
    plan = formatted_plan(df)
    # the partition filter must appear as a PartitionFilter (metadata-only
    # pruning), NOT as a data filter evaluated per row
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = events.where(F.to_date("ts") == "2024-01-02").count()
    assert df.count() == expected
    assert expected > 0


def test_partition_pruning_range(spark, partitioned_events):
    out, events = partitioned_events
    df = spark.read.parquet(out).where(
        F.col("event_date").between("2024-01-02", "2024-01-04")
    )
    expected = events.where(
        F.to_date("ts").between("2024-01-02", "2024-01-04")
    ).count()
    assert df.count() == expected
    # pruned scan: number of files read tracks the 3 selected partitions
    scan_files = df.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(out).select(F.input_file_name()).distinct().count()
    assert scan_files < all_files
