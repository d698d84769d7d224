"""Bucketed-table support: pre-shuffled persistent layout for co-located
joins and aggregations.

At 100 TB the dominant cost of repeated fact-fact joins is re-shuffling
the same table on the same key every query. Bucketing pays that shuffle
once at write time: both sides bucketed on the join key into the same
bucket count join with ZERO exchanges (asserted in
tests/test_bucketing.py). This is the Spark-native analogue of the
co-location the reference delegates to its upstream system's
materialized-view partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the Sort before a
    sort-merge join and enables efficient range scans within buckets.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
