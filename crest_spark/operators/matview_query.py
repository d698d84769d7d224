"""Driver-checkable incremental-materialized-view query.

Builds a THROWAWAY warehouse, ingests the events table in three
micro-batch slices, incrementally refreshes an hourly continuous
aggregate after each, and returns the final view — which the oracle
checks against a one-shot SQL rollup of the same events. This puts the
maintenance path itself (delta aggregation + pruned state merge +
watermark commit) under the driver's rows/schema/hash gate, not just
under pytest.

Reference parity: this IS the architecture of crest's upstream — a
continuously-maintained aggregate view feeding a lakehouse table
(`/root/reference/README.md:13`, ingest loop `pkg/ingestor/
ingestor.go:131-152`) — except maintained natively instead of
delegated to RisingWave.

The sum state is carried as DECIMAL(30,8), not DOUBLE: incremental
maintenance adds partials in refresh order, and a double accumulator
would drift from the oracle's single-pass sum; decimal addition is
exact and order-free, so the view is bit-identical to recomputation.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.lakehouse.catalog import LakehouseCatalog
from crest_spark.lakehouse.matview import AggSpec, IncrementalAggView
from crest_spark.registry import register
from crest_spark.sources.tables import load_table


@register(
    "mv_hourly_rollup",
    oracle="""
        SELECT event_type,
               CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT)
                   AS bucket_s,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("lakehouse", "matview", "timeseries"),
)
def mv_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly continuous aggregate maintained INCREMENTALLY over three
    ingestion waves; result must equal the one-shot rollup exactly."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts"
    )
    cat = LakehouseCatalog(tempfile.mkdtemp(prefix="crest_mv_"))
    src = cat.get_or_create_table("events_src", events.schema)
    view = IncrementalAggView(
        cat,
        source="events_src",
        name="events_hourly",
        group_by=["event_type", "bucket"],
        aggs={
            "n_events": AggSpec("count"),
            "sum_value_dec": AggSpec("sum", "value_dec"),
        },
        derived_cols={
            "bucket": "date_trunc('hour', ts)",
            "value_dec": "CAST(value AS DECIMAL(30,8))",
        },
    )
    for wave in range(3):
        src.append(events.where(F.col("event_id") % 3 == wave))
        view.refresh(spark)
    return (
        view.read(spark)
        .select(
            "event_type",
            F.unix_timestamp("bucket").cast("bigint").alias("bucket_s"),
            F.col("n_events").cast("long").alias("n_events"),
            F.expr("CAST(ROUND(sum_value_dec, 4) AS DOUBLE)").alias(
                "sum_value"
            ),
        )
        .orderBy("event_type", "bucket_s")
    )
