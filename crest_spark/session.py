"""SparkSession factory.

Defaults are chosen for the 100 TB posture and stay valid on ``local[*]``:

- **AQE on** (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch) — replaces hand-tuned shuffle partition counts when
  data volume per stage varies by orders of magnitude.
- **Arrow on** for every pandas interchange path (pandas UDF, mapInPandas) —
  the reference pipeline is Arrow end-to-end
  (``/root/reference/pkg/ingestor/flight_reader.go:189-212``); on Spark the
  equivalent is vectorized Arrow transfer for the Python worker boundary.
- **Snappy parquet** — mirrors the reference's writer choice
  (``/root/reference/pkg/ingestor/batch_writer.go:169``) and is the
  scan-speed/size sweet spot at scale.
- **UTC session timezone** — deterministic timestamp semantics regardless of
  host TZ; required for oracle comparability.
- **shuffle.partitions** is CORE-DERIVED (2 per core, floor 16 — see
  ``_default_shuffle_partitions``), never a machine-shape constant; on a
  real cluster AQE coalesces from a deliberately high initial number, so we
  also set ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def _default_shuffle_partitions() -> str:
    """Core-derived shuffle width: 2 tasks per core, floor 16.

    A constant width is tuned for exactly one machine shape — the r14
    optimization round measured the old constant 64 at 1.21x the
    core-derived width on an 8-core master (interleaved A/B over 12
    bench entries, TOTAL 26.7 s -> 22.0 s: four waves of tiny tasks per
    shuffle collapsed to two). At 32 cores the formula yields the same
    64 the bench has always run with, so cross-round numbers stay
    comparable; on a cluster pass the real value via ``extra_conf`` or
    spark-submit conf (``extra_conf`` overrides these defaults), and
    AQE coalescing still right-sizes each stage downward from whatever
    the initial width is."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    try:
        n = int(cpus)
    except ValueError:
        n = os.cpu_count() or 8
    return str(max(2 * n, 16))


_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Read parquet TIMESTAMP (isAdjustedToUTC=false) as session-tz TIMESTAMP,
    # matching DuckDB's naive-timestamp reading under a UTC session.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Spark 4.1 cannot read parquet TIMESTAMP(NANOS) as a timestamp type at
    # all (PARQUET_TYPE_ILLEGAL); read as raw nanos and normalize in the
    # loader (sources.tables.normalize_ns_timestamps).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 10 MB default is conservative; dims at 100 TB scale are still small.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": _default_shuffle_partitions(),
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": (
        _default_shuffle_partitions()
    ),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(
    app_name: str = "crest-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the env
    var is unset). On a cluster, pass ``master=None`` with
    ``SPARK_GRAFT_MASTER`` set, or rely on spark-submit's configuration.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
