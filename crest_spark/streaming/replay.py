"""Deterministic file-stream replay of a parquet table.

Models the reference's per-tick Flight batches
(``/root/reference/pkg/ingestor/ingestor.go:131-152``: a 500 ms ticker
re-reading a view) as the Spark-native equivalent: the table split into N
slice files in a staging dir, consumed by ``readStream`` with
``maxFilesPerTrigger=1`` — one slice per micro-batch, offsets checkpointed
(which is exactly the at-least-once defect fix called out in SURVEY §2.1 O5).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stage_slices(
    spark: SparkSession,
    source_parquet: str,
    n_slices: int = 8,
    order_col: str | None = None,
    dest: str | None = None,
    copies: int = 1,
) -> tuple[str, StructType]:
    """Write `source_parquet` as n_slices parquet files under a staging dir.

    Slicing is deterministic (hash of a stable column or range split on
    order_col). ``copies`` > 1 duplicates every slice (for dedup tests).
    Returns (staging_dir, schema). Idempotent per (source, n, copies).
    """
    # v2: staging-format version bump — v1 dirs predate mtime staggering
    key = hashlib.md5(
        f"v2|{source_parquet}|{n_slices}|{order_col}|{copies}".encode()
    ).hexdigest()[:12]
    dest = dest or os.path.join(tempfile.gettempdir(), f"crest_stage_{key}")
    from crest_spark.sources.tables import normalize_ns_timestamps

    df = normalize_ns_timestamps(spark.read.parquet(source_parquet))
    done_marker = os.path.join(dest, "_STAGED")
    if not os.path.exists(done_marker):
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest, exist_ok=True)
        if order_col is not None:
            sliced = df.repartitionByRange(n_slices, F.col(order_col))
        else:
            sliced = df.repartition(n_slices)
        if copies == 1:
            sliced.write.mode("append").parquet(dest)
        else:
            # plain subdir names (no '=': must NOT look like partition cols)
            for copy in range(copies):
                sliced.write.mode("append").parquet(os.path.join(dest, f"c{copy}"))
        _stagger_mtimes(dest)
        with open(done_marker, "w") as fh:
            fh.write("ok")
    return dest, df.schema


def _stagger_mtimes(dest: str) -> None:
    """Force strictly increasing mtimes on the slice files in (copy, part)
    order. One parquet job writes every slice with a single mtime, and
    Spark's FileStreamSource orders candidate files by modification time —
    identical stamps make the ``maxFilesPerTrigger=1`` replay order
    arbitrary, which broke the determinism this module promises (an
    ordered CDC replay saw batches out of event order). part-NNNNN names
    follow partition index, and ``repartitionByRange`` assigns ranges in
    ascending ``order_col`` order, so filename order IS event order."""
    files = []
    for root, _dirs, names in os.walk(dest):
        for n in sorted(names):
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    files.sort()  # (copy-subdir, part index) lexicographic = delivery order
    now = int(time.time())
    for i, f in enumerate(files):
        # whole-second spacing (> any FS/stream-source timestamp granularity),
        # all stamps in the past so no source ever considers them "not yet"
        ts = now - (len(files) - i)
        os.utime(f, (ts, ts))


def read_stream(
    spark: SparkSession, staging_dir: str, schema: StructType, files_per_trigger: int = 1
) -> DataFrame:
    """Streaming DataFrame over a staged slice dir, one file per trigger."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(staging_dir)
    )


def replay_shuffle_partitions(spark: SparkSession, staging_dir: str) -> int:
    """Scale-adaptive stateful-shuffle width for a bounded replay.

    Stateful streaming ignores AQE partition coalescing, and EVERY
    shuffle partition of EVERY stateful operator is a state-store
    instance (RocksDB here) that is opened, updated and committed on
    EVERY micro-batch — a replay whose whole state is a few MB still
    pays (partitions x stateful-ops x batches) store commits at the
    session's static width. Size the width to the replayed bytes
    (~32 MB of input per partition — the guide's fewer-larger-partitions
    rule applied to state), floor 4 so multi-core draining and
    cross-partition semantics stay exercised, and NEVER exceed the
    session's configured width: at production state volumes the
    configured cluster value is authoritative and this helper is a
    no-op. Results are partition-count-invariant (keyed dedup/aggs/
    joins); measured on the S4 dedup replay at sf0.01: 12.7-21.6 s at
    64 partitions -> 3.0-3.4 s at 4 (oracle-identical rows)."""
    total = 0
    for root, _dirs, files in os.walk(staging_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    configured = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(4, min(configured, -(-total // (32 << 20))))


def run_to_memory(
    streaming_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    staging_dir: str | None = None,
) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) into a
    memory sink; returns the final result as a batch DataFrame.

    ``staging_dir``: when the stream replays a bounded staged slice dir,
    pass it so the drain runs at ``replay_shuffle_partitions`` width
    (see its docstring); the session's configured width is restored
    after the drain, so only the streaming query's state layout — never
    the surrounding batch plans — is resized."""
    spark = streaming_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key, None)
    resized = None
    if staging_dir is not None:
        resized = replay_shuffle_partitions(spark, staging_dir)
        spark.conf.set(key, str(resized))
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if resized is not None and old is not None:
            spark.conf.set(key, old)
    return spark.table(query_name)
