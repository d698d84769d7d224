"""Lakehouse table as a streaming source (Spark 4 Python Data Source).

``spark.readStream.format("crest_table").option("warehouse", ...)
.option("table", ...)`` tails a commit-log table: each micro-batch reads
exactly the files appended since the last checkpointed version — the
pull side of the reference's push pipeline, turning any ingested table
into a stream for downstream jobs (the Iceberg "table as a changelog"
pattern).

Mechanics (public Python Data Source API, SPARK-44076):
- offsets are commit versions (``{"version": N}``), checkpointed by the
  engine like any streaming source — restart-safe for free;
- ``partitions(start, end)`` lists the files appended in the version
  range (metadata-only: one commit-log listing);
- ``read(partition)`` runs on executors and yields Arrow batches
  straight from the parquet file — no row-by-row Python;
- rowset-preserving compactions are skipped (their delta is empty);
  a true overwrite in the range fails the stream, matching
  ``LakehouseTable.read_changes``' contract.

Process model constraint: the data-source class is UNPICKLED in
dedicated Python processes (a driver-side source runner for offsets, a
planner worker for schema) that see neither the driver's ``sys.path``
nor ``addPyFile`` includes. This module is therefore self-contained —
stdlib + pyspark only, re-implementing the tiny commit-log-tail reads
it needs instead of importing ``crest_spark.lakehouse`` — and
``register_table_stream`` registers it for cloudpickle
pickle-by-value so the class definition travels inside the pickle.

Register once per session: ``register_table_stream(spark)``.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

_LOG_DIR = "_log"


def _log_path(warehouse: str, namespace: str, table: str) -> str:
    return os.path.join(warehouse, namespace, table, _LOG_DIR)


def _versions(log: str) -> list[int]:
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def _commit(log: str, version: int) -> dict:
    with open(os.path.join(log, f"{version:020d}.json")) as fh:
        return json.load(fh)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CrestTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.log = _log_path(
            options["warehouse"], options.get("namespace", "default"), options["table"]
        )
        self.starting_version = options.get("startingversion")

    def initialOffset(self) -> dict:
        # default: start at the current version — a new stream consumes
        # appends from now on (the split Kafka sources make with
        # startingOffsets=latest; use a batch read for the snapshot).
        # option("startingVersion", N) instead begins the FIRST batch at
        # commit N+1, so consumers with their own watermark (e.g. an
        # incrementally-maintained view) catch up with no gap between a
        # batch backfill and the stream start. Checkpointed restarts
        # ignore it — the engine replans from its own offsets.
        if self.starting_version is not None:
            return {"version": int(self.starting_version)}
        vs = _versions(self.log)
        return {"version": vs[-1] if vs else 0}

    def latestOffset(self) -> dict:
        vs = _versions(self.log)
        return {"version": vs[-1] if vs else 0}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files: list[str] = []
        for v in _versions(self.log):
            if not (start["version"] < v <= end["version"]):
                continue
            d = _commit(self.log, v)
            if d.get("operation") == "replace":
                if d.get("extra", {}).get("compaction"):
                    continue  # rowset-preserving: empty delta
                raise ValueError(
                    f"crest_table stream hit a non-compaction replace at "
                    f"version {v}; restart the stream from a full read"
                )
            files.extend(d["files"])
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator:  # executor-side
        if not partition.path or not os.path.exists(partition.path):
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in pq.ParquetFile(partition.path).iter_batches():
            # Spark writes timestamps as INT96 by default; pyarrow decodes
            # INT96 to timestamp[ns], which the Python data source Arrow
            # bridge rejects — cast nanos to the micros Spark expects
            fields = [
                pa.field(f.name, pa.timestamp("us", f.type.tz))
                if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
                else f
                for f in batch.schema
            ]
            target = pa.schema(fields)
            yield batch.cast(target) if target != batch.schema else batch

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint; nothing to clean


class CrestTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crest_table"

    def schema(self) -> StructType:
        log = _log_path(
            self.options["warehouse"],
            self.options.get("namespace", "default"),
            self.options["table"],
        )
        vs = _versions(log)
        if not vs:
            raise FileNotFoundError(f"no commit log at {log}")
        # every commit carries the full (possibly evolved) schema
        return StructType.fromJson(json.loads(_commit(log, vs[-1])["schema"]))

    def streamReader(self, schema: StructType) -> CrestTableStreamReader:
        return CrestTableStreamReader(self.options)


def register_table_stream(spark) -> None:
    """Register the ``crest_table`` streaming format on this session.

    Pickle-by-value is REQUIRED: the class is unpickled in dedicated
    Python workers that can't import this package (no sys.path / pyFiles
    propagation there)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(CrestTableDataSource)
