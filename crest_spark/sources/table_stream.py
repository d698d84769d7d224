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
  ``LakehouseTable.read_changes``' contract;
- ``option("readChangeFeed", "true")`` streams the CHANGE FEED instead
  (Delta's streaming CDF): appended rows arrive as
  ``_change_type='insert'`` and merge/delete commits made with
  ``change_feed=True`` contribute their staged retractions/additions
  instead of failing the stream.

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
    def __init__(self, path: str, kind: str = "ins", version: int = 0):
        self.path = path
        # "ins": appended data file (rows surface as _change_type=insert
        # under readChangeFeed); "chg": staged change file (rows already
        # carry their _change_type)
        self.kind = kind
        self.version = version  # commit version (readChangeFeed column)


class CrestTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType | None = None):
        self.log = _log_path(
            options["warehouse"], options.get("namespace", "default"), options["table"]
        )
        self.starting_version = options.get("startingversion")
        self.cdf = str(options.get("readchangefeed", "")).lower() == "true"
        # declared output column order: the Arrow bridge maps batches to
        # the schema BY POSITION, and files from different commits can
        # disagree on order (a merge's anti-join rotates the key column
        # to the front) — every batch is therefore re-selected by NAME
        self.names = [f.name for f in schema.fields] if schema else None

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
        parts: list[_FilePartition] = []
        for v in _versions(self.log):
            if not (start["version"] < v <= end["version"]):
                continue
            d = _commit(self.log, v)
            if d.get("operation") == "rowdelta" or d.get("extra", {}).get(
                "deletes"
            ):
                dextra = d.get("extra", {})
                if self.cdf and dextra.get("change_files") is not None:
                    # a merge-on-read commit that staged its change set
                    # (merge/delete with change_feed=True) streams like
                    # any other CDF commit: the staged rows express the
                    # delta's retractions + additions
                    parts.extend(
                        _FilePartition(f, "chg", v)
                        for f in dextra["change_files"]
                    )
                    continue
                raise ValueError(
                    f"crest_table stream hit a merge-on-read commit at "
                    f"version {v}: its deletes are not a file delta; "
                    "compact() the table and restart from a full read"
                    + (
                        " (or commit MoR merges with change_feed=True to "
                        "stage streamable change sets)"
                        if self.cdf
                        else ""
                    )
                )
            if d.get("operation") == "replace":
                dextra = d.get("extra", {})
                if dextra.get("compaction"):
                    continue  # rowset-preserving: empty delta
                if self.cdf and dextra.get("change_files") is not None:
                    parts.extend(
                        _FilePartition(f, "chg", v)
                        for f in dextra["change_files"]
                    )
                    continue
                raise ValueError(
                    f"crest_table stream hit a non-compaction replace at "
                    f"version {v}; restart the stream from a full read"
                )
            parts.extend(_FilePartition(f, "ins", v) for f in d["files"])
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator:  # executor-side
        if not partition.path or not os.path.exists(partition.path):
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        is_chg = getattr(partition, "kind", "ins") == "chg"
        data_names = None
        if self.names is not None:
            data_names = [
                n
                for n in self.names
                if n not in ("_change_type", "_commit_version")
            ]
            if is_chg:
                data_names.append("_change_type")
        for batch in pq.ParquetFile(partition.path).iter_batches():
            if data_names is not None:
                missing = [n for n in data_names if n not in batch.schema.names]
                if missing:
                    raise ValueError(
                        f"{partition.path} lacks columns {missing}; restart "
                        "the stream to pick up the evolved schema"
                    )
                if batch.schema.names != data_names:
                    batch = batch.select(data_names)
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
            if target != batch.schema:
                batch = batch.cast(target)
            if self.cdf:
                cols = list(batch.columns)
                sch = batch.schema
                if not is_chg:
                    # appended rows surface as inserts; change files
                    # already carry their _change_type
                    cols.append(
                        pa.array(["insert"] * batch.num_rows, pa.string())
                    )
                    sch = sch.append(pa.field("_change_type", pa.string()))
                ver = getattr(partition, "version", 0)
                cols.append(
                    pa.array([ver] * batch.num_rows, pa.int64())
                )
                sch = sch.append(pa.field("_commit_version", pa.int64()))
                batch = pa.RecordBatch.from_arrays(cols, schema=sch)
            yield batch

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
        schema = StructType.fromJson(json.loads(_commit(log, vs[-1])["schema"]))
        if str(self.options.get("readchangefeed", "")).lower() == "true":
            from pyspark.sql.types import LongType, StringType, StructField

            schema = StructType(
                schema.fields
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return schema

    def streamReader(self, schema: StructType) -> CrestTableStreamReader:
        return CrestTableStreamReader(self.options, schema)


def register_table_stream(spark) -> None:
    """Register the ``crest_table`` streaming format on this session.

    Pickle-by-value is REQUIRED: the class is unpickled in dedicated
    Python workers that can't import this package (no sys.path / pyFiles
    propagation there)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(CrestTableDataSource)
