"""File-format source/sink surface.

Reference sinks: Parquet-with-snappy (``batch_writer.go:159-197``) and
Arrow IPC (``batch_writer.go:200-222``). Spark-native equivalents plus
the other built-in columnar/row formats (ORC, CSV, JSON) so the engine
covers the usual lakehouse interchange set.

Arrow IPC has no built-in distributed Spark sink; the implementation here
uses ``mapInArrow`` so each partition serializes its own Arrow record
batches to one IPC stream file — distributed, no driver collect, the
shape of the reference's per-batch writer.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from crest_spark.functions.schema_convert import spark_schema_to_arrow


def write_parquet(df: DataFrame, path: str, compression: str = "snappy") -> None:
    df.write.mode("overwrite").option("compression", compression).parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_any(spark: SparkSession, path: str, fmt: str, schema=None):
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", schema is None).csv(path)
    return getattr(reader, fmt)(path)


def write_arrow_ipc(df: DataFrame, path: str) -> None:
    """Distributed Arrow IPC sink: one IPC stream file per partition,
    written by the executor that owns the partition (mapInArrow — data
    stays Arrow end-to-end, mirroring the reference's writeArrow)."""
    os.makedirs(path, exist_ok=True)
    schema = spark_schema_to_arrow(df.schema)

    def write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        batches = list(batches)
        if batches:
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
            with pa.OSFile(fname, "wb") as sink:
                with pa.ipc.new_stream(sink, batches[0].schema) as writer:
                    for b in batches:
                        writer.write_batch(b)
        # empty downstream: this is a sink
        empty = pa.RecordBatch.from_pylist([], schema=pa.schema([pa.field("_n", pa.int64())]))
        yield empty

    df.mapInArrow(write_partition, "_n long").count()


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC source: files -> pyarrow Table -> DataFrame (Arrow-backed
    createDataFrame; for very large inputs, convert per-file into a
    parquet staging area instead)."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )
    tables = []
    for f in files:
        with pa.OSFile(f, "rb") as src:
            with pa.ipc.open_stream(src) as reader:
                tables.append(reader.read_all())
    table = pa.concat_tables(tables)
    return spark.createDataFrame(table.to_pandas())
