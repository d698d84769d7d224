"""Streaming metrics -> JSONL files.

Implements for real what the reference only parses config for
(``/root/reference/pkg/config/config.go:53-57``; no metrics code exists in
``pkg/``): per-micro-batch progress (rows/sec, batch duration, state rows)
captured via StreamingQueryListener and appended to a JSONL file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    def __init__(self, out_path: str):
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def _write(self, record: dict) -> None:
        with open(self.out_path, "a") as fh:
            fh.write(json.dumps(record) + "\n")

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "name": p.name,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:
        pass


def attach(spark: SparkSession, out_path: str) -> JsonlMetricsListener:
    listener = JsonlMetricsListener(out_path)
    spark.streams.addListener(listener)
    return listener
