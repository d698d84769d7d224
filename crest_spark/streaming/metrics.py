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


# --- commit-contention counters (driver-process-local) -----------------
#
# Optimistic lakehouse commits (Table.merge / Table.compact / overwrite)
# retry on CommitConflict; at scale, sustained contention on a hot table
# is an operational signal (mis-partitioned writers, too-frequent
# compaction) that must be observable, not silently absorbed by the
# retry loop. Counters are keyed by (namespace.table, op); read them via
# ``commit_conflict_counts()`` or stream them into the same JSONL file.

_COMMIT_CONFLICTS: dict[tuple[str, str], int] = {}
_CONFLICT_JSONL: str | None = None


def record_commit_conflict(table: str, op: str) -> None:
    """Called by the lakehouse retry loops each time a commit loses the
    optimistic race and is about to re-read + re-derive."""
    key = (table, op)
    _COMMIT_CONFLICTS[key] = _COMMIT_CONFLICTS.get(key, 0) + 1
    if _CONFLICT_JSONL is not None:
        with open(_CONFLICT_JSONL, "a") as fh:
            fh.write(
                json.dumps(
                    {
                        "event": "commit_conflict",
                        "table": table,
                        "op": op,
                        "total": _COMMIT_CONFLICTS[key],
                    }
                )
                + "\n"
            )


def commit_conflict_counts() -> dict[tuple[str, str], int]:
    return dict(_COMMIT_CONFLICTS)


def stream_commit_conflicts(out_path: str | None) -> None:
    """Also append each conflict event to ``out_path`` (None disables)."""
    global _CONFLICT_JSONL
    _CONFLICT_JSONL = out_path
