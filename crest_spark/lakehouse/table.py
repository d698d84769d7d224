"""Transactional commit-log parquet tables.

A self-contained lakehouse table format providing the reference's Iceberg
append-commit semantics (``/root/reference/pkg/ingestor/iceberg_committer.go:
122-147``: write file -> NewTransaction -> AddFiles -> Commit) without an
external catalog service, since no Iceberg runtime jar ships in this
environment. Same transactional model Iceberg/Delta use:

    <warehouse>/<namespace>/<table>/
        _log/00000000000000000001.json   one commit = one atomic log entry
        data/txn-<uuid>/part-*.parquet   files written BEFORE the commit

- **Atomic commit**: data files land first (invisible), then the commit
  record is os.rename'd into the next sequential version slot — rename is
  atomic on POSIX, and an existing target means a concurrent writer won:
  re-read and retry (optimistic concurrency).
- **Snapshot isolation**: readers list the log once and read exactly the
  files committed at that version (time travel via ``version=``).
- **Exactly-once streaming sink**: commits carry an optional
  ``(writer_id, batch_id)``; re-delivered foreachBatch batches are
  detected and skipped — upgrading the reference's at-least-once repoll
  (``ingestor.go:131-152``) + drop-on-error (``ingestor.go:167-170``).
- **Schema evolution**: append validates against the pinned schema;
  ``merge_schema=True`` widens the table schema with new nullable columns
  (the evolution the reference README promises at ``README.md:24`` but
  never implements).

At 100 TB the same protocol holds: the log is tiny JSON metadata; data
files go to object storage; listing cost is bounded by checkpointing the
log (compaction of old entries) — noted in docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_LOG_DIR = "_log"
_DATA_DIR = "data"
_VERSION_WIDTH = 20


class CommitConflict(Exception):
    """Another writer committed this version first (caller should retry)."""


@dataclass
class Snapshot:
    version: int
    files: list[str]
    schema_json: str
    operation: str
    commit_ts: float
    num_rows: int
    writer_id: str | None = None
    batch_id: int | None = None
    extra: dict = field(default_factory=dict)


class LakehouseTable:
    """Handle to one commit-log table."""

    def __init__(self, root: str, namespace: str, name: str):
        self.root = root
        self.namespace = namespace
        self.name = name
        self.path = os.path.join(root, namespace, name)
        self.log_path = os.path.join(self.path, _LOG_DIR)
        self.data_path = os.path.join(self.path, _DATA_DIR)

    # ------------------------------------------------------------------ log
    def _version_file(self, version: int) -> str:
        return os.path.join(self.log_path, f"{version:0{_VERSION_WIDTH}d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_path):
            return []
        out = []
        for f in os.listdir(self.log_path):
            if f.endswith(".json"):
                try:
                    out.append(int(f[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def snapshots(self, upto: int | None = None) -> list[Snapshot]:
        snaps = []
        for v in self.versions():
            if upto is not None and v > upto:
                break
            with open(self._version_file(v)) as fh:
                d = json.load(fh)
            snaps.append(
                Snapshot(
                    version=v,
                    files=d["files"],
                    schema_json=d["schema"],
                    operation=d.get("operation", "append"),
                    commit_ts=d.get("commit_ts", 0.0),
                    num_rows=d.get("num_rows", -1),
                    writer_id=d.get("writer_id"),
                    batch_id=d.get("batch_id"),
                    extra=d.get("extra", {}),
                )
            )
        return snaps

    def exists(self) -> bool:
        return bool(self.versions())

    def schema(self, version: int | None = None) -> StructType:
        snaps = self.snapshots(upto=version)
        if not snaps:
            raise FileNotFoundError(f"table {self.namespace}.{self.name} does not exist")
        return StructType.fromJson(json.loads(snaps[-1].schema_json))

    def committed_batches(self, writer_id: str) -> set[int]:
        return {
            s.batch_id
            for s in self.snapshots()
            if s.writer_id == writer_id and s.batch_id is not None
        }

    # --------------------------------------------------------------- commits
    def _try_commit(self, record: dict) -> int:
        os.makedirs(self.log_path, exist_ok=True)
        for _ in range(50):
            version = (self.versions() or [0])[-1] + 1
            tmp = os.path.join(self.log_path, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as fh:
                json.dump(record, fh)
            target = self._version_file(version)
            try:
                # atomic create-if-absent: link() fails if target exists
                os.link(tmp, target)
                os.unlink(tmp)
                return version
            except FileExistsError:
                os.unlink(tmp)
                continue  # concurrent writer won this version; retry
        raise CommitConflict(f"could not commit to {self.namespace}.{self.name}")

    def create(self, schema: StructType) -> None:
        """DDL: create the table with a pinned schema (no data)."""
        if self.exists():
            return
        self._try_commit(
            {
                "operation": "create",
                "files": [],
                "schema": json.dumps(schema.jsonValue()),
                "commit_ts": time.time(),
                "num_rows": 0,
            }
        )

    def _evolved_schema(self, current: StructType, incoming: StructType) -> StructType:
        names = {f.name for f in current.fields}
        added = [
            StructField(f.name, f.dataType, nullable=True)
            for f in incoming.fields
            if f.name not in names
        ]
        return StructType(list(current.fields) + added)

    def append(
        self,
        df: DataFrame,
        writer_id: str | None = None,
        batch_id: int | None = None,
        merge_schema: bool = False,
    ) -> int | None:
        """Transactional append. Returns the committed version, or None if
        this (writer_id, batch_id) was already committed (idempotent
        replay, the exactly-once path for foreachBatch)."""
        if writer_id is not None and batch_id is not None:
            if batch_id in self.committed_batches(writer_id):
                return None

        if self.exists():
            current = self.schema()
            incoming = df.schema
            cur_names = [f.name for f in current.fields]
            in_names = {f.name for f in incoming.fields}
            missing = [n for n in cur_names if n not in in_names]
            new_cols = [f for f in incoming.fields if f.name not in set(cur_names)]
            if new_cols and not merge_schema:
                raise ValueError(
                    f"schema mismatch appending to {self.namespace}.{self.name}: "
                    f"new columns {[f.name for f in new_cols]} (pass merge_schema=True)"
                )
            table_schema = (
                self._evolved_schema(current, incoming) if merge_schema else current
            )
            # align: fill absent table columns with NULLs, order canonically
            aligned = df
            for f in table_schema.fields:
                if f.name not in in_names:
                    aligned = aligned.withColumn(
                        f.name, F.lit(None).cast(f.dataType)
                    )
            df = aligned.select(*[f.name for f in table_schema.fields])
        else:
            table_schema = df.schema

        txn_dir = os.path.join(self.data_path, f"txn-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(txn_dir)
        files = sorted(
            os.path.join(txn_dir, f)
            for f in os.listdir(txn_dir)
            if f.endswith(".parquet")
        )
        num_rows = int(
            df.sparkSession.read.parquet(txn_dir).count()
        )
        return self._try_commit(
            {
                "operation": "append",
                "files": files,
                "schema": json.dumps(table_schema.jsonValue()),
                "commit_ts": time.time(),
                "num_rows": num_rows,
                "writer_id": writer_id,
                "batch_id": batch_id,
            }
        )

    # ----------------------------------------------------------------- reads
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: exactly the files committed at ``version`` (or
        latest). Later/concurrent commits are invisible to this scan."""
        snaps = self.snapshots(upto=version)
        if not snaps:
            raise FileNotFoundError(f"table {self.namespace}.{self.name} does not exist")
        schema = StructType.fromJson(json.loads(snaps[-1].schema_json))
        files = [f for s in snaps for f in s.files]
        if not files:
            return spark.createDataFrame([], schema)
        # mergeSchema handles pre-evolution files lacking newer columns
        return (
            spark.read.schema(schema)
            .option("mergeSchema", "false")
            .parquet(*files)
        )

    def row_count(self) -> int:
        return sum(max(s.num_rows, 0) for s in self.snapshots())
