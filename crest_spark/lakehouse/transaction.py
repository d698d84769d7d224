"""Multi-table append transactions over the warehouse catalog.

The fan-out ingest shape — one ETL step writing a fact table, its
quarantine table, and a metrics rollup — needs all-or-nothing visibility
across N tables. Iceberg gets this from a REST catalog's database
transaction (CommitTransaction); this warehouse has no central pointer
store, so the same guarantee is built from pieces the commit log already
has:

1. **Prepare**: every ``txn.append`` lands as a write-audit-publish
   STAGED commit on its table — durable, replay-idempotent (writer/batch
   ids recorded at stage time), and invisible to every reader.
2. **Decide**: ``commit()`` writes ONE journal record
   (``<warehouse>/_txns/txn-<id>.json``, tmp+rename atomic) listing every
   (table, staged-version). The rename is the commit point.
3. **Publish**: each table's staged commits are published (one
   metadata-only commit per table). A crash mid-publish is ROLLED
   FORWARD: ``recover_transactions`` (called by ``Transaction`` creation
   and safe to run anytime) re-publishes whatever a journaled
   transaction had not yet published, then retires the journal.

Guarantee, stated precisely: ISOLATION is exact (no reader sees any of
the transaction's rows before the commit point); ATOMICITY is durable
roll-forward (after the journal rename the transaction WILL complete,
crash or not; the publish loop is the only window where table A can be
visible before table B, it is metadata-only fast, and recovery closes
it). A transaction that aborts — explicitly or by crashing before the
journal rename — publishes nothing; its staged commits are discarded by
``abort()`` (presumed-abort: an unjournaled staged commit belongs to no
committed transaction and is safely discardable).

This is the Nessie/REST-catalog role re-expressed on a pointer-free
commit log; the reference's committer has no transaction concept at all
(one blind append per batch, ``pkg/batch_writer.go``).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from crest_spark.lakehouse.table import LakehouseTable, StagedVersionsGone


def _txn_dir(warehouse: str) -> str:
    return os.path.join(warehouse, "_txns")


def _publish_surviving(
    table: LakehouseTable,
    svs: list[int],
    spark: SparkSession | None = None,
) -> int | None:
    """Publish whichever of ``svs`` are STILL pending, tolerating a
    concurrent publisher (another commit() or recovery run racing on the
    same journal): versions already published by the racer are success,
    not failure — re-filter against fresh pending state and retry until
    the set is empty or published. Returns the publish version, or None
    when the racer got everything first (the rows are visible either
    way, which is the only guarantee a caller holds).

    Retries ONLY on ``StagedVersionsGone`` — the racer signature. Any
    other failure (a late-added CHECK constraint the staged rows
    violate, no SparkSession to validate it with) propagates
    immediately: looping on it would rerun a full read-back scan 50
    times and then mask the real violation behind a generic error
    (ADVICE r8 #1). ``spark`` is threaded to ``publish_staged`` so
    late-constraint validation works even without an active session."""
    for _ in range(50):
        pending = set(table.pending_staged())
        todo = [v for v in svs if v in pending]
        if not todo:
            return None
        try:
            return table.publish_staged(todo, spark=spark)
        except StagedVersionsGone:
            continue  # racer published some of todo between read & commit
    raise RuntimeError(
        f"could not publish staged versions {svs} of "
        f"{table.namespace}.{table.name}"
    )


def recover_transactions(
    catalog, spark: SparkSession | None = None
) -> list[str]:
    """Roll forward every journaled-but-unfinished transaction: publish
    the staged versions each journal lists that are still pending, then
    retire the journal. Idempotent and crash-safe (re-crashing during
    recovery just re-runs it); a racing recovery/commit on one journal
    is contained per-journal, so it cannot block the other journals.
    A journal whose staged rows now violate a late-added constraint is
    left on disk after ONE validation attempt (not a 50× retry loop) —
    drop the constraint or discard the staged entries, and the next
    recovery retires it. Returns the retired journal ids."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    tdir = _txn_dir(catalog.warehouse)
    if not os.path.isdir(tdir):
        return []
    done: list[str] = []
    for fn in sorted(os.listdir(tdir)):
        if not (fn.startswith("txn-") and fn.endswith(".json")):
            continue
        path = os.path.join(tdir, fn)
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue  # torn tmp never renamed; not a committed txn
        try:
            for op in rec.get("ops", []):
                t = catalog.table(op["table"], op["namespace"])
                _publish_surviving(t, list(op["staged"]), spark=spark)
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass  # racer retired it; the publishes are done either way
            done.append(fn[: -len(".json")])
        except Exception:
            # one journal's race/failure must not leave later journals
            # unrecovered; this one stays on disk for the next run
            continue
    return done


class Transaction:
    """Accumulates staged appends across tables; publishes atomically.

    Use via ``catalog.transaction()`` as a context manager: the block's
    appends stage invisibly; a clean exit commits (journal rename =
    commit point, then publish-all); an exception aborts and discards
    every staged commit. ``writer_id``/``batch_id`` pass through to the
    staged commits, so a replayed transactional micro-batch stays
    exactly-once end to end."""

    def __init__(self, catalog):
        self.catalog = catalog
        # recovery first: a crashed predecessor's journal must finish
        # before new work interleaves with its tables
        recover_transactions(catalog)
        self._ops: list[tuple[LakehouseTable, int]] = []
        self._spark: SparkSession | None = None  # captured from appends,
        # threaded to publish so late-added constraints can validate
        self._done = False

    def append(
        self,
        name: str,
        df: DataFrame,
        namespace: str | None = None,
        **append_kwargs,
    ) -> int | None:
        """Stage an append to ``namespace.name`` (auto-creating the
        table with the batch's schema). Returns the staged version, or
        None when (writer_id, batch_id) was already committed."""
        if self._done:
            raise ValueError("transaction already committed or aborted")
        t = self.catalog.get_or_create_table(
            name, df.schema, namespace=namespace
        )
        self._spark = df.sparkSession
        sv = t.append(df, stage=True, **append_kwargs)
        if sv is not None:
            self._ops.append((t, sv))
        return sv

    def commit(self) -> dict[str, int | None]:
        """Write the journal (the atomic commit point), publish every
        table's staged commits, retire the journal. Returns
        {\"ns.table\": published version}."""
        if self._done:
            raise ValueError("transaction already committed or aborted")
        self._done = True
        if not self._ops:
            return {}
        tdir = _txn_dir(self.catalog.warehouse)
        os.makedirs(tdir, exist_ok=True)
        txn_id = uuid.uuid4().hex
        by_table: dict[tuple[str, str], list[int]] = {}
        for t, sv in self._ops:
            by_table.setdefault((t.namespace, t.name), []).append(sv)
        rec = {
            "txn_id": txn_id,
            "commit_ts": time.time(),
            "ops": [
                {"namespace": ns, "table": name, "staged": svs}
                for (ns, name), svs in by_table.items()
            ],
        }
        tmp = os.path.join(tdir, f".tmp-{txn_id}.json")
        final = os.path.join(tdir, f"txn-{txn_id}.json")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, final)  # <- the commit point
        out: dict[str, int | None] = {}
        for (ns, name), svs in by_table.items():
            t = self.catalog.table(name, ns)
            # a concurrent recover_transactions may have found the
            # journal and published some/all of these already — that is
            # this transaction SUCCEEDING, not a failure
            out[f"{ns}.{name}"] = _publish_surviving(
                t, svs, spark=self._spark
            )
        try:
            os.unlink(final)
        except FileNotFoundError:
            pass  # the racing recovery retired the journal
        return out

    def abort(self) -> None:
        """Discard every staged commit; nothing becomes visible."""
        if self._done:
            return
        self._done = True
        for t, sv in self._ops:
            try:
                t.discard_staged([sv])
            except ValueError:
                pass  # already resolved (e.g. double abort)

    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self.abort()
        return False
