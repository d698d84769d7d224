"""Warehouse-level catalog over commit-log tables.

Parity with the reference's catalog surface
(``/root/reference/pkg/ingestor/iceberg_committer.go:40-119``): namespace
DDL (best-effort create), get-or-create table keyed by name with the
schema pinned by the first writer, plus listing — the same contract
``GetOrCreateTable``/``createTable`` provide against Lakekeeper, minus the
REST hop (the warehouse dir is the catalog root; swapping in an Iceberg
REST catalog later only changes this module).

Reserved-namespace convention (since r11; migration note for earlier
warehouses): underscore-prefixed namespace names are reserved for engine
scratch dirs (e.g. the curation recipe's ``_curate_stage``), the same
convention Iceberg/Hive use for metadata dirs. ``create_namespace``
rejects them and ``list_namespaces`` hides them from discovery, but
EXPLICIT addressing still works everywhere — ``table()`` and
``list_tables()`` resolve a reserved namespace by name (with a one-time
warning from ``table()``), so a pre-existing ``_``-prefixed user
namespace stays reachable and migratable: copy its tables to an
unreserved namespace at your convenience.
"""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from crest_spark.lakehouse.table import LakehouseTable


class LakehouseCatalog:
    def __init__(self, warehouse: str, default_namespace: str = "default"):
        self.warehouse = warehouse
        self.default_namespace = default_namespace
        os.makedirs(warehouse, exist_ok=True)

    def create_namespace(self, namespace: str) -> None:
        # underscore-prefixed names are reserved for engine scratch dirs
        # (list_namespaces filters them out, so a table created under one
        # would exist but be invisible to discovery — reject up front)
        if namespace.startswith("_"):
            raise ValueError(
                f"namespace {namespace!r} is reserved (underscore prefix "
                "marks engine scratch dirs, hidden from list_namespaces)"
            )
        os.makedirs(os.path.join(self.warehouse, namespace), exist_ok=True)

    def list_namespaces(self) -> list[str]:
        # underscore-prefixed dirs are engine scratch (e.g. the curation
        # recipe's `_curate_stage` parquet staging), not namespaces —
        # the same convention Iceberg/Hive use for metadata dirs
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if not d.startswith("_")
            and os.path.isdir(os.path.join(self.warehouse, d))
        )

    def list_tables(self, namespace: str | None = None) -> list[str]:
        ns = namespace or self.default_namespace
        ns_dir = os.path.join(self.warehouse, ns)
        if not os.path.isdir(ns_dir):
            return []
        return sorted(
            d
            for d in os.listdir(ns_dir)
            if LakehouseTable(self.warehouse, ns, d).exists()
        )

    # reserved namespaces already warned about this process (one warning
    # per namespace, not per table() call)
    _warned_reserved: set[str] = set()

    def table(self, name: str, namespace: str | None = None) -> LakehouseTable:
        ns = namespace or self.default_namespace
        if ns.startswith("_") and ns not in self._warned_reserved:
            import warnings

            self._warned_reserved.add(ns)
            warnings.warn(
                f"namespace {ns!r} uses the reserved underscore prefix: "
                "it is hidden from list_namespaces and cannot be "
                "(re)created; migrate its tables to an unreserved "
                "namespace",
                UserWarning,
                stacklevel=2,
            )
        return LakehouseTable(self.warehouse, ns, name)

    def transaction(self):
        """Open a multi-table append transaction (see
        ``lakehouse/transaction.py``): appends inside the block stage
        invisibly across any number of tables; a clean exit publishes
        all of them behind one atomic journal record, an exception
        discards everything. Opening a transaction first rolls forward
        any crashed predecessor's journal."""
        from crest_spark.lakehouse.transaction import Transaction

        return Transaction(self)

    def recover_transactions(self) -> list[str]:
        """Roll forward journaled-but-unfinished multi-table
        transactions (idempotent; see ``lakehouse/transaction.py``)."""
        from crest_spark.lakehouse.transaction import recover_transactions

        return recover_transactions(self)

    def get_or_create_table(
        self, name: str, schema: StructType, namespace: str | None = None
    ) -> LakehouseTable:
        """First writer pins the schema (reference:
        ``batch_writer.go:61-83`` + ``iceberg_committer.go:54-81``)."""
        ns = namespace or self.default_namespace
        self.create_namespace(ns)
        t = self.table(name, ns)
        if not t.exists():
            t.create(schema)
        return t
