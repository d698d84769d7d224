"""Iceberg REST catalog client (the reference's Lakekeeper hop).

Parity with the catalog surface the reference drives through iceberg-go
(``/root/reference/pkg/ingestor/iceberg_committer.go:26-119``): connect to
an endpoint, best-effort create-namespace, create-table-with-schema,
load-table, all against the public Iceberg REST catalog OpenAPI spec
(``/v1/config``, ``/v1/namespaces``, ``/v1/namespaces/{ns}/tables``).

stdlib-only (urllib): the container has no HTTP client dependency, and the
catalog protocol is a handful of small JSON calls — metadata traffic,
never data. Data I/O stays with the engine's own table format; at 100 TB
the catalog serves one metadata pointer per commit while executors
read/write parquet directly, so this client is driver-side only and never
on a hot path.

Swap-in point promised by ``catalog.py``: ``catalog_from_config`` returns
the directory catalog for ``type: local`` (default) and this client for
``type: rest``.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql.types import StructType

from crest_spark.functions.schema_convert import (
    iceberg_to_spark_schema,
    spark_schema_to_iceberg,
)


class RestCatalogError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"REST catalog error {status}: {message}")
        self.status = status



def _ident(name: str) -> str:
    """URL-encode one identifier for a REST path segment."""
    return urllib.parse.quote(name, safe="")


def _ns(namespace: str) -> str:
    """Encode a (possibly multi-level, dot-separated) namespace for a REST
    path: levels joined with the %1F unit separator, as the Iceberg REST
    OpenAPI spec requires — names with '/', spaces, or dots would
    otherwise hit the wrong route or be split into bogus path segments."""
    return urllib.parse.quote("\x1f".join(namespace.split(".")), safe="")


class RestCatalogClient:
    """Minimal Iceberg REST catalog client (namespace + table DDL)."""

    def __init__(self, endpoint: str, warehouse: str | None = None, timeout: float = 10.0):
        self.endpoint = endpoint.rstrip("/")
        self.warehouse = warehouse
        self.timeout = timeout
        self._prefix = ""

    # -- plumbing ----------------------------------------------------------

    def _url(self, path: str) -> str:
        prefix = f"/{self._prefix}" if self._prefix else ""
        return f"{self.endpoint}/v1{prefix}{path}"

    def _call(
        self, method: str, path: str, body: dict | None = None
    ) -> dict[str, Any]:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self._url(path),
            data=data,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
                return json.loads(payload) if payload else {}
        except urllib.error.HTTPError as e:
            raise RestCatalogError(e.code, e.read().decode(errors="replace")) from e

    # -- spec operations ---------------------------------------------------

    def config(self) -> dict[str, Any]:
        """GET /v1/config — fetch defaults/overrides; the spec's handshake.
        A returned ``prefix`` override is applied to subsequent paths."""
        q = f"?warehouse={urllib.parse.quote(self.warehouse)}" if self.warehouse else ""
        cfg = self._call("GET", f"/config{q}")
        self._prefix = str(cfg.get("overrides", {}).get("prefix", "")).strip("/")
        return cfg

    def create_namespace(self, namespace: str) -> None:
        """Best-effort create, like the reference's CreateNamespace call
        (``iceberg_committer.go:84-96``): 409 AlreadyExists is success."""
        try:
            self._call(
                "POST",
                "/namespaces",
                {"namespace": [namespace], "properties": {}},
            )
        except RestCatalogError as e:
            if e.status != 409:
                raise

    def list_namespaces(self) -> list[str]:
        out = self._call("GET", "/namespaces")
        return sorted(".".join(ns) for ns in out.get("namespaces", []))

    def list_tables(self, namespace: str) -> list[str]:
        out = self._call("GET", f"/namespaces/{_ns(namespace)}/tables")
        return sorted(ident["name"] for ident in out.get("identifiers", []))

    def table_exists(self, namespace: str, name: str) -> bool:
        try:
            self._call("GET", f"/namespaces/{_ns(namespace)}/tables/{_ident(name)}")
            return True
        except RestCatalogError as e:
            if e.status == 404:
                return False
            raise

    def create_table(
        self, namespace: str, name: str, schema: StructType, properties: dict | None = None
    ) -> dict[str, Any]:
        return self._call(
            "POST",
            f"/namespaces/{_ns(namespace)}/tables",
            {
                "name": name,
                "schema": spark_schema_to_iceberg(schema),
                "properties": properties or {},
            },
        )

    def load_table(self, namespace: str, name: str) -> dict[str, Any]:
        return self._call("GET", f"/namespaces/{_ns(namespace)}/tables/{_ident(name)}")

    def table_schema(self, namespace: str, name: str) -> StructType:
        """Current schema of a table, as a Spark StructType."""
        meta = self.load_table(namespace, name).get("metadata", {})
        schemas = {s.get("schema-id", 0): s for s in meta.get("schemas", [])}
        current = meta.get("current-schema-id", 0)
        if current in schemas:
            return iceberg_to_spark_schema(schemas[current])
        if "schema" in meta:  # v1 metadata spells it singular
            return iceberg_to_spark_schema(meta["schema"])
        raise RestCatalogError(500, f"table {namespace}.{name} metadata has no schema")

    def commit_snapshot(
        self,
        namespace: str,
        name: str,
        snapshot: dict[str, Any],
        parent_snapshot_id: int | None,
    ) -> dict[str, Any]:
        """Commit one snapshot through the Iceberg REST commit protocol
        (CommitTableRequest: requirements + updates), the transactional
        hop the reference drives via iceberg-go's ``tx.Commit``
        (``iceberg_committer.go:122-147``). The ``assert-ref-snapshot-id``
        requirement makes the commit conditional on ``main`` still
        pointing at ``parent_snapshot_id`` — a concurrent committer gets
        a 409 (CommitFailedException), never a silent overwrite."""
        return self._call(
            "POST",
            f"/namespaces/{_ns(namespace)}/tables/{_ident(name)}",
            {
                "identifier": {
                    "namespace": namespace.split("."),
                    "name": name,
                },
                "requirements": [
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": "main",
                        "snapshot-id": parent_snapshot_id,
                    }
                ],
                "updates": [
                    {"action": "add-snapshot", "snapshot": snapshot},
                    {
                        "action": "set-snapshot-ref",
                        "ref-name": "main",
                        "type": "branch",
                        "snapshot-id": snapshot["snapshot-id"],
                    },
                ],
            },
        )

    def update_schema(
        self, namespace: str, name: str, schema: dict[str, Any]
    ) -> dict[str, Any]:
        """Evolve the catalog's schema (CommitTableRequest add-schema +
        set-current-schema) — the mirror of the engine's merge_schema
        append path, so the REST side tracks widened tables."""
        return self._call(
            "POST",
            f"/namespaces/{_ns(namespace)}/tables/{_ident(name)}",
            {
                "identifier": {
                    "namespace": namespace.split("."),
                    "name": name,
                },
                "requirements": [],
                "updates": [
                    {"action": "add-schema", "schema": schema},
                    {
                        "action": "set-current-schema",
                        "schema-id": schema.get("schema-id", -1),
                    },
                ],
            },
        )

    def current_snapshot_id(self, namespace: str, name: str) -> int | None:
        meta = self.load_table(namespace, name).get("metadata", {})
        ref = meta.get("refs", {}).get("main")
        if ref is not None:
            return ref.get("snapshot-id")
        return meta.get("current-snapshot-id")

    def get_or_create_table(
        self, namespace: str, name: str, schema: StructType
    ) -> StructType:
        """The reference's GetOrCreateTable contract
        (``iceberg_committer.go:54-81``): load if present, else create
        namespace + table; returns the CATALOG's schema (first writer
        pins it — a second writer with a drifted schema gets the pinned
        one back, not an error)."""
        if not self.table_exists(namespace, name):
            self.create_namespace(namespace)
            try:
                self.create_table(namespace, name, schema)
            except RestCatalogError as e:
                if e.status != 409:  # lost a create race: fall through to load
                    raise
        return self.table_schema(namespace, name)


def catalog_from_config(
    catalog_type: str, *, warehouse: str, endpoint: str | None = None
):
    """``type: local`` -> directory catalog; ``type: rest`` -> REST client
    (the reference's ``CatalogConfig{Endpoint, Type, Warehouse}``,
    ``config.go:46-51``)."""
    if catalog_type == "rest":
        if not endpoint:
            raise ValueError("catalog type 'rest' requires an endpoint")
        client = RestCatalogClient(endpoint, warehouse=warehouse)
        client.config()
        return client
    if catalog_type == "local":
        from crest_spark.lakehouse.catalog import LakehouseCatalog

        return LakehouseCatalog(warehouse)
    raise ValueError(f"unknown catalog type {catalog_type!r}")
