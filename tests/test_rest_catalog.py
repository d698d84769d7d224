"""REST catalog client against an in-process fake Iceberg REST server.

The fake implements the spec subset the reference exercises through
iceberg-go (config handshake, namespace DDL with 409 semantics, table
create/load) so the client's contract — including the get-or-create race
and first-writer-pins-schema behavior — is tested over real HTTP."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import types as T

from crest_spark.lakehouse.rest_catalog import (
    RestCatalogClient,
    RestCatalogError,
    catalog_from_config,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType(), True), True),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
    ]
)


class _FakeCatalog:
    """Spec-shaped state machine: namespaces + tables with v2 metadata."""

    def __init__(self):
        self.namespaces: set[str] = set()
        self.tables: dict[tuple[str, str], dict] = {}
        self.requests: list[str] = []


def _make_handler(state: _FakeCatalog):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _send(self, code: int, body: dict | None = None):
            payload = json.dumps(body or {}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n)) if n else {}

        def do_GET(self):
            state.requests.append(f"GET {self.path}")
            path = self.path.split("?")[0]
            parts = [p for p in path.split("/") if p]
            if path.startswith("/v1/config"):
                return self._send(200, {"defaults": {}, "overrides": {}})
            if path == "/v1/namespaces":
                return self._send(
                    200, {"namespaces": [[ns] for ns in sorted(state.namespaces)]}
                )
            if len(parts) == 4 and parts[3] == "tables":  # /v1/namespaces/{ns}/tables
                ns = parts[2]
                idents = [
                    {"namespace": [n], "name": t}
                    for (n, t) in sorted(state.tables)
                    if n == ns
                ]
                return self._send(200, {"identifiers": idents})
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._send(404, {"error": {"message": "NoSuchTable"}})
                return self._send(200, state.tables[key])
            return self._send(400, {"error": {"message": f"bad path {path}"}})

        def do_POST(self):
            state.requests.append(f"POST {self.path}")
            parts = [p for p in self.path.split("/") if p]
            body = self._body()
            if self.path == "/v1/namespaces":
                ns = body["namespace"][0]
                if ns in state.namespaces:
                    return self._send(
                        409, {"error": {"message": "AlreadyExistsException"}}
                    )
                state.namespaces.add(ns)
                return self._send(200, {"namespace": [ns], "properties": {}})
            if len(parts) == 4 and parts[3] == "tables":
                ns, name = parts[2], body["name"]
                if ns not in state.namespaces:
                    return self._send(404, {"error": {"message": "NoSuchNamespace"}})
                if (ns, name) in state.tables:
                    return self._send(
                        409, {"error": {"message": "AlreadyExistsException"}}
                    )
                schema = dict(body["schema"])
                schema["schema-id"] = 0
                state.tables[(ns, name)] = {
                    "metadata-location": f"s3://warehouse/{ns}/{name}/metadata/v1.json",
                    "metadata": {
                        "format-version": 2,
                        "current-schema-id": 0,
                        "schemas": [schema],
                        "properties": body.get("properties", {}),
                    },
                }
                return self._send(200, state.tables[(ns, name)])
            return self._send(400, {"error": {"message": f"bad path {self.path}"}})

    return Handler


@pytest.fixture()
def fake_server():
    state = _FakeCatalog()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_port}", state
    finally:
        server.shutdown()
        server.server_close()


def test_namespace_ddl_and_409_idempotency(fake_server):
    url, state = fake_server
    cat = RestCatalogClient(url)
    cat.config()
    cat.create_namespace("prod")
    cat.create_namespace("prod")  # 409 swallowed, like the reference
    assert cat.list_namespaces() == ["prod"]


def test_create_load_roundtrips_schema(fake_server):
    url, _ = fake_server
    cat = RestCatalogClient(url)
    cat.create_namespace("prod")
    cat.create_table("prod", "events", SCHEMA)
    assert cat.list_tables("prod") == ["events"]
    assert cat.table_exists("prod", "events")
    assert not cat.table_exists("prod", "nope")
    assert cat.table_schema("prod", "events") == SCHEMA


def test_get_or_create_pins_first_writer_schema(fake_server):
    url, _ = fake_server
    cat = RestCatalogClient(url)
    got = cat.get_or_create_table("prod", "events", SCHEMA)
    assert got == SCHEMA
    drifted = T.StructType([T.StructField("other", T.StringType(), True)])
    # second writer with a drifted schema gets the pinned schema back
    assert cat.get_or_create_table("prod", "events", drifted) == SCHEMA


def test_errors_surface_status(fake_server):
    url, _ = fake_server
    cat = RestCatalogClient(url)
    with pytest.raises(RestCatalogError) as ei:
        cat.create_table("no_such_ns", "t", SCHEMA)
    assert ei.value.status == 404


def test_catalog_from_config_dispatch(fake_server, tmp_path):
    url, _ = fake_server
    rest = catalog_from_config("rest", warehouse="wh", endpoint=url)
    assert isinstance(rest, RestCatalogClient)
    local = catalog_from_config("local", warehouse=str(tmp_path / "wh"))
    from crest_spark.lakehouse.catalog import LakehouseCatalog

    assert isinstance(local, LakehouseCatalog)
    with pytest.raises(ValueError):
        catalog_from_config("hive", warehouse="wh")


def test_config_parses_catalog_section(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "warehouse: data/wh\n"
        "catalog:\n"
        "  type: rest\n"
        "  endpoint: http://lakekeeper:8181/catalog\n"
    )
    from crest_spark.config import load_config

    cfg = load_config(str(cfg_file))
    assert cfg.catalog.type == "rest"
    assert cfg.catalog.endpoint == "http://lakekeeper:8181/catalog"
    assert cfg.catalog.warehouse == "data/wh"  # inherits the ingest warehouse

    cfg_file.write_text("warehouse: data/wh\n")
    assert load_config(str(cfg_file)).catalog.type == "local"
