"""In-process fake Iceberg REST catalog server (spec subset the reference
exercises through iceberg-go: config handshake, namespace DDL with 409
semantics, table create/load). Shared by the client unit tests and the
ingest-integration test."""

from __future__ import annotations

import contextlib
import json
import urllib.parse
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class FakeCatalogState:
    """Spec-shaped state machine: namespaces + tables with v2 metadata."""

    def __init__(self):
        self.namespaces: set[str] = set()
        self.tables: dict[tuple[str, str], dict] = {}
        self.requests: list[str] = []


def make_handler(state: FakeCatalogState):
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
            parts = [urllib.parse.unquote(p) for p in path.split("/") if p]
            parts = [p.replace("\x1f", ".") for p in parts]
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
            parts = [urllib.parse.unquote(p) for p in self.path.split("/") if p]
            parts = [p.replace("\x1f", ".") for p in parts]
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
            if len(parts) == 5 and parts[3] == "tables":
                # Iceberg REST commit protocol: CommitTableRequest
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._send(404, {"error": {"message": "NoSuchTable"}})
                meta = state.tables[key]["metadata"]
                for req in body.get("requirements", []):
                    if req.get("type") == "assert-ref-snapshot-id":
                        ref = meta.get("refs", {}).get(req.get("ref", "main"))
                        current = ref.get("snapshot-id") if ref else None
                        if current != req.get("snapshot-id"):
                            return self._send(
                                409,
                                {
                                    "error": {
                                        "message": "CommitFailedException: "
                                        f"ref at {current}, "
                                        f"expected {req.get('snapshot-id')}"
                                    }
                                },
                            )
                for upd in body.get("updates", []):
                    if upd["action"] == "add-snapshot":
                        meta.setdefault("snapshots", []).append(upd["snapshot"])
                    elif upd["action"] == "add-schema":
                        meta.setdefault("schemas", []).append(upd["schema"])
                    elif upd["action"] == "set-current-schema":
                        sid = upd["schema-id"]
                        if sid == -1:  # spec: -1 = the schema just added
                            sid = meta["schemas"][-1].get("schema-id", 0)
                        meta["current-schema-id"] = sid
                    elif upd["action"] == "set-snapshot-ref":
                        meta.setdefault("refs", {})[upd["ref-name"]] = {
                            "type": upd.get("type", "branch"),
                            "snapshot-id": upd["snapshot-id"],
                        }
                        meta["current-snapshot-id"] = upd["snapshot-id"]
                return self._send(200, state.tables[key])
            return self._send(400, {"error": {"message": f"bad path {self.path}"}})

    return Handler


@contextlib.contextmanager
def serve():
    """Yield (base_url, state) with the fake server running."""
    state = FakeCatalogState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_port}", state
    finally:
        server.shutdown()
        server.server_close()
