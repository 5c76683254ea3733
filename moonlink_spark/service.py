"""REST ingest service — the HTTP transport over the row-event contract.

Mirrors moonlink's REST API surface (reference:
src/moonlink_service/src/rest_api.rs:196-204 — GET /health, GET /tables,
POST/DELETE /tables/{table}, POST /ingest/{table}, POST /upload/{table},
POST /tables/{table}/optimize; request/response shapes :100-180). The
reference serves axum over tokio; here the transport is stdlib
``http.server`` (threaded) because the engine-side work — LSN assignment,
batch-atomic MERGE apply, back-pressure — already lives in
``ingest_api.RowEventIngestor`` and the operators; the handler only
translates HTTP to those calls. On a real deployment the same ``AppState``
methods sit behind any production WSGI/ASGI front.

Concurrency model: moonlink serializes all writes to a table through one
event loop (reference: src/moonlink/src/table_handler.rs:374-411); here a
per-table lock does the same — handler threads serialize on the table,
Spark parallelism happens inside each job.

Request modes (rest_api.rs:130-145): ``async`` buffers the event and acks
immediately (no LSN yet); ``sync`` flushes the buffer through MERGE and
returns the assigned LSN.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from moonlink_spark.ingest_api import RowEventIngestor

from moonlink_spark.table.catalog import Table, create_table, load_table


class ServiceError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class AppState:
    """Engine-side service state: tables under one root, one ingestor and
    one write lock per table. Transport-agnostic — the HTTP handler and
    tests drive the same methods."""

    def __init__(self, spark: SparkSession, root: str, key=None):
        import os

        self.spark = spark
        self.root = os.path.abspath(root)
        # None = per-table identity resolution (IDENTITY_PROP; single or
        # composite), the same rule every other front-end uses
        self.key = key
        self._tables: dict[str, Table] = {}
        self._ingestors: dict[str, RowEventIngestor] = {}
        self._locks: dict[str, threading.Lock] = {}
        self._registry_lock = threading.Lock()

    # ---------------------------------------------------------- registry
    def _path(self, name: str) -> str:
        import os

        if not re.fullmatch(r"[A-Za-z0-9_.-]{1,128}", name):
            raise ServiceError(400, f"invalid table name: {name!r}")
        return os.path.join(self.root, name)

    def _get(self, name: str) -> tuple[Table, RowEventIngestor, threading.Lock]:
        with self._registry_lock:
            if name not in self._tables:
                try:
                    t = load_table(self._path(name))
                except FileNotFoundError:
                    raise ServiceError(404, f"no such table: {name}") from None
                self._tables[name] = t
                self._ingestors[name] = RowEventIngestor(
                    self.spark, t, key=self.key
                )
                self._locks[name] = threading.Lock()
            return self._tables[name], self._ingestors[name], self._locks[name]

    # ---------------------------------------------------------- endpoints
    def health(self) -> dict:
        return {
            "service": "moonlink_spark",
            "status": "healthy",
            "timestamp": int(time.time()),
        }

    def list_tables(self) -> dict:
        import os

        names = []
        if os.path.isdir(self.root):
            for n in sorted(os.listdir(self.root)):
                if os.path.isdir(os.path.join(self.root, n, "metadata")):
                    names.append(n)
        out = []
        for n in names:
            try:
                t, _, _ = self._get(n)
                t.refresh()
                out.append(
                    {
                        "table": n,
                        "commit_lsn": t.flush_lsn,
                        "snapshots": len(t.md.snapshots),
                    }
                )
            except ServiceError:
                continue
        return {"tables": out}

    def create(self, name: str, body: dict) -> dict:
        """Create a table. ``schema`` is a Spark DDL string (default: the
        image+caption schema); ``properties`` pass through (buckets,
        manifest format, ...)."""
        from moonlink_spark.schema import IMAGES_SCHEMA

        schema = (
            StructType.fromDDL(body["schema"]) if body.get("schema") else IMAGES_SCHEMA
        )
        from moonlink_spark.schema import MERGE_KEY as _DEFAULT_KEY

        declared = (body.get("properties") or {}).get("moonlink.identity-keys")
        need = (
            [c.strip() for c in declared.split(",") if c.strip()]
            if declared
            else ([self.key] if isinstance(self.key, str) and self.key else [_DEFAULT_KEY])
        )
        names = [f.name for f in schema.fields]
        missing = [k for k in need if k not in names]
        if missing:
            raise ServiceError(400, f"schema must carry identity column(s) {missing}")
        try:
            t = create_table(
                self._path(name), schema, properties=body.get("properties")
            )
        except Exception as e:  # CAS conflict on existing metadata
            raise ServiceError(409, f"table exists or create failed: {e}") from None
        with self._registry_lock:
            self._tables[name] = t
            self._ingestors[name] = RowEventIngestor(self.spark, t, key=self.key)
            self._locks[name] = threading.Lock()
        return {"table": name, "location": t.md.location}

    def drop(self, name: str) -> dict:
        import shutil

        t, _, lock = self._get(name)
        with lock, self._registry_lock:
            shutil.rmtree(self._path(name), ignore_errors=True)
            self._tables.pop(name, None)
            self._ingestors.pop(name, None)
            self._locks.pop(name, None)
        return {"table": name, "dropped": True}

    def ingest(self, name: str, body: dict) -> dict:
        """POST /ingest/{table}: {operation, data, request_mode}.
        insert/upsert carry a row object (binary columns base64); delete
        carries {key: value}. sync mode flushes and returns the LSN."""
        op = body.get("operation")
        data = body.get("data")
        mode = body.get("request_mode", "async")
        _, ing, lock = self._get(name)
        with lock:
            try:
                if op in ("insert", "upsert"):
                    getattr(ing, op)(data)
                elif op == "delete":
                    # the delete payload IS the identity dict ({key: value}
                    # for single-key tables, every identity column for
                    # composite identities) — the ingestor validates it
                    ing.delete(dict(data or {}))
                elif op == "flush":
                    pass  # flush-only request
                else:
                    raise ServiceError(400, f"unknown operation: {op!r}")
            except ValueError as e:
                raise ServiceError(400, str(e)) from None
            lsn = None
            if mode == "sync" or op == "flush":
                if ing.flush() is not None:
                    lsn = ing.table.flush_lsn  # LSN rides table properties
        return {"table": name, "operation": op, "lsn": lsn}

    def upload(self, name: str, body: dict) -> dict:
        """POST /upload/{table}: bulk-adopt existing parquet files
        (add_files — moonlink's file-upload ingest)."""
        from moonlink_spark.operators.ingest import add_files

        files = body.get("files") or []
        t, _, lock = self._get(name)
        with lock:
            try:
                res = add_files(self.spark, t, files)
            except ValueError as e:
                raise ServiceError(400, str(e)) from None
        return {
            "table": name,
            "files": len(files),
            "snapshot_id": res.snapshot.snapshot_id,
            "lsn": t.flush_lsn,
        }

    def optimize(self, name: str, body: dict) -> dict:
        from moonlink_spark.operators.maintenance import optimize_table

        mode = (body or {}).get("mode", "full")
        t, _, lock = self._get(name)
        with lock:
            try:
                res = optimize_table(self.spark, t, mode=mode)
            except ValueError as e:
                raise ServiceError(400, str(e)) from None
        c = res.compact
        return {
            "table": name,
            "mode": mode,
            "compacted_files": getattr(c, "in_files", 0) if c else 0,
        }


_ROUTES = [
    ("GET", re.compile(r"^/health$"), lambda s, m, b: s.health()),
    ("GET", re.compile(r"^/tables$"), lambda s, m, b: s.list_tables()),
    ("POST", re.compile(r"^/tables/(?P<t>[^/]+)$"), lambda s, m, b: s.create(m["t"], b)),
    ("DELETE", re.compile(r"^/tables/(?P<t>[^/]+)$"), lambda s, m, b: s.drop(m["t"])),
    ("POST", re.compile(r"^/ingest/(?P<t>[^/]+)$"), lambda s, m, b: s.ingest(m["t"], b)),
    ("POST", re.compile(r"^/upload/(?P<t>[^/]+)$"), lambda s, m, b: s.upload(m["t"], b)),
    (
        "POST",
        re.compile(r"^/tables/(?P<t>[^/]+)/optimize$"),
        lambda s, m, b: s.optimize(m["t"], b),
    ),
]


class _Handler(BaseHTTPRequestHandler):
    state: AppState  # set by make_server

    def log_message(self, *a):  # quiet; the engine logs through Spark
        pass

    def _dispatch(self, method: str) -> None:
        body = {}
        n = int(self.headers.get("Content-Length") or 0)
        if n:
            try:
                body = json.loads(self.rfile.read(n))
            except json.JSONDecodeError:
                return self._send(400, {"error": "invalid JSON body"})
        for meth, pat, fn in _ROUTES:
            m = pat.match(self.path)
            if m and meth == method:
                try:
                    return self._send(200, fn(self.state, m.groupdict(), body))
                except ServiceError as e:
                    return self._send(e.status, {"error": str(e)})
                except Exception as e:  # engine error -> 500 with message
                    return self._send(500, {"error": f"{type(e).__name__}: {e}"})
        self._send(404, {"error": f"no route: {method} {self.path}"})

    def _send(self, status: int, payload: dict) -> None:
        data = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")

    def do_DELETE(self):
        self._dispatch("DELETE")


def make_server(
    spark: SparkSession, root: str, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``server.server_address`` carries
    the bound port when port=0. Callers run ``serve_forever`` in a thread
    (tests) or foreground (a deployment's entry point)."""
    state = AppState(spark, root)
    handler = type("Handler", (_Handler,), {"state": state})
    return ThreadingHTTPServer((host, port), handler)
