"""HTTP control plane: the reference's REST route table served over the
PipelineManager.

Mirrors crates/rest-api (lib.rs:19-53, pipelines.rs:141-160,
health.rs:10-14) with the standard library only — a ThreadingHTTPServer
shell over ``control.PipelineManager``, so the lifecycle contract stays
in one (testable-without-a-server) place and this module is pure
routing:

    GET    /health                              liveness
    GET    /ready                               readiness (spark session up)
    GET    /metrics                             Prometheus text exposition
    GET    /log-level   PUT /log-level          runtime log level
    POST   /validate                            config parse+build dry-run
    GET    /pipelines                           list
    POST   /pipelines                           create (JSON spec body)
    GET    /pipelines/{name}                    status
    PATCH  /pipelines/{name}                    deep-merge + restart
    DELETE /pipelines/{name}                    stop + forget
    POST   /pipelines/{name}/pause
    POST   /pipelines/{name}/resume
    POST   /pipelines/{name}/stop
    GET    /pipelines/{name}/journal/dlq?n=10   peek
    DELETE /pipelines/{name}/journal/dlq        purge
    GET    /pipelines/{name}/journal/dlq/count
    POST   /pipelines/{name}/journal/dlq/ack    {"seqs": [..]}
    GET    /pipelines/{name}/schemas                     registry list
    GET    /pipelines/{name}/schemas/{db}/{table}        current entry
    GET    /pipelines/{name}/schemas/{db}/{table}/versions
    POST   /pipelines/{name}/schemas[/{db}/{table}]/reload
                        live INFORMATION_SCHEMA re-bootstrap through the
                        manager's injected JDBC catalog seam
                        (schema/catalog.py); 501 when no catalog
                        connection is configured (DDL-capture owns it)
    GET    /pipelines/{name}/sensing/schemas             inferred list
    GET    /pipelines/{name}/sensing/schemas/{table}     inferred entry
    GET    /pipelines/{name}/sensing/schemas/{table}/json-schema

Errors: 404 unknown pipeline, 400 malformed JSON, 409 invalid state
transitions — the reference's PipelineAPIError mapping.

The server is control-plane only (a handful of requests a minute);
threading keeps a slow Spark call on one pipeline from blocking a
status probe on another. Not a data-plane component — nothing here
touches executors.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .control import PipelineManager


class ControlPlaneServer:
    def __init__(self, manager: PipelineManager, *, host: str = "127.0.0.1", port: int = 0):
        self.manager = manager
        handler = _make_handler(manager)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> "ControlPlaneServer":
        from . import __name__ as _pkg  # noqa: F401
        from .metrics import get_registry

        # reference build_info gauge: constant 1 with version labels
        get_registry().set("deltaforge_build_info", 1.0, engine="deltaforge_spark")
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def _make_handler(manager: PipelineManager):
    class Handler(BaseHTTPRequestHandler):
        # ----- plumbing ------------------------------------------------
        def log_message(self, *a):  # quiet test output
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b"{}"
            try:
                return json.loads(raw or b"{}")
            except json.JSONDecodeError:
                return None

        def _dispatch(self, method: str) -> None:
            url = urlparse(self.path)
            path, q = url.path.rstrip("/") or "/", parse_qs(url.query)
            try:
                self._route(method, path, q)
            except KeyError as e:
                self._json(404, {"error": str(e.args[0]) if e.args else "not found"})
            except ValueError as e:
                self._json(409, {"error": str(e)})
            except Exception as e:  # control plane must not die on a bad request
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        # ----- routing -------------------------------------------------
        def _route(self, method: str, path: str, q) -> None:
            m = manager
            if (method, path) == ("GET", "/health"):
                return self._json(200, {"status": "ok"})
            if (method, path) == ("GET", "/metrics"):
                from .metrics import get_registry

                body = get_registry().render_prometheus().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            if (method, path) == ("GET", "/ready"):
                ready = m.spark is not None
                return self._json(200 if ready else 503, {"ready": ready})
            if path == "/log-level":
                # health.rs get_log_level + runtime adjustment; the level
                # is tracked here (log4j2's JVM accessor isn't stable
                # across Spark versions) and applied via setLogLevel
                if method == "GET":
                    return self._json(200, {"level": getattr(manager, "_log_level", "WARN")})
                if method == "PUT":
                    body = self._body()
                    if not body or "level" not in body:
                        return self._json(400, {"error": "expected {\"level\": ...}"})
                    lvl = str(body["level"]).upper()
                    m.spark.sparkContext.setLogLevel(lvl)
                    manager._log_level = lvl
                    return self._json(200, {"level": lvl})
            if (method, path) == ("POST", "/validate"):
                # health.rs validate_config: parse-and-build without
                # registering or starting anything
                spec = self._body()
                if spec is None:
                    return self._json(400, {"error": "malformed JSON"})
                try:
                    src_type = (spec.get("spec", {}).get("source") or {}).get("type")
                    if spec.get("apiVersion") == "deltaforge/v1" and src_type in ("mysql", "postgres"):
                        # the reference's own vocabulary validates as-is
                        from .plans.refspec import compile_reference_pipeline, parse_reference_spec

                        compile_reference_pipeline(
                            parse_reference_spec(spec), js_policy="identity"
                        )
                    else:
                        from .plans.compiler import PipelineSpec, compile_pipeline

                        compile_pipeline(PipelineSpec.from_dict(spec))
                    return self._json(200, {"valid": True})
                except Exception as e:
                    return self._json(200, {"valid": False, "error": f"{e}"})
            if path == "/pipelines":
                if method == "GET":
                    return self._json(200, m.list())
                if method == "POST":
                    spec = self._body()
                    if spec is None or "name" not in spec.get("metadata", {}):
                        return self._json(400, {"error": "malformed spec"})
                    return self._json(201, m.create(spec))
            mt = re.fullmatch(r"/pipelines/([A-Za-z0-9_\-.]+)(/.*)?", path)
            if not mt:
                return self._json(404, {"error": "no such route"})
            name, rest = mt.group(1), mt.group(2) or ""
            if rest == "":
                if method == "GET":
                    return self._json(200, m.status(name))
                if method == "PATCH":
                    patch = self._body()
                    if patch is None:
                        return self._json(400, {"error": "malformed patch"})
                    return self._json(200, m.patch(name, patch))
                if method == "DELETE":
                    m.delete(name)
                    return self._json(200, {"deleted": name})
            if method == "POST" and rest in ("/pause", "/resume", "/stop"):
                return self._json(200, getattr(m, rest[1:])(name))
            if rest == "/journal/dlq":
                if method == "GET":
                    n = int(q.get("n", ["10"])[0])
                    rows = [r.asDict() for r in m.dlq(name).peek(n).collect()]
                    return self._json(200, {"entries": _jsonable(rows)})
                if method == "DELETE":
                    return self._json(200, {"purged": m.dlq(name).purge()})
            if (method, rest) == ("GET", "/checkpoints"):
                return self._json(200, m.checkpoints(name))
            if (method, rest) == ("GET", "/drift"):
                return self._json(200, _jsonable(m.drift(name)))
            md = re.fullmatch(r"/drift/([^/]+)", rest)
            if method == "GET" and md:
                try:
                    return self._json(200, _jsonable(m.drift(name, md.group(1))))
                except KeyError as e:
                    return self._json(404, {"error": str(e)})
            if (method, rest) == ("GET", "/sensing/stats"):
                m.status(name)
                return self._json(200, _jsonable(m.sensing_stats(name)))
            if (method, rest) == ("GET", "/journal/dlq/count"):
                return self._json(200, {"count": m.dlq(name).queue_len()})
            if (method, rest) == ("POST", "/journal/dlq/ack"):
                body = self._body()
                if body is None or not isinstance(body.get("seqs"), list):
                    return self._json(400, {"error": "expected {\"seqs\": [..]}"})
                return self._json(200, {"acked": m.dlq(name).ack(body["seqs"])})
            # schema management (schemas.rs:122-140)
            if (method, rest) == ("GET", "/schemas"):
                m.status(name)  # 404 for unknown pipeline
                return self._json(200, _jsonable(m.schemas(name).list_tables()))
            ms = re.fullmatch(r"/schemas/([^/]+)/([^/]+)(/versions)?", rest)
            if method == "GET" and ms:
                m.status(name)
                db, table, ver = ms.group(1), ms.group(2), ms.group(3)
                reg = m.schemas(name)
                if ver:
                    return self._json(200, _jsonable(reg.versions(db, table)))
                cur = reg.current(db, table)
                if cur is None:
                    return self._json(404, {"error": f"no schema for {db}.{table}"})
                return self._json(200, _jsonable(cur))
            mr = re.fullmatch(r"/schemas(?:/([^/]+)/([^/]+))?/reload", rest)
            if method == "POST" and mr:
                # live-catalog reload through the injected JDBC seam
                # (schema/catalog.py); without a catalog connection the
                # DDL-capture path owns reload (501, documented boundary)
                try:
                    out = m.reload_schemas(
                        name, db=mr.group(1), table=mr.group(2)
                    )
                except NotImplementedError:
                    return self._json(
                        501, {"error": "catalog reload is owned by the DDL-capture path"}
                    )
                except KeyError:
                    return self._json(404, {"error": f"unknown pipeline {name!r}"})
                except ValueError as e:
                    return self._json(404, {"error": str(e)})
                return self._json(200, out)
            # sensing inspection (sensing.rs:185-207)
            if (method, rest) == ("GET", "/sensing/schemas"):
                m.status(name)
                return self._json(200, _jsonable(m.sensed(name).list_tables()))
            mi = re.fullmatch(r"/sensing/schemas/([^/]+)(/json-schema)?", rest)
            if method == "GET" and mi:
                m.status(name)
                cur = m.sensed(name).current("__sensed", mi.group(1))
                if cur is None:
                    return self._json(404, {"error": f"no inferred schema for {mi.group(1)}"})
                if mi.group(2):
                    from pyspark.sql import types as T

                    from .schema.json_schema import to_json_schema

                    return self._json(
                        200, to_json_schema(T.StructType.fromJson(json.loads(cur["schema_json"])))
                    )
                return self._json(200, _jsonable(cur))
            return self._json(404, {"error": "no such route"})

        # ----- verbs ---------------------------------------------------
        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PATCH(self):
            self._dispatch("PATCH")

        def do_PUT(self):
            self._dispatch("PUT")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
