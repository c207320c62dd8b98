"""Confluent Schema Registry round-trip over REAL loopback HTTP
(sinks/sr_http.py): a producer derives the envelope schema, registers
it against a registry server speaking the public Confluent REST
protocol, frames rows with the 5-byte wire header; an independent
consumer resolves the frame's schema id back through
``GET /schemas/ids/{id}`` and decodes the bytes — the
runner/tests/avro_e2e_tests.rs contract, minus only a production
registry deployment.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from deltaforge_spark.sinks.avro_binary import AvroBinaryCodec, decode_confluent_frame
from deltaforge_spark.sinks.sr_http import HttpSchemaRegistry, SchemaRegistryError

# ------------------------------------------------------ mock SR server


class _RegistryState:
    def __init__(self):
        self.ids_by_text: dict[str, int] = {}
        self.text_by_id: dict[int, str] = {}
        self.versions: dict[str, list[int]] = {}
        self.next_id = 1
        self.requests: list[str] = []
        self.auth_seen: list[str | None] = []


def _make_handler(state: _RegistryState, *, require_auth: str | None = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _record(self):
            state.requests.append(f"{self.command} {self.path}")
            state.auth_seen.append(self.headers.get("Authorization"))
            if require_auth and self.headers.get("Authorization") != require_auth:
                self._send(401, {"error_code": 401, "message": "Unauthorized"})
                return False
            return True

        def do_GET(self):
            if not self._record():
                return
            parts = self.path.strip("/").split("/")
            if parts[0] == "schemas" and parts[1] == "ids":
                sid = int(parts[2])
                if sid not in state.text_by_id:
                    self._send(404, {"error_code": 40403, "message": "Schema not found"})
                    return
                self._send(200, {"schema": state.text_by_id[sid]})
                return
            if parts[0] == "subjects" and len(parts) == 1:
                self._send(200, sorted(state.versions))
                return
            if parts[0] == "subjects" and parts[2] == "versions" and parts[3] == "latest":
                subj = parts[1]
                if subj not in state.versions:
                    self._send(404, {"error_code": 40401, "message": f"Subject '{subj}' not found."})
                    return
                sid = state.versions[subj][-1]
                self._send(200, {
                    "subject": subj, "version": len(state.versions[subj]),
                    "id": sid, "schema": state.text_by_id[sid],
                })
                return
            self._send(404, {"error_code": 404, "message": "no route"})

        def do_POST(self):
            if not self._record():
                return
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            parts = self.path.strip("/").split("/")
            if parts[0] == "subjects" and parts[-1] == "versions":
                subj = parts[1]
                text = body["schema"]
                json.loads(text)  # must be valid JSON schema text
                if text not in state.ids_by_text:
                    state.ids_by_text[text] = state.next_id
                    state.text_by_id[state.next_id] = text
                    state.next_id += 1
                sid = state.ids_by_text[text]
                vs = state.versions.setdefault(subj, [])
                if sid not in vs:
                    vs.append(sid)
                self._send(200, {"id": sid})
                return
            if parts[0] == "compatibility":
                subj = parts[2]
                if subj not in state.versions:
                    self._send(404, {"error_code": 40401, "message": f"Subject '{subj}' not found."})
                    return
                old = json.loads(state.text_by_id[state.versions[subj][-1]])
                new = json.loads(body["schema"])
                # BACKWARD: every old field must still exist or the new
                # field needs a default (enough semantics to exercise the
                # client; full transitive rules live in a real registry)
                old_fields = {f["name"] for f in old.get("fields", [])}
                new_fields = {f["name"]: f for f in new.get("fields", [])}
                compatible = all(
                    name in new_fields for name in old_fields
                ) and all(
                    "default" in f or f["name"] in old_fields
                    for f in new_fields.values()
                )
                self._send(200, {"is_compatible": compatible})
                return
            self._send(404, {"error_code": 404, "message": "no route"})

    return Handler


@pytest.fixture()
def registry_server():
    state = _RegistryState()
    srv = HTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", state
    srv.shutdown()


# ---------------------------------------------------------------- tests


SCHEMA = {
    "type": "record", "name": "Envelope", "namespace": "cdc.testdb.orders",
    "fields": [
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "total", "type": ["null", "string"], "default": None},
    ],
}


class TestHttpRegistry:
    def test_register_and_resolve(self, registry_server):
        url, state = registry_server
        sr = HttpSchemaRegistry(url)
        sid = sr.register("orders-value", SCHEMA)
        assert sid == 1
        # identical text under ANOTHER subject keeps the global id
        assert sr.register("orders-v2-value", SCHEMA) == 1
        fresh = HttpSchemaRegistry(url)  # consumer: no warm cache
        assert json.loads(fresh.get_schema(sid)) == SCHEMA

    def test_register_is_cached_client_side(self, registry_server):
        url, state = registry_server
        sr = HttpSchemaRegistry(url)
        for _ in range(5):
            sr.register("orders-value", SCHEMA)
        assert state.requests.count("POST /subjects/orders-value/versions") == 1

    def test_evolved_schema_re_registers_not_stale_cache(self, registry_server):
        """The cache keys on (subject, schema text) like Confluent
        clients: registering an EVOLVED schema under the same subject
        must hit the registry and return the new global id — a
        subject-only cache would frame every post-evolution payload
        with the stale id (ADVICE r5)."""
        url, state = registry_server
        sr = HttpSchemaRegistry(url)
        v1 = sr.register("orders-value", SCHEMA)
        evolved = dict(SCHEMA)
        evolved["fields"] = SCHEMA["fields"] + [
            {"name": "added", "type": ["null", "string"], "default": None}
        ]
        v2 = sr.register("orders-value", evolved)
        assert v2 != v1
        assert state.requests.count("POST /subjects/orders-value/versions") == 2
        # both texts now cached: re-registering either is request-free
        assert sr.register("orders-value", SCHEMA) == v1
        assert sr.register("orders-value", evolved) == v2
        assert state.requests.count("POST /subjects/orders-value/versions") == 2

    def test_latest_and_subjects(self, registry_server):
        url, _ = registry_server
        sr = HttpSchemaRegistry(url)
        sr.register("a-value", SCHEMA)
        got = sr.latest("a-value")
        assert got["id"] == 1 and got["version"] == 1
        assert sr.subjects() == ["a-value"]

    def test_unknown_subject_maps_error_code(self, registry_server):
        url, _ = registry_server
        sr = HttpSchemaRegistry(url)
        with pytest.raises(SchemaRegistryError) as ei:
            sr.latest("ghost-value")
        assert ei.value.error_code == 40401
        assert ei.value.http_status == 404

    def test_unknown_schema_id(self, registry_server):
        url, _ = registry_server
        sr = HttpSchemaRegistry(url)
        with pytest.raises(SchemaRegistryError) as ei:
            sr.get_schema(999)
        assert ei.value.error_code == 40403

    def test_compatibility_check(self, registry_server):
        url, _ = registry_server
        sr = HttpSchemaRegistry(url)
        sr.register("orders-value", SCHEMA)
        evolved = dict(SCHEMA, fields=SCHEMA["fields"] + [
            {"name": "region", "type": ["null", "string"], "default": None}
        ])
        assert sr.is_compatible("orders-value", evolved) is True
        breaking = dict(SCHEMA, fields=SCHEMA["fields"][:-1] + [
            {"name": "required_new", "type": "string"}  # no default, drops a field
        ])
        assert sr.is_compatible("orders-value", breaking) is False

    def test_basic_auth_header(self):
        state = _RegistryState()
        import base64

        expect = "Basic " + base64.b64encode(b"sa:pw").decode()
        srv = HTTPServer(("127.0.0.1", 0), _make_handler(state, require_auth=expect))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_port}"
            with pytest.raises(SchemaRegistryError) as ei:
                HttpSchemaRegistry(url).register("s-value", SCHEMA)
            assert ei.value.http_status == 401
            assert HttpSchemaRegistry(url, auth=("sa", "pw")).register("s-value", SCHEMA) == 1
        finally:
            srv.shutdown()


class TestProducerConsumerRoundTrip:
    def test_spark_frames_resolve_and_decode_via_http(self, registry_server, spark, sf_dir):
        """The full e2e: envelope rows → plan_avro_encoding (registers
        over HTTP) → avro_frame_rows (5-byte frame) → independent
        consumer resolves the id over HTTP and decodes every record."""
        from deltaforge_spark.sinks.avro_binary import avro_frame_rows
        from deltaforge_spark.sinks.avro_schema import plan_avro_encoding
        from deltaforge_spark.sources import read_table

        url, state = registry_server
        producer_sr = HttpSchemaRegistry(url)

        orders = (
            read_table(spark, sf_dir, "orders")
            .selectExpr(
                "'c' AS op",
                "CAST(o_orderkey AS BIGINT) AS o_orderkey",
                "CAST(o_totalprice AS STRING) AS o_totalprice",
                "o_orderstatus",
            )
            .limit(50)
        )
        row_struct = orders.schema
        subject, schema_id, env = plan_avro_encoding(
            row_struct, producer_sr,
            connector="mysql", db="testdb", table="orders", topic="orders",
        )
        assert subject == "orders-value"
        # frame with the value schema only (the envelope derive is
        # exercised by register; framing uses the flat row schema here)
        flat_schema = {
            "type": "record", "name": "Row", "fields": [
                {"name": "op", "type": "string"},
                {"name": "o_orderkey", "type": "long"},
                {"name": "o_totalprice", "type": ["null", "string"], "default": None},
                {"name": "o_orderstatus", "type": ["null", "string"], "default": None},
            ],
        }
        flat_id = producer_sr.register("orders-row-value", flat_schema)
        framed = avro_frame_rows(
            orders, flat_schema, schema_id=flat_id, key_col="o_orderkey"
        ).collect()
        assert len(framed) == 50

        consumer_sr = HttpSchemaRegistry(url)  # cold cache, real GETs
        decoded = []
        for r in framed:
            frame = bytes(r["value"])
            sid = int.from_bytes(frame[1:5], "big")
            schema_text = consumer_sr.get_schema(sid)
            sid2, rec = decode_confluent_frame(frame, schema_text)
            assert sid2 == sid == flat_id
            decoded.append(rec)
        src = [r.asDict() for r in orders.collect()]
        assert sorted(d["o_orderkey"] for d in decoded) == sorted(s["o_orderkey"] for s in src)
        by_key = {d["o_orderkey"]: d for d in decoded}
        for s in src:
            d = by_key[s["o_orderkey"]]
            assert d["op"] == "c"
            assert d["o_totalprice"] == s["o_totalprice"]
            assert d["o_orderstatus"] == s["o_orderstatus"]
        # exactly ONE schema fetch despite 50 frames (consumer id cache)
        gets = [r for r in state.requests if r.startswith("GET /schemas/ids/")]
        assert len(gets) == 1
