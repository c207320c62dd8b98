"""Sink clients over REAL loopback TCP brokers: a RESP server with
XADD semantics (auto-IDs, error replies), a NATS server with
INFO/CONNECT/HPUB parsing, verbose +OK, PING interleave, and a
duplicate_window Nats-Msg-Id dedup — so the Redis Streams and
JetStream sinks run their actual partition-writer wire paths
(executor workers dialing TCP, pipelined XADD, header blocks) instead
of injected fakes. Plus the HTTP webhook sink against a live
http.server with a 500-then-200 retry sequence.
"""

import json
import socket
import threading

import pytest

import deltaforge_spark.sinks.natsclient as nc
import deltaforge_spark.sinks.resp as resp

# --------------------------------------------------- mock RESP server


class RespServerState:
    def __init__(self):
        self.streams = {}
        self.lock = threading.Lock()
        self.seq = 0
        self.fail_next = 0  # inject -ERR replies


def _resp_serve(state: RespServerState):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(16)
    port = srv.getsockname()[1]

    def handle(conn):
        buf = bytearray()
        try:
            while True:
                got, cmd, rest = resp._parse(bytes(buf))
                if not got:
                    chunk = conn.recv(1 << 16)
                    if not chunk:
                        return
                    buf += chunk
                    continue
                buf = bytearray(rest)
                cmd = [c.decode() if isinstance(c, bytes) else c for c in cmd]
                name = cmd[0].upper()
                if name == "PING":
                    conn.sendall(b"+PONG\r\n")
                elif name == "XADD":
                    with state.lock:
                        if state.fail_next > 0:
                            state.fail_next -= 1
                            conn.sendall(b"-WRONGTYPE injected failure\r\n")
                            continue
                        stream, id_arg = cmd[1], cmd[2]
                        state.seq += 1
                        eid = f"1700000000000-{state.seq}" if id_arg == "*" else id_arg
                        fields = dict(zip(cmd[3::2], cmd[4::2]))
                        state.streams.setdefault(stream, []).append((eid, fields))
                    conn.sendall(f"${len(eid)}\r\n{eid}\r\n".encode())
                else:
                    conn.sendall(b"-ERR unknown command\r\n")
        except OSError:
            pass

    def accept_loop():
        try:
            while True:
                conn, _ = srv.accept()
                threading.Thread(target=handle, args=(conn,), daemon=True).start()
        except OSError:
            pass

    threading.Thread(target=accept_loop, daemon=True).start()
    return port, srv


@pytest.fixture()
def resp_server():
    state = RespServerState()
    port, srv = _resp_serve(state)
    yield port, state
    srv.close()


# --------------------------------------------------- mock NATS server


class NatsServerState:
    def __init__(self, *, dup_window: bool = True):
        self.messages = []
        self.seen_ids = set()
        self.duplicates = 0
        self.connects = []
        self.lock = threading.Lock()
        self.dup_window = dup_window


def _nats_serve(state: NatsServerState):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(16)
    port = srv.getsockname()[1]

    def handle(conn):
        try:
            conn.sendall(b'INFO {"server_id":"synth","headers":true,"max_payload":1048576}\r\n')
            buf = bytearray()

            def read_line():
                while b"\r\n" not in buf:
                    c = conn.recv(1 << 16)
                    if not c:
                        raise ConnectionError
                    buf.extend(c)
                line, _, rest = bytes(buf).partition(b"\r\n")
                buf[:] = rest
                return line

            def read_exact(n):
                while len(buf) < n:
                    c = conn.recv(1 << 16)
                    if not c:
                        raise ConnectionError
                    buf.extend(c)
                out = bytes(buf[:n])
                del buf[:n]
                return out

            while True:
                line = read_line()
                if line.startswith(b"CONNECT "):
                    opts = json.loads(line[8:])
                    with state.lock:
                        state.connects.append(opts)
                    if opts.get("verbose"):
                        # real nats-server acks the CONNECT itself in
                        # verbose mode — the client must drain this
                        # before counting publish confirmations
                        conn.sendall(b"+OK\r\n")
                    continue
                if line == b"PONG":
                    continue
                if line.startswith(b"HPUB "):
                    _, subject, hdr_len, total_len = line.decode().split(" ")
                    hdr_len, total_len = int(hdr_len), int(total_len)
                    blob = read_exact(total_len + 2)  # + trailing CRLF
                    hdr_block, payload = blob[:hdr_len], blob[hdr_len:total_len]
                    lines = hdr_block.decode().split("\r\n")
                    assert lines[0] == "NATS/1.0"
                    headers = dict(
                        l.split(": ", 1) for l in lines[1:] if l and ": " in l
                    )
                    with state.lock:
                        msg_id = headers.get("Nats-Msg-Id")
                        if state.dup_window and msg_id in state.seen_ids:
                            state.duplicates += 1  # deduped server-side
                        else:
                            if msg_id:
                                state.seen_ids.add(msg_id)
                            state.messages.append(
                                {"subject": subject, "headers": headers,
                                 "payload": payload.decode()}
                            )
                    conn.sendall(b"+OK\r\n")
                    continue
                conn.sendall(b"-ERR 'Unknown Protocol Operation'\r\n")
                return
        except (OSError, ConnectionError):
            pass

    def accept_loop():
        try:
            while True:
                conn, _ = srv.accept()
                threading.Thread(target=handle, args=(conn,), daemon=True).start()
        except OSError:
            pass

    threading.Thread(target=accept_loop, daemon=True).start()
    return port, srv


@pytest.fixture()
def nats_server():
    state = NatsServerState()
    port, srv = _nats_serve(state)
    yield port, state
    srv.close()


# ------------------------------------------------------------ fixtures


def _routed_events(spark, n=40):
    rows = [
        (i, f"ev-{i}", json.dumps({"i": i}),
         (f"stream-{i % 3}", f"k{i}", {"tenant": "t1"}),
         "t1", ("testdb", "events"), (str(900 + i),))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, name string, value string, "
              "routing struct<topic:string,key:string,headers:map<string,string>>, "
              "tenant_id string, source struct<db:string,table:string>, "
              "transaction struct<id:string>",
    )


# ---------------------------------------------------------------- tests


class TestRedisOverTcp:
    def test_xadd_pipeline_lands_reference_fields(self, spark, resp_server):
        port, state = resp_server
        df = _routed_events(spark).repartition(4)
        resp.redis_stream_sink_tcp(df, "127.0.0.1", port, batch_size=7)
        all_entries = [e for s in state.streams.values() for e in s]
        assert len(all_entries) == 40
        assert sorted(state.streams) == ["stream-0", "stream-1", "stream-2"]
        _eid, fields = state.streams["stream-1"][0]
        assert set(fields) == {"event_id", "idempotency_key", "df-event", "df-key", "df-headers"}
        assert json.loads(fields["df-headers"]) == {"tenant": "t1"}
        assert json.loads(fields["df-event"])  # payload is the value json

    def test_error_reply_fails_the_batch_loudly(self, spark, resp_server):
        port, state = resp_server
        state.fail_next = 1
        df = _routed_events(spark, n=5).coalesce(1)
        with pytest.raises(Exception, match="WRONGTYPE"):
            resp.redis_stream_sink_tcp(df, "127.0.0.1", port)

    def test_resp_reader_handles_split_replies(self):
        r = resp.RespReader()
        r.feed(b"$5\r\nhel")
        ok, _ = r.try_read()
        assert not ok
        r.feed(b"lo\r\n:42\r\n")
        ok, v = r.try_read()
        assert ok and v == b"hello"
        ok, v = r.try_read()
        assert ok and v == 42


class TestNatsOverTcp:
    def test_hpub_headers_and_ok_confirmation(self, spark, nats_server):
        port, state = nats_server
        df = _routed_events(spark).repartition(3)
        nc.nats_jetstream_sink_tcp(df, "127.0.0.1", port, default_subject="dl.events")
        assert len(state.messages) == 40
        msg = state.messages[0]
        assert msg["headers"]["Nats-Msg-Id"]
        assert msg["headers"]["df-key"].startswith("k")
        assert msg["headers"]["tenant"] == "t1"
        assert all(c.get("headers") for c in state.connects)  # headers negotiated

    def test_duplicate_window_dedup_on_replay(self, spark, nats_server):
        port, state = nats_server
        df = _routed_events(spark, n=10).coalesce(1)
        nc.nats_jetstream_sink_tcp(df, "127.0.0.1", port, default_subject="dl")
        nc.nats_jetstream_sink_tcp(df, "127.0.0.1", port, default_subject="dl")  # replay
        assert len(state.messages) == 10  # effectively-once via Nats-Msg-Id
        assert state.duplicates == 10

    def test_invalid_subject_strict_raises(self, spark, nats_server):
        port, _ = nats_server
        bad = spark.createDataFrame(
            [(1, "x", (None, None, None), "t1", ("d", "t"), ("1",))],
            "event_id long, value string, "
            "routing struct<topic:string,key:string,headers:map<string,string>>, "
            "tenant_id string, source struct<db:string,table:string>, "
            "transaction struct<id:string>",
        )
        with pytest.raises(Exception, match="invalid NATS subject"):
            nc.nats_jetstream_sink_tcp(bad, "127.0.0.1", port, default_subject="bad subject")

    def test_ping_interleave_answered(self, nats_server):
        port, state = nats_server
        sock = socket.create_connection(("127.0.0.1", port))
        client = nc.NatsClient(sock)
        # manually inject a PING ahead of the +OK drain
        client._buf += b"PING\r\n"
        client.hpub("s", {"Nats-Msg-Id": "m1"}, "p")
        client.flush()
        client.close()
        assert state.messages[-1]["payload"] == "p"


class TestClickhouseOverHttp:
    def test_insert_dedup_token_round_trip(self, spark):
        """write_clickhouse over the REAL HTTP interface: DDL lands as a
        POST body, each chunk posts JSONEachRow with its deterministic
        insert_deduplication_token, and a replayed batch with identical
        tokens is dropped server-side (the replay-idempotence contract
        the chunk tokens encode)."""
        from http.server import BaseHTTPRequestHandler, HTTPServer
        from urllib.parse import parse_qs, urlparse

        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            write_clickhouse,
        )

        state = {"ddl": [], "rows": [], "tokens": set(), "deduped": 0}
        lock = threading.Lock()

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode()
                qs = parse_qs(urlparse(self.path).query)
                with lock:
                    if "query" not in qs:
                        state["ddl"].append(body)
                    else:
                        token = qs["insert_deduplication_token"][0]
                        if token in state["tokens"]:
                            state["deduped"] += 1  # silently dropped, 200
                        else:
                            state["tokens"].add(token)
                            state["rows"].extend(
                                json.loads(l) for l in body.splitlines() if l.strip()
                            )
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{srv.server_port}"
            env = spark.createDataFrame(
                [("c", 1000 + i, i, f"n{i}") for i in range(20)],
                "op string, ts_ms long, id long, name string",
            ).selectExpr(
                "op", "ts_ms",
                "CASE WHEN op='d' THEN null ELSE named_struct('id', id, 'name', name) END AS after",
                "CAST(null AS struct<id:long,name:string>) AS before",
            )
            rows = clickhouse_rows(env, ["id", "name"])
            ddl = write_clickhouse(
                rows.coalesce(2),
                http_ch_transport_factory(url),
                database="dl", table="events", mode="changelog",
                pk=["id"], batch_id=7,
            )
            assert "CREATE TABLE IF NOT EXISTS `dl`.`events`" in ddl
            assert state["ddl"] and "`dl`.`events`" in state["ddl"][0]
            assert len(state["rows"]) == 20
            assert all(r["_op"] == "c" for r in state["rows"])
            # foreachBatch replay: identical batch_id → identical tokens
            write_clickhouse(
                rows.coalesce(2),
                http_ch_transport_factory(url),
                database="dl", table="events", mode="changelog",
                pk=["id"], batch_id=7, auto_create=False,
            )
            assert len(state["rows"]) == 20  # no duplicates
            assert state["deduped"] >= 1
        finally:
            srv.shutdown()


class TestWebhookOverHttp:
    def test_retry_on_500_then_success(self, spark):
        from http.server import BaseHTTPRequestHandler, HTTPServer

        hits = []

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                hits.append(body)
                code = 500 if len(hits) == 1 else 200
                self.send_response(code)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")

        srv = HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_port}/hook"
        try:
            from deltaforge_spark.sinks.clients import http_webhook_sink

            def session_factory():
                import urllib.request

                class _Resp:
                    def __init__(self, status):
                        self.status_code = status

                    def raise_for_status(self):
                        if self.status_code >= 400:
                            raise IOError(f"http {self.status_code}")

                class _Sess:
                    def request(self, method, dest, data=None):
                        req = urllib.request.Request(
                            dest, data=data.encode() if isinstance(data, str) else data,
                            method=method,
                        )
                        try:
                            with urllib.request.urlopen(req, timeout=5) as r:
                                return _Resp(r.status)
                        except urllib.error.HTTPError as e:
                            return _Resp(e.code)

                    def close(self):
                        pass

                import urllib.error

                return _Sess()

            from pyspark.sql import functions as F

            df = _routed_events(spark, n=6).coalesce(1).withColumn(
                "routing",
                F.struct(
                    F.lit(url).alias("topic"),
                    F.col("routing.key").alias("key"),
                    F.col("routing.headers").alias("headers"),
                ),
            )
            http_webhook_sink(
                df, url_template=url, batch_mode=True, session_factory=session_factory
            )
            # first POST got 500 → retried: ≥2 hits, last one the batch
            assert len(hits) >= 2
            assert len(json.loads(hits[-1])) == 6
        finally:
            srv.shutdown()
