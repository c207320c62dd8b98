"""Socket-level chaos — the reference chaos crate's scenarios that need
a live wire to mean anything (crates/chaos/src/scenarios/mod.rs):
network_partition (torn frames mid-event), slot_dropped (fatal, never
retried), sr_outage (5xx blips retried + cache carries the hot path),
ch_outage (failed insert replays; dedup tokens keep exactly-once).
"""

import json
import socket
import struct
import threading

import pytest

import deltaforge_spark.sources.binlog as bl
import deltaforge_spark.sources.tailloop as tl
import deltaforge_spark.sources.wireclient as wc
from test_tail_sessions import (
    PASSWORD,
    USER,
    _events_of,
    _mysql_auth_server_side,
    _read_command,
    _recv_exact,
    _segment,
    _send_mysql_packet,
    _serve,
)


class TestNetworkPartition:
    def test_partition_mid_frame_never_emits_torn_event(self):
        """The partition cuts INSIDE an event frame: the client must
        (a) not emit the torn event, (b) reconnect, (c) resume from the
        last committed GTID — and the total decoded stream equals the
        unpartitioned one."""
        seg = _segment(gnos=(5, 6))
        events = _events_of(seg)
        fde, tx1, tx2 = events[0], events[1:5], events[5:]
        # frame bytes for tx2's first event, cut mid-way
        torn = (b"\x00" + tx2[0])[: 10]

        state = {"accepts": 0}

        def handler(conn):
            state["accepts"] += 1
            if not _mysql_auth_server_side(conn):
                return
            _read_command(conn)  # REGISTER_SLAVE
            _send_mysql_packet(conn, 1, b"\x00\x00\x00\x02\x00\x00\x00")
            cmd = _read_command(conn)
            if state["accepts"] == 1:
                sq = 1
                for ev in [fde] + tx1:
                    _send_mysql_packet(conn, sq, b"\x00" + ev)
                    sq += 1
                # half a packet header+frame, then the partition hits
                conn.sendall(len(b"\x00" + tx2[0]).to_bytes(3, "little") + bytes([sq]) + torn)
                conn.close()
                return False
            assert cmd[0] == wc.COM_BINLOG_DUMP_GTID  # resumed by checkpoint
            sq = 1
            for ev in [fde] + tx2:
                _send_mysql_packet(conn, sq, b"\x00" + ev)
                sq += 1
            _send_mysql_packet(conn, sq, b"\xfe\x00\x00")

        port, _t = _serve(handler)

        def connect():
            return socket.create_connection(("127.0.0.1", port))

        rows = [
            e for e in tl.tail_binlog(
                connect, USER, PASSWORD, server_id=3,
                columns_by_table={("d", "t"): ["v"]},
            )
            if e["kind"] == "rows"
        ]
        assert [r["rows"][0]["after"] for r in rows] == [{"v": 500}, {"v": 600}]
        assert [r["xid"] for r in rows] == [905, 906]
        assert state["accepts"] == 2


class TestSlotDropped:
    def test_slot_dropped_is_fatal_not_retried(self):
        """A replication ERROR (missing slot) must stop the loop
        immediately — retrying cannot recreate a dropped slot, and
        looping would silently mask the data gap (the reference's
        slot_dropped scenario: hard stop → operator re-snapshots)."""
        from test_tail_sessions import _pg_read_startup, _pg_scram_server, _pg_send

        state = {"accepts": 0}

        def handler(conn):
            state["accepts"] += 1
            _pg_read_startup(conn)
            if not _pg_scram_server(conn):
                return
            # START_REPLICATION arrives; slot is gone
            from test_tail_sessions import _pg_read_frontend

            _pg_read_frontend(conn)
            _pg_send(conn, "E", b"SERROR\x00C42704\x00Mreplication slot \"s1\" does not exist\x00\x00")

        port, _t = _serve(handler)

        def connect():
            return socket.create_connection(("127.0.0.1", port))

        with pytest.raises(wc.WireClientError, match="does not exist"):
            list(
                tl.tail_pgoutput(
                    connect, "repl", "pgpass",
                    database="d", slot="s1", publication="p",
                    max_reconnects=5,
                )
            )
        assert state["accepts"] == 1  # no retry loop on a fatal error


class TestSrOutage:
    def test_5xx_blips_retry_and_cache_carries_hot_path(self):
        from http.server import BaseHTTPRequestHandler, HTTPServer

        from deltaforge_spark.sinks.sr_http import HttpSchemaRegistry, SchemaRegistryError

        state = {"hits": 0, "fail_next": 2}

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                self.rfile.read(n)
                state["hits"] += 1
                if state["fail_next"] > 0:
                    state["fail_next"] -= 1
                    self.send_response(503)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = json.dumps({"id": 1}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            sr = HttpSchemaRegistry(f"http://127.0.0.1:{srv.server_port}")
            schema = {"type": "record", "name": "R", "fields": []}
            assert sr.register("s-value", schema) == 1  # survived two 503s
            assert state["hits"] == 3
            # total outage AFTER registration: the cache serves the id,
            # no request is even made
            state["fail_next"] = 10**9
            assert sr.register("s-value", schema) == 1
            assert state["hits"] == 3
            # a NEW subject during a hard outage fails loudly after retries
            sr2 = HttpSchemaRegistry(
                f"http://127.0.0.1:{srv.server_port}", max_retries=2, backoff_s=0.01
            )
            with pytest.raises(SchemaRegistryError, match="still failing"):
                sr2.register("other-value", schema)
        finally:
            srv.shutdown()


class TestChOutage:
    def test_failed_insert_replays_exactly_once_via_tokens(self, spark):
        """ch_outage: the FIRST insert chunk 500s mid-batch → the batch
        raises → foreachBatch replays the whole batch with IDENTICAL
        dedup tokens → rows land exactly once."""
        from http.server import BaseHTTPRequestHandler, HTTPServer
        from urllib.parse import parse_qs, urlparse

        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            write_clickhouse,
        )

        state = {"rows": [], "tokens": set(), "deduped": 0, "fail_next": 1}
        lock = threading.Lock()

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode()
                qs = parse_qs(urlparse(self.path).query)
                with lock:
                    if "query" in qs and state["fail_next"] > 0:
                        state["fail_next"] -= 1
                        self.send_response(500)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    if "query" in qs:
                        token = qs["insert_deduplication_token"][0]
                        if token in state["tokens"]:
                            state["deduped"] += 1
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
                [("c", 1000 + i, i, f"n{i}") for i in range(12)],
                "op string, ts_ms long, id long, name string",
            ).selectExpr(
                "op", "ts_ms",
                "named_struct('id', id, 'name', name) AS after",
                "CAST(null AS struct<id:long,name:string>) AS before",
            )
            rows = clickhouse_rows(env, ["id", "name"]).coalesce(1)
            with pytest.raises(Exception):
                write_clickhouse(
                    rows, http_ch_transport_factory(url),
                    database="dl", table="t", pk=["id"],
                    batch_id=3, auto_create=False,
                )
            n_after_crash = len(state["rows"])
            # replay: same batch_id → same tokens
            write_clickhouse(
                rows, http_ch_transport_factory(url),
                database="dl", table="t", pk=["id"],
                batch_id=3, auto_create=False,
            )
            assert len(state["rows"]) == 12
            assert state["deduped"] == (1 if n_after_crash else 0)
        finally:
            srv.shutdown()
