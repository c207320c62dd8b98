"""The live schema loader end-to-end over REAL sockets: catalog
queries ride the actual DB query protocols — MySQL COM_QUERY with
text-protocol resultsets, PG simple-query ('Q'/'T'/'D'/'Z') — through
the authenticated sessions, feeding ``schema/catalog.py`` unchanged.
With this, the reference's mysql_schema_loader/postgres_schema_loader
path (connect → auth → INFORMATION_SCHEMA → registry) has no
unexercised layer left but a genuine DBMS.
"""

import socket
import struct
import threading

import pytest

import deltaforge_spark.sources.tailloop as tl
import deltaforge_spark.sources.wireclient as wc
from deltaforge_spark.schema.catalog import load_catalog
from test_catalog_loader import mysql_execute
from test_tail_sessions import (
    PASSWORD,
    USER,
    _mysql_auth_server_side,
    _recv_exact,
    _recv_mysql_packet,
    _send_mysql_packet,
    _serve,
)


def _lenenc_str(s: str) -> bytes:
    b = s.encode()
    assert len(b) < 0xFB
    return bytes([len(b)]) + b


def _column_def(name: str) -> bytes:
    """ColumnDefinition41 with the fixed tail the client skips."""
    out = bytearray()
    for s in ("def", "information_schema", "t", "t", name, name):
        out += _lenenc_str(s)
    out += bytes([0x0C])  # fixed-length fields length
    out += struct.pack("<H", 45)  # charset
    out += struct.pack("<I", 255)  # column length
    out += bytes([0xFD])  # type: VAR_STRING
    out += struct.pack("<H", 0)  # flags
    out += bytes([0])  # decimals
    out += b"\x00\x00"
    return bytes(out)


def _text_row(values) -> bytes:
    out = bytearray()
    for v in values:
        if v is None:
            out += b"\xfb"
        else:
            out += _lenenc_str(str(v))
    return bytes(out)


def _mysql_catalog_server():
    """Authenticated MySQL server answering COM_QUERY from the recorded
    INFORMATION_SCHEMA fixture via real text-protocol resultsets."""

    def handler(conn):
        caps = _mysql_auth_server_side(conn)
        if not caps:
            return
        # honor the NEGOTIATED resultset framing, like a real 8.0
        # server: DEPRECATE_EOF clients get no EOF after column
        # definitions and an OK(0xFE) terminator instead of EOF
        dep = bool(caps & wc.CLIENT_DEPRECATE_EOF)
        try:
            while True:
                _seq, payload = _recv_mysql_packet(conn)
                if payload[0] != wc.COM_QUERY:
                    _send_mysql_packet(conn, 1, b"\xff" + (1047).to_bytes(2, "little") + b"#08S01bad")
                    continue
                sql = payload[1:].decode()
                rows = mysql_execute(sql)
                names = list(rows[0].keys()) if rows else ["COLUMN_NAME"]
                sq = 1
                _send_mysql_packet(conn, sq, bytes([len(names)]))
                sq += 1
                for n in names:
                    _send_mysql_packet(conn, sq, _column_def(n))
                    sq += 1
                if not dep:
                    _send_mysql_packet(conn, sq, b"\xfe\x00\x00\x02\x00")
                    sq += 1
                for r in rows:
                    _send_mysql_packet(conn, sq, _text_row([r[n] for n in names]))
                    sq += 1
                if dep:
                    # OK packet with 0xFE header (DEPRECATE_EOF form)
                    _send_mysql_packet(conn, sq, b"\xfe\x00\x00\x02\x00\x00\x00")
                else:
                    _send_mysql_packet(conn, sq, b"\xfe\x00\x00\x02\x00")
        except (ConnectionError, OSError):
            pass

    return _serve(handler)


class TestMysqlCatalogOverWire:
    def test_load_catalog_through_com_query(self):
        port, _t = _mysql_catalog_server()

        def connect():
            return socket.create_connection(("127.0.0.1", port))

        execute = tl.mysql_catalog_execute(connect, USER, PASSWORD)
        cat = load_catalog(execute, ["shop.*"], "mysql")
        assert [(t.db, t.table) for t in cat] == [
            ("shop", "orders"), ("shop", "order_items"), ("shop", "customers")
        ]
        orders = cat[0]
        assert orders.primary_key == ["id"]
        # type mapping survives the text protocol (everything arrives
        # as strings; precision/scale re-parse)
        from pyspark.sql import types as T

        assert orders.schema["id"].dataType == T.DecimalType(20, 0)
        assert orders.schema["placed_at"].dataType == T.TimestampType()

    def test_query_error_is_loud(self):
        def handler(conn):
            if not _mysql_auth_server_side(conn):
                return
            _recv_mysql_packet(conn)
            _send_mysql_packet(
                conn, 1, b"\xff" + (1142).to_bytes(2, "little") + b"#42000SELECT denied"
            )

        port, _t = _serve(handler)
        execute = tl.mysql_catalog_execute(
            lambda: socket.create_connection(("127.0.0.1", port)), USER, PASSWORD
        )
        with pytest.raises(wc.WireClientError, match="1142"):
            execute("SELECT 1")

    def test_ok_packet_statement_returns_empty(self):
        def handler(conn):
            if not _mysql_auth_server_side(conn):
                return
            _recv_mysql_packet(conn)
            _send_mysql_packet(conn, 1, b"\x00\x00\x00\x02\x00\x00\x00")

        port, _t = _serve(handler)
        execute = tl.mysql_catalog_execute(
            lambda: socket.create_connection(("127.0.0.1", port)), USER, PASSWORD
        )
        assert execute("SET NAMES utf8mb4") == []


class TestPgSimpleQueryOverWire:
    def test_row_description_and_data_rows(self):
        from test_tail_sessions import _pg_read_startup, _pg_scram_server, _pg_send

        def handler(conn):
            params = _pg_read_startup(conn)
            assert b"replication" not in params  # plain catalog session
            if not _pg_scram_server(conn):
                return
            from test_tail_sessions import _pg_read_frontend

            tag, body = _pg_read_frontend(conn)
            assert tag == "Q" and b"information_schema.tables" in body
            # RowDescription: 2 columns
            rd = bytearray(struct.pack(">h", 2))
            for name in ("TABLE_SCHEMA", "TABLE_NAME"):
                rd += name.encode() + b"\x00"
                rd += struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)
            _pg_send(conn, "T", bytes(rd))
            for schema, table in (("public", "orders"), ("public", "items")):
                dr = bytearray(struct.pack(">h", 2))
                for v in (schema, table):
                    dr += struct.pack(">i", len(v)) + v.encode()
                _pg_send(conn, "D", bytes(dr))
            _pg_send(conn, "C", b"SELECT 2\x00")
            _pg_send(conn, "Z", b"I")

        port, _t = _serve(handler)
        execute = tl.pg_catalog_execute(
            lambda: socket.create_connection(("127.0.0.1", port)),
            "repl", "pgpass", "appdb",
        )
        rows = execute(
            'SELECT table_schema AS "TABLE_SCHEMA", table_name AS "TABLE_NAME" '
            "FROM information_schema.tables WHERE table_type = 'BASE TABLE'"
        )
        assert rows == [
            {"TABLE_SCHEMA": "public", "TABLE_NAME": "orders"},
            {"TABLE_SCHEMA": "public", "TABLE_NAME": "items"},
        ]

    def test_null_values_round_trip(self):
        from test_tail_sessions import _pg_read_startup, _pg_scram_server, _pg_send

        def handler(conn):
            _pg_read_startup(conn)
            if not _pg_scram_server(conn):
                return
            from test_tail_sessions import _pg_read_frontend

            _pg_read_frontend(conn)
            rd = bytearray(struct.pack(">h", 1))
            rd += b"NUMERIC_SCALE\x00" + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)
            _pg_send(conn, "T", bytes(rd))
            _pg_send(conn, "D", struct.pack(">h", 1) + struct.pack(">i", -1))
            _pg_send(conn, "C", b"SELECT 1\x00")
            _pg_send(conn, "Z", b"I")

        port, _t = _serve(handler)
        execute = tl.pg_catalog_execute(
            lambda: socket.create_connection(("127.0.0.1", port)),
            "repl", "pgpass", "appdb",
        )
        assert execute("SELECT numeric_scale ...") == [{"NUMERIC_SCALE": None}]
