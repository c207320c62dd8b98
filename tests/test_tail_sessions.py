"""End-to-end tail sessions over REAL loopback TCP sockets against
synthetic protocol servers (sources/tailloop.py): MySQL handshake →
auth-verify → REGISTER_SLAVE → BINLOG_DUMP → decoded rows, and PG
startup → full server-side-verified SCRAM-SHA-256 → START_REPLICATION
→ CopyBoth walreceive with standby-status feedback. The servers here
VERIFY the client's auth tokens (recomputing scrambles/proofs
server-side), so these are mutual-auth conversations, not echo stubs.
Reconnect tests kill the server mid-stream and assert checkpoint-based
resume. The only thing not covered is a genuine DBMS peer.
"""

import base64
import hashlib
import hmac
import json
import socket
import struct
import threading

import pytest

import deltaforge_spark.sources.binlog as bl
import deltaforge_spark.sources.pgoutput as pg
import deltaforge_spark.sources.tailloop as tl
import deltaforge_spark.sources.wireclient as wc

# ------------------------------------------------------------- helpers


def _serve(handler):
    """One-shot (or multi-accept) TCP server on an ephemeral loopback
    port; returns (port, thread). handler(conn) runs per accept."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]

    def run():
        try:
            while True:
                conn, _ = srv.accept()
                try:
                    if handler(conn) is False:
                        continue
                    break
                finally:
                    try:
                        conn.close()
                    except OSError:
                        pass
        except OSError:
            pass
        finally:
            srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return port, t


def _recv_mysql_packet(conn):
    hdr = _recv_exact(conn, 4)
    return hdr[3], _recv_exact(conn, int.from_bytes(hdr[0:3], "little"))


def _recv_exact(conn, n):
    buf = bytearray()
    while len(buf) < n:
        c = conn.recv(n - len(buf))
        if not c:
            raise ConnectionError("peer closed")
        buf += c
    return bytes(buf)


def _send_mysql_packet(conn, seq, payload):
    conn.sendall(len(payload).to_bytes(3, "little") + bytes([seq]) + payload)


SCRAMBLE = bytes(range(40, 60))
USER, PASSWORD = "repl", "s3cret"


def _greeting():
    caps = 0xFFFFFFFF
    out = bytearray(b"\x0a8.0.36\x00")
    out += struct.pack("<I", 7)
    out += SCRAMBLE[:8] + b"\x00"
    out += struct.pack("<H", caps & 0xFFFF)
    out += bytes([45])
    out += struct.pack("<H", 2)
    out += struct.pack("<H", caps >> 16)
    out += bytes([21]) + b"\x00" * 10
    out += SCRAMBLE[8:] + b"\x00"
    out += b"mysql_native_password\x00"
    return bytes(out)


def _segment(gnos=(5,)):
    w = bl.SegmentWriter(server_id=11)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    types, metas = [bl.MYSQL_TYPE_LONG], [0]
    for g in gnos:
        w.append(bl.GTID_LOG_EVENT, bl.gtid_payload(bytes(16), g))
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(42, "d", "t", types, metas, [False]))
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(42, 1, [[g * 100]], types, metas))
        w.append(bl.XID_EVENT, bl.xid_payload(900 + g))
    return w.bytes()


def _events_of(segment):
    out, off = [], len(bl.MAGIC)
    while off < len(segment):
        size = struct.unpack_from("<IBIIIH", segment, off)[3]
        out.append(segment[off : off + size])
        off += size
    return out


def _mysql_auth_server_side(conn):
    """Greeting + response verification (server recomputes the expected
    token from the stored SHA1(SHA1(password)) — real verify, not
    echo). Returns the client's advertised capability flags (truthy)
    on success so servers can honor negotiated framing (DEPRECATE_EOF),
    False on rejection."""
    _send_mysql_packet(conn, 0, _greeting())
    seq, resp = _recv_mysql_packet(conn)
    assert seq == 1
    client_caps = struct.unpack_from("<I", resp, 0)[0]
    rest = resp[32:]
    user, rest = rest.split(b"\x00", 1)
    alen = rest[0]
    token = rest[1 : 1 + alen]
    h1h1 = hashlib.sha1(hashlib.sha1(PASSWORD.encode()).digest()).digest()
    expected_h1 = bytes(
        a ^ b for a, b in zip(token, hashlib.sha1(SCRAMBLE + h1h1).digest())
    )
    if user != USER.encode() or hashlib.sha1(expected_h1).digest() != h1h1:
        _send_mysql_packet(conn, 2, b"\xff" + (1045).to_bytes(2, "little") + b"#28000Access denied")
        return False
    _send_mysql_packet(conn, 2, b"\x00\x00\x00\x02\x00\x00\x00")
    return client_caps


def _read_command(conn):
    seq, payload = _recv_mysql_packet(conn)
    return payload


# ------------------------------------------------------ MySQL sessions


class TestMysqlLiveSession:
    def test_full_session_over_loopback_tcp(self):
        seg = _segment(gnos=(5, 6))

        def handler(conn):
            if not _mysql_auth_server_side(conn):
                return
            cmd = _read_command(conn)
            assert cmd[0] == wc.COM_REGISTER_SLAVE
            _send_mysql_packet(conn, 1, b"\x00\x00\x00\x02\x00\x00\x00")
            cmd = _read_command(conn)
            assert cmd[0] == wc.COM_BINLOG_DUMP
            sq = 1
            for ev in _events_of(seg):
                _send_mysql_packet(conn, sq, b"\x00" + ev)
                sq = (sq + 1) % 256
            _send_mysql_packet(conn, sq, b"\xfe\x00\x00")  # orderly EOF

        port, _t = _serve(handler)
        sock = socket.create_connection(("127.0.0.1", port))
        events = [
            e for e in tl.mysql_binlog_session(
                sock, USER, PASSWORD, server_id=3,
                columns_by_table={("d", "t"): ["v"]},
            )
            if e["kind"] != "_checkpoint"
        ]
        sock.close()
        rows = [e for e in events if e["kind"] == "rows"]
        assert [r["rows"][0]["after"] for r in rows] == [{"v": 500}, {"v": 600}]
        assert [r["xid"] for r in rows] == [905, 906]

    def test_wrong_password_is_rejected_by_server_verify(self):
        port, _t = _serve(lambda conn: _mysql_auth_server_side(conn))
        sock = socket.create_connection(("127.0.0.1", port))
        with pytest.raises(wc.WireClientError, match="1045"):
            list(tl.mysql_binlog_session(sock, USER, "wrong", server_id=3))
        sock.close()

    def test_reconnect_resumes_from_gtid_checkpoint(self):
        """Server kills the connection after the first committed tx;
        the reconnect loop must re-dial with COM_BINLOG_DUMP_GTID
        carrying gno 5 as executed, and the second serve starts at tx 6."""
        seg_all = _segment(gnos=(5, 6))
        events = _events_of(seg_all)
        fde, tx1, tx2 = events[0], events[1:5], events[5:]
        seen_gtid_dump = {}

        state = {"accepts": 0}

        def handler(conn):
            state["accepts"] += 1
            if not _mysql_auth_server_side(conn):
                return
            _read_command(conn)  # REGISTER_SLAVE
            _send_mysql_packet(conn, 1, b"\x00\x00\x00\x02\x00\x00\x00")
            cmd = _read_command(conn)
            if state["accepts"] == 1:
                assert cmd[0] == wc.COM_BINLOG_DUMP
                sq = 1
                for ev in [fde] + tx1:
                    _send_mysql_packet(conn, sq, b"\x00" + ev)
                    sq += 1
                conn.close()  # mid-stream kill
                return False  # keep accepting
            assert cmd[0] == wc.COM_BINLOG_DUMP_GTID
            # layout: cmd(1) flags(2) server_id(4) name_len(4) pos(8)
            # data_len(4) → gtid data at 23: n_sids u64, uuid 16B,
            # n_intervals u64, then (start, end_exclusive) pairs
            seen_gtid_dump["n_sids"] = struct.unpack_from("<Q", cmd, 23)[0]
            seen_gtid_dump["first_iv"] = struct.unpack_from("<QQ", cmd, 55)
            sq = 1
            for ev in [fde] + tx2:
                _send_mysql_packet(conn, sq, b"\x00" + ev)
                sq += 1
            _send_mysql_packet(conn, sq, b"\xfe\x00\x00")  # orderly EOF

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
        # the resume request carried tx 5 as executed (end-exclusive 6)
        assert seen_gtid_dump == {"n_sids": 1, "first_iv": (5, 6)}

    def test_reconnect_budget_exhausts_loudly(self):
        def handler(conn):
            if not _mysql_auth_server_side(conn):
                return
            conn.close()
            return False

        port, _t = _serve(handler)

        def connect():
            return socket.create_connection(("127.0.0.1", port))

        with pytest.raises(bl.BinlogError, match="giving up after 2"):
            list(tl.tail_binlog(connect, USER, PASSWORD, server_id=3, max_reconnects=2))


# --------------------------------------------------------- PG sessions


def _pg_read_startup(conn):
    ln = struct.unpack(">I", _recv_exact(conn, 4))[0]
    return _recv_exact(conn, ln - 4)


def _pg_read_frontend(conn):
    tag = _recv_exact(conn, 1)
    ln = struct.unpack(">I", _recv_exact(conn, 4))[0]
    return tag.decode(), _recv_exact(conn, ln - 4)


def _pg_send(conn, tag, body):
    conn.sendall(tag.encode() + struct.pack(">I", len(body) + 4) + body)


def _pg_scram_server(conn, password="pgpass"):
    """Full server-side SCRAM-SHA-256: verifies the client proof by
    recomputing StoredKey, answers with the real server signature."""
    _pg_send(conn, "R", struct.pack(">I", tl.AUTH_SASL) + b"SCRAM-SHA-256\x00\x00")
    tag, body = _pg_read_frontend(conn)
    assert tag == "p"
    mech, rest = body.split(b"\x00", 1)
    assert mech == b"SCRAM-SHA-256"
    cf_len = struct.unpack(">I", rest[:4])[0]
    client_first = rest[4 : 4 + cf_len].decode()
    assert client_first.startswith("n,,")
    cf_bare = client_first[3:]
    cnonce = dict(kv.split("=", 1) for kv in cf_bare.split(","))["r"]
    snonce = cnonce + "SRVEXT"
    salt = b"0123456789abcdef"
    iters = 4096
    server_first = f"r={snonce},s={base64.b64encode(salt).decode()},i={iters}"
    _pg_send(conn, "R", struct.pack(">I", tl.AUTH_SASL_CONTINUE) + server_first.encode())
    tag, body = _pg_read_frontend(conn)
    assert tag == "p"
    client_final = body.decode()
    attrs = dict(kv.split("=", 1) for kv in client_final.split(","))
    assert attrs["r"] == snonce
    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
    client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
    stored_key = hashlib.sha256(client_key).digest()
    without_proof = client_final.rsplit(",p=", 1)[0]
    auth_msg = f"{cf_bare},{server_first},{without_proof}".encode()
    sig = hmac.new(stored_key, auth_msg, hashlib.sha256).digest()
    recovered_key = bytes(
        a ^ b for a, b in zip(base64.b64decode(attrs["p"]), sig)
    )
    if hashlib.sha256(recovered_key).digest() != stored_key:
        _pg_send(conn, "R", struct.pack(">I", tl.AUTH_SASL_FINAL) + b"e=invalid-proof")
        return False
    server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
    v = base64.b64encode(hmac.new(server_key, auth_msg, hashlib.sha256).digest())
    _pg_send(conn, "R", struct.pack(">I", tl.AUTH_SASL_FINAL) + b"v=" + v)
    _pg_send(conn, "R", struct.pack(">I", tl.AUTH_OK))
    _pg_send(conn, "Z", b"I")
    return True


class TestPgLiveSession:
    def test_scram_session_streams_and_feeds_back_lsn(self):
        statuses = []

        def handler(conn):
            params = _pg_read_startup(conn)
            assert b"replication\x00database\x00" in params
            if not _pg_scram_server(conn):
                return
            tag, body = _pg_read_frontend(conn)
            assert tag == "Q" and b"START_REPLICATION SLOT s1 LOGICAL" in body
            _pg_send(conn, "W", b"\x00\x00\x00")
            begin = pg.encode_begin(1050, 7, 41)
            ins = pg.encode_insert(1, ["9", "x"])
            commit = pg.encode_commit(1050, 1060, 7)
            rel = pg.encode_relation(1, "public", "t", [("id", 20, -1, 1), ("v", 25, -1, 0)])
            for lsn, m in ((1005, rel), (1010, begin), (1040, ins), (1060, commit)):
                _pg_send(conn, "d", pg.encode_xlogdata(lsn - 5, lsn, 0, m))
            # keepalive demanding a reply: client must answer 'r' with
            # flushed == the commit end_lsn
            _pg_send(conn, "d", pg.encode_keepalive(1070, 0, reply_requested=True))
            tag, body = _pg_read_frontend(conn)
            assert tag == "d" and body[0:1] == b"r"
            statuses.append(
                {
                    "written": int.from_bytes(body[1:9], "big"),
                    "flushed": int.from_bytes(body[9:17], "big"),
                }
            )
            _pg_send(conn, "c", b"")

        port, _t = _serve(handler)
        sock = socket.create_connection(("127.0.0.1", port))
        out = list(
            tl.pg_replication_session(
                sock, "repl", "pgpass",
                database="appdb", slot="s1", publication="pub1",
            )
        )
        sock.close()
        kinds = [
            o["message"]["kind"] for o in out if o["kind"] == "xlogdata"
        ]
        assert kinds == ["relation", "begin", "insert", "commit"]
        assert out[-1]["kind"] == "keepalive"
        assert statuses == [{"written": 1070, "flushed": 1060}]

    def test_wrong_password_fails_proof_verification(self):
        port, _t = _serve(lambda conn: (_pg_read_startup(conn), _pg_scram_server(conn)))
        sock = socket.create_connection(("127.0.0.1", port))
        with pytest.raises(wc.WireClientError, match="rejected"):
            list(
                tl.pg_replication_session(
                    sock, "repl", "WRONG",
                    database="appdb", slot="s1", publication="p",
                )
            )
        sock.close()

    def test_md5_auth_path(self):
        def handler(conn):
            _pg_read_startup(conn)
            salt = b"\x09\x08\x07\x06"
            _pg_send(conn, "R", struct.pack(">I", tl.AUTH_MD5) + salt)
            tag, body = _pg_read_frontend(conn)
            inner = hashlib.md5(b"pgpassrepl").hexdigest()
            expect = ("md5" + hashlib.md5(inner.encode() + salt).hexdigest()).encode() + b"\x00"
            assert body == expect
            _pg_send(conn, "R", struct.pack(">I", tl.AUTH_OK))
            _pg_send(conn, "Z", b"I")
            _pg_read_frontend(conn)  # Query
            _pg_send(conn, "W", b"\x00\x00\x00")
            _pg_send(conn, "c", b"")

        port, _t = _serve(handler)
        sock = socket.create_connection(("127.0.0.1", port))
        out = list(
            tl.pg_replication_session(
                sock, "repl", "pgpass", database="d", slot="s", publication="p"
            )
        )
        sock.close()
        assert out == []  # clean CopyDone, auth path exercised

    def test_reconnect_resumes_from_flushed_lsn(self):
        state = {"accepts": 0, "resume_lsns": []}

        def handler(conn):
            state["accepts"] += 1
            _pg_read_startup(conn)
            if not _pg_scram_server(conn):
                return
            tag, body = _pg_read_frontend(conn)
            lsn_txt = body.split(b"LOGICAL ", 1)[1].split(b" ", 1)[0].decode()
            hi, lo = lsn_txt.split("/")
            state["resume_lsns"].append((int(hi, 16) << 32) | int(lo, 16))
            _pg_send(conn, "W", b"\x00\x00\x00")
            if state["accepts"] == 1:
                b1 = pg.encode_begin(1050, 7, 41)
                c1 = pg.encode_commit(1050, 1060, 7)
                _pg_send(conn, "d", pg.encode_xlogdata(1000, 1010, 0, b1))
                _pg_send(conn, "d", pg.encode_xlogdata(1010, 1060, 0, c1))
                conn.close()  # kill mid-stream after one committed tx
                return False
            b2 = pg.encode_begin(2050, 8, 42)
            c2 = pg.encode_commit(2050, 2060, 8)
            _pg_send(conn, "d", pg.encode_xlogdata(2000, 2010, 0, b2))
            _pg_send(conn, "d", pg.encode_xlogdata(2010, 2060, 0, c2))
            _pg_send(conn, "c", b"")

        port, _t = _serve(handler)

        def connect():
            return socket.create_connection(("127.0.0.1", port))

        out = list(
            tl.tail_pgoutput(
                connect, "repl", "pgpass",
                database="d", slot="s", publication="p",
            )
        )
        commits = [o["message"]["end_lsn"] for o in out
                   if o["kind"] == "xlogdata" and o["message"]["kind"] == "commit"]
        assert commits == [1060, 2060]
        assert state["resume_lsns"] == [0, 1060]  # second dial resumed at flush
