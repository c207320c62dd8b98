"""Live tail session loops — the connection-management layer that was
env-bounded until now (reference mysql/mod.rs:113-382 connect →
register → dump → pump; postgres/mod.rs:64-120 startup → auth →
START_REPLICATION → walreceive). Built on the protocol pieces that are
already byte-verified (wireclient.py auth + requests,
binlog.MysqlPacketStream/BinlogTailer, pgoutput.ReplicationStream) and
a SOCKET-SHAPED seam: anything with ``recv``/``sendall``/``close``
works, so the test suite drives these loops over real loopback TCP
against synthetic servers — the only untestable element left in the
sandbox is a genuine DBMS peer.

Reconnect policy mirrors the reference's source restart: on a
connection error the session resumes FROM ITS CHECKPOINT (GTID set /
flushed LSN), not from where the read buffer happened to be —
at-least-once at transaction granularity, with the decoder's
idempotence keys doing the dedup downstream.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Iterator

from .binlog import BinlogError, BinlogTailer, MysqlPacketStream
from .gtid import GtidSet
from .pgoutput import PgoutputError, ReplicationStream, parse_message
from .wireclient import (
    AUTH_MORE_DATA,
    CLIENT_DEPRECATE_EOF,
    FAST_AUTH_SUCCESS,
    PERFORM_FULL_AUTH,
    REQUEST_PUBLIC_KEY,
    WireClientError,
    build_binlog_dump,
    build_binlog_dump_gtid,
    build_frontend_message,
    build_handshake_response,
    build_register_slave,
    build_sasl_initial_response,
    build_start_replication,
    build_startup_message,
    encode_gtid_set,
    md5_auth_response,
    negotiated_capabilities,
    parse_backend_message,
    parse_handshake_v10,
    parse_rsa_public_key_pem,
    rsa_oaep_encrypt,
    xor_password_nonce,
    ScramClient,
)

RECV_SIZE = 1 << 16


# ------------------------------------------------------------- MySQL


def _recv_packet(sock) -> tuple[int, bytes]:
    """One MySQL protocol packet (blocking read until complete)."""
    hdr = _recv_exact(sock, 4)
    plen = int.from_bytes(hdr[0:3], "little")
    return hdr[3], _recv_exact(sock, plen)


def _send_packet(sock, seq: int, payload: bytes) -> None:
    sock.sendall(len(payload).to_bytes(3, "little") + bytes([seq]) + payload)


def _recv_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(RECV_SIZE, n - len(buf)))
        if not chunk:
            raise BinlogError("connection closed mid-read")
        buf += chunk
    return bytes(buf)


def _expect_ok(sock, what: str) -> None:
    _seq, payload = _recv_packet(sock)
    if payload[:1] == b"\xff":
        code = int.from_bytes(payload[1:3], "little")
        raise WireClientError(f"{what} failed: server error {code}")
    if payload[:1] not in (b"\x00", b"\xfe"):
        raise WireClientError(f"{what}: unexpected reply marker {payload[:1]!r}")


def mysql_authenticate(sock, user: str, password: str, *, database: str = "") -> dict[str, Any]:
    """Handshake + auth over an open socket. Returns the parsed server
    greeting augmented with the NEGOTIATED capability view (key
    ``deprecate_eof``) — resultset framing must key off this, not the
    client-side constant. caching_sha2 covers both paths: fast-path
    scramble, and on cache miss the full authentication exchange
    (request server RSA key → send RSA-OAEP(password XOR nonce)) that
    a real MySQL 8 server demands on a user's first connect."""
    seq, greeting = _recv_packet(sock)
    if greeting[:1] == b"\xff":
        code = int.from_bytes(greeting[1:3], "little")
        raise WireClientError(f"server refused connection: error {code}")
    hs = parse_handshake_v10(greeting)
    _send_packet(sock, seq + 1, build_handshake_response(hs, user, password, database=database))
    fseq, final = _recv_packet(sock)
    if final[:1] == b"\xff":
        code = int.from_bytes(final[1:3], "little")
        raise WireClientError(f"auth rejected: server error {code}")
    if final[:1] == b"\x01":  # AuthMoreData (caching_sha2)
        if final[1:2] == bytes([FAST_AUTH_SUCCESS]):  # → OK follows
            _expect_ok(sock, "caching_sha2 fast auth")
        elif final[1:2] == bytes([PERFORM_FULL_AUTH]):
            _caching_sha2_full_auth(sock, fseq + 1, password, hs["scramble"][:20])
        else:
            raise WireClientError(
                f"unexpected caching_sha2 continuation {final[1:2]!r}"
            )
    elif final[:1] != b"\x00":
        raise WireClientError(f"unexpected auth reply {final[:1]!r}")
    caps = negotiated_capabilities(hs, database=database)
    hs["negotiated_capabilities"] = caps
    hs["deprecate_eof"] = bool(caps & CLIENT_DEPRECATE_EOF)
    return hs


def _caching_sha2_full_auth(sock, seq: int, password: str, nonce: bytes) -> None:
    """Non-TLS full authentication: 0x02 public-key request →
    AuthMoreData(PEM) → RSA-OAEP(password XOR nonce) → OK. An empty
    password short-circuits with a bare NUL (servers accept it without
    the RSA round-trip)."""
    if not password:
        _send_packet(sock, seq, b"\x00")
        _expect_ok(sock, "caching_sha2 full auth (empty password)")
        return
    _send_packet(sock, seq, bytes([REQUEST_PUBLIC_KEY]))
    kseq, keypkt = _recv_packet(sock)
    if keypkt[:1] == b"\xff":
        code = int.from_bytes(keypkt[1:3], "little")
        raise WireClientError(f"public key request rejected: server error {code}")
    if keypkt[:1] != bytes([AUTH_MORE_DATA]):
        raise WireClientError(f"expected AuthMoreData public key, got {keypkt[:1]!r}")
    n, e = parse_rsa_public_key_pem(keypkt[1:])
    _send_packet(sock, kseq + 1, rsa_oaep_encrypt(xor_password_nonce(password, nonce), n, e))
    _expect_ok(sock, "caching_sha2 full auth")


def mysql_binlog_session(
    sock,
    user: str,
    password: str,
    *,
    server_id: int,
    checkpoint: str | None = None,
    columns_by_table: dict[tuple[str, str], list[str]] | None = None,
    file: str = "",
    pos: int = 4,
) -> Iterator[dict[str, Any]]:
    """One authenticated dump session: handshake → REGISTER_SLAVE →
    COM_BINLOG_DUMP(_GTID) → yield decoded events forever (until the
    peer closes). ``checkpoint`` (a ``BinlogTailer.checkpoint()`` JSON)
    switches to GTID auto-position resume."""
    mysql_authenticate(sock, user, password)
    _send_packet(sock, 0, build_register_slave(server_id))
    _expect_ok(sock, "REGISTER_SLAVE")
    if checkpoint:
        cp = json.loads(checkpoint)
        gs = GtidSet.parse(cp.get("gtid_set") or "")
        _send_packet(sock, 0, build_binlog_dump_gtid(server_id, encode_gtid_set(gs.intervals)))
        tailer = BinlogTailer(columns_by_table, mode="stream", file=cp.get("file", ""))
        tailer.position.gtid_set = cp.get("gtid_set", "")
        tailer.position.pos = int(cp.get("pos", 0))
    else:
        _send_packet(sock, 0, build_binlog_dump(server_id, file=file, pos=pos))
        tailer = BinlogTailer(columns_by_table, mode="stream", file=file)
    pkts = MysqlPacketStream()
    while True:
        try:
            chunk = sock.recv(RECV_SIZE)
        except OSError as e:
            raise BinlogError(f"connection lost: {e}") from e
        if not chunk:
            # a close WITHOUT the protocol's EOF packet is a dropped
            # connection, not an orderly end — callers must resume from
            # checkpoint, not conclude the stream is done
            raise BinlogError("connection closed mid-stream (no EOF packet)")
        for frame in pkts.feed(chunk):
            yield from tailer.feed(frame)
        yield {"kind": "_checkpoint", "checkpoint": tailer.checkpoint()}
        if pkts.eof:
            return


def tail_binlog(
    connect: Callable[[], Any],
    user: str,
    password: str,
    *,
    server_id: int,
    checkpoint: str | None = None,
    columns_by_table: dict[tuple[str, str], list[str]] | None = None,
    max_reconnects: int = 3,
) -> Iterator[dict[str, Any]]:
    """The reconnect loop: a dropped connection re-dials and resumes
    from the LAST checkpoint the caller saw (GTID auto-position).
    ``connect`` returns a fresh connected socket — injectable, so tests
    dial loopback and chaos tests kill mid-stream."""
    attempts = 0
    while True:
        sock = connect()
        try:
            for ev in mysql_binlog_session(
                sock, user, password,
                server_id=server_id, checkpoint=checkpoint,
                columns_by_table=columns_by_table,
            ):
                if ev["kind"] == "_checkpoint":
                    checkpoint = ev["checkpoint"]
                    attempts = 0  # progress resets the retry budget
                yield ev
            return
        except (BinlogError, OSError) as e:
            attempts += 1
            if attempts > max_reconnects:
                raise BinlogError(
                    f"giving up after {max_reconnects} reconnects: {e}"
                ) from e
        finally:
            try:
                sock.close()
            except OSError:
                pass


def mysql_query(sock, sql: str, *, deprecate_eof: bool = False) -> list[dict[str, Any]]:
    """COM_QUERY over an authenticated connection — the transport
    mysql_schema_loader.rs gets from its client crate. Returns
    name→string-value dicts (catalog queries are string-shaped; typed
    conversion belongs to the caller).

    Framing follows the NEGOTIATED capabilities (pass the
    ``deprecate_eof`` from ``mysql_authenticate``):

    - legacy: column count → ColumnDefinition41 × n → EOF → text
      rows → EOF (0xFE, len < 9)
    - DEPRECATE_EOF (5.7.5+): no EOF after column definitions; the
      terminator is an OK packet with 0xFE header (len < 0xFFFFFF —
      a row whose first lenenc needs the 0xFE prefix is ≥64 KiB, so
      short-0xFE is unambiguous)."""
    from .wireclient import (
        COM_QUERY,
        parse_column_definition,
        parse_text_row,
        read_lenenc_int,
    )

    _send_packet(sock, 0, bytes([COM_QUERY]) + sql.encode())
    _seq, payload = _recv_packet(sock)
    if payload[:1] == b"\xff":
        code = int.from_bytes(payload[1:3], "little")
        raise WireClientError(f"query failed: server error {code}")
    if payload[:1] == b"\x00":
        return []  # OK packet: statement with no resultset
    n_cols, _ = read_lenenc_int(payload, 0)
    names: list[str] = []
    for _ in range(n_cols):
        _seq, col = _recv_packet(sock)
        names.append(parse_column_definition(col))
    if not deprecate_eof:
        _seq, eof = _recv_packet(sock)
        if eof[:1] != b"\xfe":
            raise WireClientError("expected EOF after column definitions")
    rows: list[dict[str, Any]] = []
    terminator_max = 0xFFFFFF if deprecate_eof else 9
    while True:
        _seq, payload = _recv_packet(sock)
        if payload[:1] == b"\xfe" and len(payload) < terminator_max:
            return rows
        if payload[:1] == b"\xff":
            code = int.from_bytes(payload[1:3], "little")
            raise WireClientError(f"mid-resultset server error {code}")
        rows.append(dict(zip(names, parse_text_row(payload, n_cols))))


def mysql_catalog_execute(connect: Callable[[], Any], user: str, password: str):
    """A ``schema/catalog.py Execute`` seam speaking the REAL protocol:
    dial, authenticate, COM_QUERY per catalog statement over one
    connection. Completes the live schema loader — pattern expansion
    and column/PK fetch run the same bytes a server would see."""
    state: dict[str, Any] = {}

    def execute(sql: str) -> list[dict[str, Any]]:
        if "sock" not in state:
            sock = connect()
            hs = mysql_authenticate(sock, user, password)
            state["sock"] = sock
            state["deprecate_eof"] = hs["deprecate_eof"]
        return mysql_query(state["sock"], sql, deprecate_eof=state["deprecate_eof"])

    return execute


# ---------------------------------------------------------------- PG


AUTH_OK = 0
AUTH_MD5 = 5
AUTH_SASL = 10
AUTH_SASL_CONTINUE = 11
AUTH_SASL_FINAL = 12


class _PgConn:
    """Buffered backend-message reader over the socket seam."""

    def __init__(self, sock) -> None:
        self.sock = sock
        self.buf = bytearray()

    def read_message(self) -> tuple[str, bytes]:
        while True:
            got = parse_backend_message(bytes(self.buf))
            if got is not None:
                tag, body, nxt = got
                del self.buf[:nxt]
                return tag, body
            chunk = self.sock.recv(RECV_SIZE)
            if not chunk:
                raise PgoutputError("connection closed mid-message")
            self.buf += chunk


def pg_authenticate(conn: _PgConn, user: str, password: str, database: str) -> None:
    """StartupMessage (replication=database) + auth negotiation
    (trust / MD5 / SCRAM-SHA-256), then drain to ReadyForQuery."""
    conn.sock.sendall(build_startup_message(user, database))
    _pg_auth_drain(conn, user, password)


def pg_replication_session(
    sock,
    user: str,
    password: str,
    *,
    database: str,
    slot: str,
    publication: str,
    start_lsn: int = 0,
    status_every: int = 8,
) -> Iterator[dict[str, Any]]:
    """One walreceiver session: auth → START_REPLICATION →
    CopyBothResponse → yield parsed pgoutput messages (each wrapped
    with its LSN bookkeeping). Standby status updates flow back on
    every keepalive that requests a reply and every ``status_every``
    data frames (the feedback that advances the slot's restart point)."""
    conn = _PgConn(sock)
    pg_authenticate(conn, user, password, database)
    conn.sock.sendall(build_start_replication(slot, start_lsn, publication=publication))
    rs = ReplicationStream(flushed_lsn=start_lsn)
    n_since_status = 0
    while True:
        tag, body = conn.read_message()
        if tag == "E":
            raise WireClientError(f"replication error: {body[:120]!r}")
        if tag == "W":  # CopyBothResponse: the stream is live
            continue
        if tag == "c":  # CopyDone
            return
        if tag != "d":  # CopyData
            continue
        out = rs.feed_copydata(body)
        out["flushed_lsn"] = rs.flushed_lsn
        yield out
        n_since_status += 1
        if out.get("reply_requested") or n_since_status >= status_every:
            conn.sock.sendall(build_frontend_message("d", rs.status_update()))
            n_since_status = 0


def pg_query(conn: _PgConn, sql: str) -> list[dict[str, Any]]:
    """Simple query protocol ('Q' → RowDescription 'T' + DataRow 'D'…
    + CommandComplete 'C' + ReadyForQuery 'Z'); text-mode values."""
    conn.sock.sendall(build_frontend_message("Q", sql.encode() + b"\x00"))
    names: list[str] = []
    rows: list[dict[str, Any]] = []
    while True:
        tag, body = conn.read_message()
        if tag == "E":
            raise WireClientError(f"query failed: {body[:120]!r}")
        if tag == "T":
            n = struct.unpack_from(">h", body, 0)[0]
            pos = 2
            names = []
            for _ in range(n):
                end = body.index(b"\x00", pos)
                names.append(body[pos:end].decode())
                pos = end + 1 + 18  # table oid, attnum, type oid, len, mod, fmt
        elif tag == "D":
            n = struct.unpack_from(">h", body, 0)[0]
            pos = 2
            vals: list[str | None] = []
            for _ in range(n):
                ln = struct.unpack_from(">i", body, pos)[0]
                pos += 4
                if ln < 0:
                    vals.append(None)
                else:
                    vals.append(body[pos : pos + ln].decode())
                    pos += ln
            rows.append(dict(zip(names, vals)))
        elif tag == "Z":
            return rows
        # 'C' CommandComplete, 'N' notices: continue


def pg_catalog_execute(
    connect: Callable[[], Any], user: str, password: str, database: str
):
    """``schema/catalog.py Execute`` over the real PG protocol:
    startup + auth (SCRAM/MD5/trust) once, simple queries per catalog
    statement (postgres_schema_loader.rs's transport)."""
    state: dict[str, Any] = {}

    def execute(sql: str) -> list[dict[str, Any]]:
        if "conn" not in state:
            conn = _PgConn(connect())
            # a plain (non-replication) session: catalog queries only
            from .wireclient import PG_PROTOCOL_V3

            body = bytearray(struct.pack(">I", PG_PROTOCOL_V3))
            for k, v in (("user", user), ("database", database)):
                body += k.encode() + b"\x00" + v.encode() + b"\x00"
            body += b"\x00"
            conn.sock.sendall(struct.pack(">I", len(body) + 4) + bytes(body))
            _pg_auth_drain(conn, user, password)
            state["conn"] = conn
        return pg_query(state["conn"], sql)

    return execute


def _pg_auth_drain(conn: _PgConn, user: str, password: str) -> None:
    """The auth loop of ``pg_authenticate`` without the replication
    startup (shared by catalog sessions)."""
    while True:
        tag, body = conn.read_message()
        if tag == "E":
            raise WireClientError(f"server error during startup: {body[:120]!r}")
        if tag == "R":
            code = struct.unpack_from(">I", body, 0)[0]
            if code == AUTH_OK:
                continue
            if code == AUTH_MD5:
                conn.sock.sendall(md5_auth_response(user, password, body[4:8]))
                continue
            if code == AUTH_SASL:
                sc = ScramClient(user, password)
                conn.sock.sendall(build_sasl_initial_response(sc))
                tag2, body2 = conn.read_message()
                if tag2 != "R" or struct.unpack_from(">I", body2, 0)[0] != AUTH_SASL_CONTINUE:
                    raise WireClientError(f"expected SASLContinue, got {tag2!r}")
                conn.sock.sendall(
                    build_frontend_message("p", sc.client_final(body2[4:]).encode())
                )
                tag3, body3 = conn.read_message()
                if tag3 != "R" or struct.unpack_from(">I", body3, 0)[0] != AUTH_SASL_FINAL:
                    raise WireClientError(f"expected SASLFinal, got {tag3!r}")
                sc.verify_server_final(body3[4:])
                continue
            raise WireClientError(f"unsupported auth method {code}")
        if tag == "Z":
            return


def tail_pgoutput(
    connect: Callable[[], Any],
    user: str,
    password: str,
    *,
    database: str,
    slot: str,
    publication: str,
    start_lsn: int = 0,
    max_reconnects: int = 3,
) -> Iterator[dict[str, Any]]:
    """Reconnect loop: resumes from the last FLUSHED LSN (commit
    boundary) — the replayed tail re-delivers the in-flight
    transaction, which the idempotence keys absorb downstream."""
    attempts = 0
    while True:
        sock = connect()
        try:
            for out in pg_replication_session(
                sock, user, password,
                database=database, slot=slot, publication=publication,
                start_lsn=start_lsn,
            ):
                if out["flushed_lsn"] > start_lsn:
                    start_lsn = out["flushed_lsn"]
                    attempts = 0
                yield out
            return
        except WireClientError:
            # configuration-class failures (auth rejected, slot dropped,
            # replication ERROR) are FATAL: retrying cannot fix a missing
            # slot, and looping would mask data loss — the reference's
            # slot_dropped scenario expects a hard stop + re-snapshot
            raise
        except (PgoutputError, OSError) as e:
            attempts += 1
            if attempts > max_reconnects:
                raise PgoutputError(
                    f"giving up after {max_reconnects} reconnects: {e}"
                ) from e
        finally:
            try:
                sock.close()
            except OSError:
                pass
