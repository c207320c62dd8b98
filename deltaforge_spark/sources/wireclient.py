"""Connection-establishment protocol for the CDC sources — the auth
handshakes and dump/replication requests the reference delegates to its
client crates (mysql_async inside mysql/mod.rs:113-382, tokio-postgres
inside postgres/mod.rs:64-120). Everything here is the PUBLIC wire
format (MySQL client/server protocol, PG frontend/backend protocol v3,
SCRAM-SHA-256 per RFC 5802/7677), implemented so that the entire
connect → authenticate → request-stream → decode path is exercisable
against synthetic or loopback servers — the only thing the sandbox
cannot test is a real DBMS on the other end.

MySQL side: HandshakeV10 parse, HandshakeResponse41 build,
mysql_native_password / caching_sha2_password scrambles,
COM_REGISTER_SLAVE / COM_BINLOG_DUMP / COM_BINLOG_DUMP_GTID encoding.

PG side: StartupMessage (replication=database), backend message
framing, MD5 and SCRAM-SHA-256 auth exchanges, START_REPLICATION
query, CopyBothResponse recognition.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import struct
from typing import Any

# =====================================================================
# MySQL client/server protocol
# =====================================================================

CLIENT_LONG_PASSWORD = 0x00000001
CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000
CLIENT_DEPRECATE_EOF = 0x01000000

COM_REGISTER_SLAVE = 0x15
COM_BINLOG_DUMP = 0x12
COM_BINLOG_DUMP_GTID = 0x1E
BINLOG_DUMP_NON_BLOCK = 0x01
BINLOG_THROUGH_GTID = 0x04


class WireClientError(ValueError):
    """Loud connection-protocol failure (auth, framing, server error)."""


def parse_handshake_v10(payload: bytes) -> dict[str, Any]:
    """Server greeting (HandshakeV10): protocol version, server
    version, thread id, 20-byte auth scramble split in two parts,
    capability flags, auth plugin name."""
    if not payload or payload[0] != 0x0A:
        raise WireClientError(f"unsupported handshake protocol {payload[:1]!r}")
    p = 1
    end = payload.index(b"\x00", p)
    server_version = payload[p:end].decode()
    p = end + 1
    thread_id = struct.unpack_from("<I", payload, p)[0]
    p += 4
    scramble1 = payload[p : p + 8]
    p += 8 + 1  # + filler
    cap_low = struct.unpack_from("<H", payload, p)[0]
    p += 2
    charset = payload[p]
    p += 1
    status = struct.unpack_from("<H", payload, p)[0]
    p += 2
    cap_high = struct.unpack_from("<H", payload, p)[0]
    p += 2
    capabilities = cap_low | (cap_high << 16)
    auth_len = payload[p]
    p += 1 + 10  # + reserved
    scramble2 = b""
    if capabilities & CLIENT_SECURE_CONNECTION:
        n2 = max(13, auth_len - 8) - 1  # trailing NUL excluded
        scramble2 = payload[p : p + n2]
        p += n2 + 1
    plugin = ""
    if capabilities & CLIENT_PLUGIN_AUTH:
        end = payload.find(b"\x00", p)
        plugin = payload[p : end if end >= 0 else len(payload)].decode()
    return {
        "server_version": server_version,
        "thread_id": thread_id,
        "scramble": scramble1 + scramble2,
        "capabilities": capabilities,
        "charset": charset,
        "status": status,
        "auth_plugin": plugin,
    }


def scramble_native_password(password: str, nonce: bytes) -> bytes:
    """mysql_native_password: SHA1(pass) XOR SHA1(nonce + SHA1(SHA1(pass)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def scramble_caching_sha2(password: str, nonce: bytes) -> bytes:
    """caching_sha2_password fast path:
    XOR(SHA256(pass), SHA256(SHA256(SHA256(pass)) + nonce))."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + nonce).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def build_handshake_response(
    handshake: dict[str, Any],
    user: str,
    password: str,
    *,
    database: str = "",
    max_packet: int = 1 << 24,
    charset: int = 45,  # utf8mb4_general_ci
) -> bytes:
    """HandshakeResponse41 for the two auth plugins the sources need.
    The scramble the server sent picks the algorithm; the response is
    ready to wrap in packet 1 of the connection.

    Capability negotiation: CLIENT_DEPRECATE_EOF is advertised only
    when the server offered it (5.7.5+), and the resultset parser
    (tailloop.mysql_query) switches framing on the NEGOTIATED flag —
    advertising it against the legacy parser would desync every
    catalog query on a real 8.0 server. CLIENT_CONNECT_WITH_DB is set
    iff a database is appended; without the flag a real server parses
    the database bytes as the auth-plugin name."""
    plugin = handshake.get("auth_plugin") or "mysql_native_password"
    nonce = handshake["scramble"][:20]
    if plugin == "mysql_native_password":
        auth = scramble_native_password(password, nonce)
    elif plugin == "caching_sha2_password":
        auth = scramble_caching_sha2(password, nonce)
    else:
        raise WireClientError(f"unsupported auth plugin {plugin!r}")
    # single source of truth: the wire bytes advertise EXACTLY what
    # negotiated_capabilities() reports, so resultset framing can never
    # desync from the handshake (the r5 DEPRECATE_EOF bug class)
    caps = negotiated_capabilities(handshake, database=database)
    out = bytearray(struct.pack("<IIB", caps, max_packet, charset))
    out += b"\x00" * 23
    out += user.encode() + b"\x00"
    out += bytes([len(auth)]) + auth
    if database:
        out += database.encode() + b"\x00"
    out += plugin.encode() + b"\x00"
    return bytes(out)


def negotiated_capabilities(handshake: dict[str, Any], *, database: str = "") -> int:
    """The capability set a ``build_handshake_response`` for this
    greeting actually advertises — callers key resultset framing
    (DEPRECATE_EOF) off this, never off the client-side constant."""
    caps = (
        CLIENT_LONG_PASSWORD
        | CLIENT_PROTOCOL_41
        | CLIENT_SECURE_CONNECTION
        | CLIENT_PLUGIN_AUTH
    )
    caps |= handshake.get("capabilities", 0) & CLIENT_DEPRECATE_EOF
    if database:
        caps |= CLIENT_CONNECT_WITH_DB
    return caps


# --- caching_sha2_password FULL authentication (non-TLS path) -------
#
# When the server's auth cache has no entry for the user it answers the
# fast-path scramble with AuthMoreData 0x04 (perform_full_authentication).
# Over TLS the client would send the cleartext password; over an
# insecure channel the documented exchange is: client sends 0x02
# (request server RSA public key), server returns its PEM key in
# AuthMoreData, client sends RSA-OAEP(password XOR nonce). The
# reference gets this from its client crate; here it is the public
# algorithm (PKCS#1 v2 OAEP with SHA-1/MGF1-SHA-1, MySQL's default
# sha256_password_public_key padding) over stdlib hashlib + pow().

AUTH_MORE_DATA = 0x01
FAST_AUTH_SUCCESS = 0x03
PERFORM_FULL_AUTH = 0x04
REQUEST_PUBLIC_KEY = 0x02


def parse_rsa_public_key_pem(pem: bytes) -> tuple[int, int]:
    """(modulus n, exponent e) from a PEM SubjectPublicKeyInfo (the
    ``-----BEGIN PUBLIC KEY-----`` form MySQL serves). Minimal DER
    walk: SEQUENCE(SEQUENCE(oid, null), BITSTRING(SEQUENCE(n, e)))."""
    body = b"".join(
        line.strip()
        for line in pem.splitlines()
        if line.strip() and not line.strip().startswith(b"-----")
    )
    der = base64.b64decode(body)

    def read_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
        tag = buf[pos]
        ln = buf[pos + 1]
        pos += 2
        if ln & 0x80:
            n_len = ln & 0x7F
            ln = int.from_bytes(buf[pos : pos + n_len], "big")
            pos += n_len
        return tag, buf[pos : pos + ln], pos + ln

    tag, spki, _ = read_tlv(der, 0)
    if tag != 0x30:
        raise WireClientError("bad public key DER (no outer SEQUENCE)")
    tag, _alg, nxt = read_tlv(spki, 0)  # AlgorithmIdentifier
    tag, bits, _ = read_tlv(spki, nxt)
    if tag != 0x03:
        raise WireClientError("bad public key DER (no BIT STRING)")
    rsakey = bits[1:]  # skip unused-bits count
    tag, seq, _ = read_tlv(rsakey, 0)
    if tag != 0x30:
        raise WireClientError("bad RSAPublicKey DER")
    tag, n_bytes, nxt = read_tlv(seq, 0)
    tag2, e_bytes, _ = read_tlv(seq, nxt)
    if tag != 0x02 or tag2 != 0x02:
        raise WireClientError("bad RSAPublicKey INTEGERs")
    return int.from_bytes(n_bytes, "big"), int.from_bytes(e_bytes, "big")


def _mgf1_sha1(seed: bytes, length: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < length:
        out += hashlib.sha1(seed + struct.pack(">I", counter)).digest()
        counter += 1
    return bytes(out[:length])


def rsa_oaep_encrypt(message: bytes, n: int, e: int, *, seed: bytes | None = None) -> bytes:
    """RSAES-OAEP (PKCS#1 v2.1, SHA-1 hash + MGF1-SHA-1, empty label)
    — the padding MySQL's server applies when decrypting the scrambled
    password. ``seed`` injectable for deterministic tests."""
    k = (n.bit_length() + 7) // 8
    h_len = 20
    if len(message) > k - 2 * h_len - 2:
        raise WireClientError("password too long for server RSA key")
    l_hash = hashlib.sha1(b"").digest()
    ps = b"\x00" * (k - len(message) - 2 * h_len - 2)
    db = l_hash + ps + b"\x01" + message
    seed = seed if seed is not None else os.urandom(h_len)
    masked_db = bytes(a ^ b for a, b in zip(db, _mgf1_sha1(seed, k - h_len - 1)))
    masked_seed = bytes(a ^ b for a, b in zip(seed, _mgf1_sha1(masked_db, h_len)))
    em = b"\x00" + masked_seed + masked_db
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def rsa_oaep_decrypt(ciphertext: bytes, n: int, d: int) -> bytes:
    """Test-side inverse (loopback servers hold the private exponent) —
    validates padding and returns the message."""
    k = (n.bit_length() + 7) // 8
    h_len = 20
    em = pow(int.from_bytes(ciphertext, "big"), d, n).to_bytes(k, "big")
    if em[0] != 0:
        raise WireClientError("OAEP: bad leading byte")
    masked_seed, masked_db = em[1 : 1 + h_len], em[1 + h_len :]
    seed = bytes(a ^ b for a, b in zip(masked_seed, _mgf1_sha1(masked_db, h_len)))
    db = bytes(a ^ b for a, b in zip(masked_db, _mgf1_sha1(seed, k - h_len - 1)))
    if db[:h_len] != hashlib.sha1(b"").digest():
        raise WireClientError("OAEP: label hash mismatch")
    sep = db.index(b"\x01", h_len)
    return db[sep + 1 :]


def xor_password_nonce(password: str, nonce: bytes) -> bytes:
    """The plaintext inside the RSA envelope: NUL-terminated password
    XOR the 20-byte handshake nonce, repeated."""
    pw = password.encode() + b"\x00"
    return bytes(c ^ nonce[i % len(nonce)] for i, c in enumerate(pw))


def build_register_slave(server_id: int, *, hostname: str = "", port: int = 0) -> bytes:
    """COM_REGISTER_SLAVE — announces this client as a replica so the
    server streams binlogs to it (the reference's connection does this
    through the client crate before dumping)."""
    h = hostname.encode()
    out = bytearray([COM_REGISTER_SLAVE])
    out += struct.pack("<I", server_id)
    out += bytes([len(h)]) + h
    out += b"\x00" + b"\x00"  # user, password (empty lenenc strings)
    out += struct.pack("<H", port)
    out += struct.pack("<I", 0)  # replication rank (unused)
    out += struct.pack("<I", 0)  # master id (0 = let server fill)
    return bytes(out)


def build_binlog_dump(server_id: int, *, file: str = "", pos: int = 4) -> bytes:
    """COM_BINLOG_DUMP: stream ``file`` from byte ``pos`` (min 4 — the
    magic). Empty file = first available binlog."""
    out = bytearray([COM_BINLOG_DUMP])
    out += struct.pack("<I", max(4, pos))
    out += struct.pack("<H", 0)  # flags: block (stream forever)
    out += struct.pack("<I", server_id)
    out += file.encode()
    return bytes(out)


def build_binlog_dump_gtid(server_id: int, gtid_set_encoded: bytes) -> bytes:
    """COM_BINLOG_DUMP_GTID: resume by executed-GTID set (auto-position
    — the reference's preferred resume; the encoded set is the
    sid/interval block of the checkpoint's GtidSet)."""
    out = bytearray([COM_BINLOG_DUMP_GTID])
    out += struct.pack("<H", BINLOG_THROUGH_GTID)
    out += struct.pack("<I", server_id)
    out += struct.pack("<I", 0)  # binlog filename length (auto-position)
    out += struct.pack("<Q", 4)  # position
    out += struct.pack("<I", len(gtid_set_encoded))
    out += gtid_set_encoded
    return bytes(out)


def encode_gtid_set(intervals: dict[str, list[tuple[int, int]]]) -> bytes:
    """The COM_BINLOG_DUMP_GTID payload encoding of an executed set:
    u64 n_sids, then per sid: 16 raw uuid bytes, u64 n_intervals,
    (u64 start, u64 end+1) pairs."""
    out = bytearray(struct.pack("<Q", len(intervals)))
    for uuid_str, ivs in sorted(intervals.items()):
        out += bytes.fromhex(uuid_str.replace("-", ""))
        out += struct.pack("<Q", len(ivs))
        for a, b in ivs:
            out += struct.pack("<QQ", a, b + 1)  # wire end is exclusive
    return bytes(out)


# =====================================================================
# PostgreSQL frontend/backend protocol v3
# =====================================================================

PG_PROTOCOL_V3 = 196608  # 3 << 16


def build_startup_message(
    user: str, database: str, *, replication: str = "database"
) -> bytes:
    """StartupMessage with ``replication=database`` — the logical-
    replication walsender mode START_REPLICATION requires."""
    body = bytearray(struct.pack(">I", PG_PROTOCOL_V3))
    for k, v in (("user", user), ("database", database), ("replication", replication)):
        body += k.encode() + b"\x00" + v.encode() + b"\x00"
    body += b"\x00"
    return struct.pack(">I", len(body) + 4) + bytes(body)


def parse_backend_message(buf: bytes, off: int = 0) -> tuple[str, bytes, int] | None:
    """One backend message at ``off``: (tag, body, next offset), or
    None if incomplete. Framing: u8 tag, u32 length incl itself."""
    if off + 5 > len(buf):
        return None
    tag = chr(buf[off])
    ln = struct.unpack_from(">I", buf, off + 1)[0]
    if off + 1 + ln > len(buf):
        return None
    return tag, bytes(buf[off + 5 : off + 1 + ln]), off + 1 + ln


def build_frontend_message(tag: str, body: bytes) -> bytes:
    return tag.encode() + struct.pack(">I", len(body) + 4) + body


def md5_auth_response(user: str, password: str, salt: bytes) -> bytes:
    """AuthenticationMD5Password answer:
    'md5' + md5(md5(password + user) + salt), as a PasswordMessage."""
    inner = hashlib.md5((password + user).encode()).hexdigest()
    outer = hashlib.md5(inner.encode() + salt).hexdigest()
    return build_frontend_message("p", ("md5" + outer).encode() + b"\x00")


class ScramClient:
    """SCRAM-SHA-256 (RFC 5802 / RFC 7677) client exchange, the auth
    PG uses by default since v14. Channel binding not advertised
    ('n,,' gs2 header — this client does not TLS-bind).

    Usage::

        sc = ScramClient(user, password)          # → client_first()
        sc.client_final(server_first_bytes)       # → client-final msg
        sc.verify_server_final(server_final)      # raises on bad proof
    """

    MECHANISM = "SCRAM-SHA-256"

    def __init__(self, user: str, password: str, *, nonce: str | None = None) -> None:
        self.user = user
        self.password = password
        self.client_nonce = nonce or base64.b64encode(os.urandom(18)).decode()
        self._client_first_bare = f"n={_scram_escape(user)},r={self.client_nonce}"
        self._auth_message: str | None = None
        self._server_key: bytes | None = None

    def client_first(self) -> str:
        return "n,," + self._client_first_bare

    def client_final(self, server_first: str | bytes) -> str:
        if isinstance(server_first, bytes):
            server_first = server_first.decode()
        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not nonce.startswith(self.client_nonce):
            raise WireClientError("server nonce does not extend client nonce")
        salted = hashlib.pbkdf2_hmac(
            "sha256", self.password.encode(), base64.b64decode(salt_b64), iters
        )
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        self._server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        without_proof = f"c=biws,r={nonce}"
        self._auth_message = (
            f"{self._client_first_bare},{server_first},{without_proof}"
        )
        sig = hmac.new(stored_key, self._auth_message.encode(), hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        return f"{without_proof},p={base64.b64encode(proof).decode()}"

    def verify_server_final(self, server_final: str | bytes) -> None:
        """MUTUAL auth: the server proves it holds the ServerKey. A
        client that skips this accepts a MITM that never knew the
        password."""
        if self._auth_message is None or self._server_key is None:
            raise WireClientError("client_final has not run")
        if isinstance(server_final, bytes):
            server_final = server_final.decode()
        attrs = dict(kv.split("=", 1) for kv in server_final.split(","))
        if "e" in attrs:
            raise WireClientError(f"server rejected auth: {attrs['e']}")
        expected = hmac.new(
            self._server_key, self._auth_message.encode(), hashlib.sha256
        ).digest()
        if base64.b64decode(attrs["v"]) != expected:
            raise WireClientError("server signature mismatch (not the real server)")


def _scram_escape(s: str) -> str:
    return s.replace("=", "=3D").replace(",", "=2C")


def build_sasl_initial_response(sc: ScramClient) -> bytes:
    cf = sc.client_first().encode()
    body = sc.MECHANISM.encode() + b"\x00" + struct.pack(">I", len(cf)) + cf
    return build_frontend_message("p", body)


COM_QUERY = 0x03


def read_lenenc_int(buf: bytes, pos: int) -> tuple[int | None, int]:
    """MySQL length-encoded integer (NULL for 0xFB in row values)."""
    b = buf[pos]
    if b < 0xFB:
        return b, pos + 1
    if b == 0xFB:
        return None, pos + 1
    if b == 0xFC:
        return int.from_bytes(buf[pos + 1 : pos + 3], "little"), pos + 3
    if b == 0xFD:
        return int.from_bytes(buf[pos + 1 : pos + 4], "little"), pos + 4
    return int.from_bytes(buf[pos + 1 : pos + 9], "little"), pos + 9


def read_lenenc_str(buf: bytes, pos: int) -> tuple[bytes | None, int]:
    n, pos = read_lenenc_int(buf, pos)
    if n is None:
        return None, pos
    return buf[pos : pos + n], pos + n


def parse_column_definition(payload: bytes) -> str:
    """ColumnDefinition41: catalog, schema, table, org_table, name,
    org_name (all lenenc strings) — returns the column NAME."""
    pos = 0
    for _ in range(4):  # catalog, schema, table, org_table
        _, pos = read_lenenc_str(payload, pos)
    name, pos = read_lenenc_str(payload, pos)
    return (name or b"").decode()


def parse_text_row(payload: bytes, n_cols: int) -> list[str | None]:
    out: list[str | None] = []
    pos = 0
    for _ in range(n_cols):
        v, pos = read_lenenc_str(payload, pos)
        out.append(None if v is None else v.decode())
    return out


def build_start_replication(
    slot: str, lsn: int, *, publication: str, proto_version: int = 1
) -> bytes:
    """START_REPLICATION as a simple Query in walsender mode; the
    server answers CopyBothResponse ('W') and the stream switches to
    CopyData frames (→ sources/pgoutput.ReplicationStream)."""
    lsn_str = f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"
    sql = (
        f"START_REPLICATION SLOT {slot} LOGICAL {lsn_str} "
        f"(proto_version '{proto_version}', publication_names '{publication}')"
    )
    return build_frontend_message("Q", sql.encode() + b"\x00")
