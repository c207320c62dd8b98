"""Connection-establishment protocol (sources/wireclient.py): MySQL
HandshakeV10 → HandshakeResponse41 with both auth scrambles, binlog
dump request encodings, PG startup + MD5 + SCRAM-SHA-256 (pinned to the
RFC 7677 §3 test vector) — the auth layer the reference gets from its
client crates, exercised byte-for-byte without a server.
"""

import hashlib
import struct

import pytest

import deltaforge_spark.sources.wireclient as wc


# ----------------------------------------------------------- MySQL side


def _handshake_v10_bytes(
    scramble: bytes, plugin: str = "mysql_native_password", version: str = "8.0.36"
) -> bytes:
    assert len(scramble) == 20
    caps = 0xFFFFFFFF  # all flags incl. SECURE_CONNECTION + PLUGIN_AUTH
    out = bytearray(b"\x0a")
    out += version.encode() + b"\x00"
    out += struct.pack("<I", 42)  # thread id
    out += scramble[:8] + b"\x00"
    out += struct.pack("<H", caps & 0xFFFF)
    out += bytes([45])  # charset
    out += struct.pack("<H", 2)  # status
    out += struct.pack("<H", caps >> 16)
    out += bytes([21])  # auth data len
    out += b"\x00" * 10
    out += scramble[8:] + b"\x00"
    out += plugin.encode() + b"\x00"
    return bytes(out)


class TestMysqlHandshake:
    SCRAMBLE = bytes(range(1, 21))

    def test_parse_handshake_v10(self):
        hs = wc.parse_handshake_v10(_handshake_v10_bytes(self.SCRAMBLE))
        assert hs["server_version"] == "8.0.36"
        assert hs["thread_id"] == 42
        assert hs["scramble"] == self.SCRAMBLE
        assert hs["auth_plugin"] == "mysql_native_password"

    def test_native_password_scramble_formula(self):
        # token = SHA1(pass) XOR SHA1(nonce + SHA1(SHA1(pass))): the
        # server, holding SHA1(SHA1(pass)), can verify without the
        # password — recompute both sides independently
        pw, nonce = "secret", self.SCRAMBLE
        token = wc.scramble_native_password(pw, nonce)
        h1 = hashlib.sha1(pw.encode()).digest()
        h2 = hashlib.sha1(h1).digest()
        server_side = hashlib.sha1(nonce + h2).digest()
        assert bytes(a ^ b for a, b in zip(token, server_side)) == h1
        assert len(token) == 20

    def test_caching_sha2_scramble_formula(self):
        pw, nonce = "secret", self.SCRAMBLE
        token = wc.scramble_caching_sha2(pw, nonce)
        h1 = hashlib.sha256(pw.encode()).digest()
        h2 = hashlib.sha256(h1).digest()
        mask = hashlib.sha256(h2 + nonce).digest()
        assert bytes(a ^ b for a, b in zip(token, mask)) == h1

    def test_empty_password_sends_empty_auth(self):
        assert wc.scramble_native_password("", self.SCRAMBLE) == b""
        assert wc.scramble_caching_sha2("", self.SCRAMBLE) == b""

    def test_handshake_response_layout(self):
        hs = wc.parse_handshake_v10(_handshake_v10_bytes(self.SCRAMBLE))
        resp = wc.build_handshake_response(hs, "repl", "secret", database="db1")
        caps, max_packet, charset = struct.unpack_from("<IIB", resp, 0)
        assert caps & wc.CLIENT_PROTOCOL_41 and caps & wc.CLIENT_PLUGIN_AUTH
        assert resp[9:32] == b"\x00" * 23
        rest = resp[32:]
        user, rest = rest.split(b"\x00", 1)
        assert user == b"repl"
        alen = rest[0]
        auth, rest = rest[1 : 1 + alen], rest[1 + alen :]
        assert auth == wc.scramble_native_password("secret", self.SCRAMBLE)
        db, rest = rest.split(b"\x00", 1)
        assert db == b"db1"
        assert rest == b"mysql_native_password\x00"

    def test_caching_sha2_picked_from_plugin(self):
        hs = wc.parse_handshake_v10(
            _handshake_v10_bytes(self.SCRAMBLE, plugin="caching_sha2_password")
        )
        resp = wc.build_handshake_response(hs, "u", "pw")
        assert wc.scramble_caching_sha2("pw", self.SCRAMBLE) in resp
        assert b"caching_sha2_password\x00" in resp

    def test_unknown_plugin_is_loud(self):
        hs = wc.parse_handshake_v10(
            _handshake_v10_bytes(self.SCRAMBLE, plugin="sha256_password")
        )
        with pytest.raises(wc.WireClientError, match="unsupported auth plugin"):
            wc.build_handshake_response(hs, "u", "pw")


class TestDumpRequests:
    def test_binlog_dump_layout(self):
        req = wc.build_binlog_dump(3, file="binlog.000007", pos=1234)
        assert req[0] == wc.COM_BINLOG_DUMP
        pos, flags, sid = struct.unpack_from("<IHI", req, 1)
        assert (pos, flags, sid) == (1234, 0, 3)
        assert req[11:] == b"binlog.000007"

    def test_binlog_dump_clamps_pos_below_magic(self):
        assert struct.unpack_from("<I", wc.build_binlog_dump(1, pos=0), 1)[0] == 4

    def test_register_slave_layout(self):
        req = wc.build_register_slave(3, hostname="worker-1", port=3307)
        assert req[0] == wc.COM_REGISTER_SLAVE
        assert struct.unpack_from("<I", req, 1)[0] == 3
        assert req[6 : 6 + 8] == b"worker-1"

    def test_gtid_set_encoding_roundtrip(self):
        sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
        enc = wc.encode_gtid_set({sid: [(1, 5), (8, 8)]})
        n_sids = struct.unpack_from("<Q", enc, 0)[0]
        assert n_sids == 1
        assert enc[8:24] == bytes.fromhex(sid.replace("-", ""))
        n_ivs = struct.unpack_from("<Q", enc, 24)[0]
        assert n_ivs == 2
        assert struct.unpack_from("<QQ", enc, 32) == (1, 6)   # end exclusive
        assert struct.unpack_from("<QQ", enc, 48) == (8, 9)

    def test_dump_gtid_wraps_encoded_set(self):
        data = wc.encode_gtid_set({"0" * 32: [(1, 1)]})
        req = wc.build_binlog_dump_gtid(9, data)
        assert req[0] == wc.COM_BINLOG_DUMP_GTID
        flags, sid = struct.unpack_from("<HI", req, 1)
        assert flags == wc.BINLOG_THROUGH_GTID and sid == 9
        assert req[-len(data):] == data


# -------------------------------------------------------------- PG side


class TestPgStartup:
    def test_startup_message_replication_database(self):
        msg = wc.build_startup_message("repl", "appdb")
        ln = struct.unpack_from(">I", msg, 0)[0]
        assert ln == len(msg)
        assert struct.unpack_from(">I", msg, 4)[0] == wc.PG_PROTOCOL_V3
        assert b"user\x00repl\x00" in msg
        assert b"replication\x00database\x00" in msg
        assert msg.endswith(b"\x00")

    def test_backend_message_framing(self):
        wire = wc.build_frontend_message("R", struct.pack(">I", 0)) + b"tail"
        tag, body, nxt = wc.parse_backend_message(wire)
        assert (tag, body) == ("R", struct.pack(">I", 0))
        assert wire[nxt:] == b"tail"
        assert wc.parse_backend_message(wire[:3]) is None  # incomplete

    def test_md5_auth_response(self):
        # md5(md5(password + user) + salt), double-hex — recomputed here
        salt = b"\x01\x02\x03\x04"
        msg = wc.md5_auth_response("repl", "pw", salt)
        inner = hashlib.md5(b"pwrepl").hexdigest()
        expect = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
        assert msg == wc.build_frontend_message("p", expect.encode() + b"\x00")

    def test_start_replication_lsn_format(self):
        msg = wc.build_start_replication("slot1", (5 << 32) | 0xABC, publication="pub1")
        assert b"START_REPLICATION SLOT slot1 LOGICAL 5/ABC" in msg
        assert b"publication_names 'pub1'" in msg


class TestScramRfc7677Vector:
    """RFC 7677 §3: user 'user', pass 'pencil', the published exchange."""

    C_NONCE = "rOprNGfwEbeRWgbNEkqO"
    S_FIRST = (
        "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )

    def test_client_first(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        assert sc.client_first() == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO"

    def test_client_final_proof_matches_rfc(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        final = sc.client_final(self.S_FIRST)
        assert final == (
            "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
            "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
        )

    def test_server_final_verifies(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        sc.client_final(self.S_FIRST)
        sc.verify_server_final("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")

    def test_wrong_server_signature_is_loud(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        sc.client_final(self.S_FIRST)
        with pytest.raises(wc.WireClientError, match="signature mismatch"):
            sc.verify_server_final("v=" + "A" * 43 + "=")

    def test_server_error_attr_is_loud(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        sc.client_final(self.S_FIRST)
        with pytest.raises(wc.WireClientError, match="rejected"):
            sc.verify_server_final("e=invalid-proof")

    def test_foreign_nonce_rejected(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        with pytest.raises(wc.WireClientError, match="nonce"):
            sc.client_final("r=EVIL,s=QSXCR+Q6sek8bf92,i=4096")

    def test_username_escaping(self):
        sc = wc.ScramClient("who=what,ever", "x", nonce="abc")
        assert sc.client_first() == "n,,n=who=3Dwhat=2Cever,r=abc"

    def test_sasl_initial_response_framing(self):
        sc = wc.ScramClient("user", "pencil", nonce=self.C_NONCE)
        msg = wc.build_sasl_initial_response(sc)
        assert msg[0:1] == b"p"
        body = msg[5:]
        assert body.startswith(b"SCRAM-SHA-256\x00")
        ln = struct.unpack_from(">I", body, 14)[0]
        assert body[18 : 18 + ln] == sc.client_first().encode()
