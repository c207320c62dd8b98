"""NATS client protocol — the wire half of the JetStream sink
(reference nats.rs drives async-nats; this speaks the public text
protocol directly, stdlib-only): INFO handshake, CONNECT, HPUB with
the NATS/1.0 header block (the carrier of ``Nats-Msg-Id``, the
JetStream server-side dedup key), verbose ``+OK`` confirmation, and
PING/PONG keepalive. Over a real socket this exercises everything the
sink's header contract promises except a production JetStream broker.
"""

from __future__ import annotations

import json
from typing import Any


class NatsError(RuntimeError):
    """-ERR from the server, or protocol framing failure."""


class NatsClient:
    """Minimal publishing client over a connected socket. ``verbose``
    CONNECT means every publish is confirmed with ``+OK`` — the
    at-least-once handshake the partition writer's flush relies on
    (a missing +OK fails the batch loudly instead of dropping rows)."""

    def __init__(self, sock, *, name: str = "deltaforge", verbose: bool = True) -> None:
        self.sock = sock
        self.verbose = verbose
        self._buf = bytearray()
        self._unconfirmed = 0
        info = self._read_line()
        if not info.startswith(b"INFO "):
            raise NatsError(f"expected INFO greeting, got {info[:40]!r}")
        self.server_info = json.loads(info[5:])
        connect = {
            "verbose": verbose, "pedantic": True, "tls_required": False,
            "name": name, "lang": "python", "version": "0", "headers": True,
        }
        self.sock.sendall(b"CONNECT " + json.dumps(connect).encode() + b"\r\n")
        if verbose:
            # A real nats-server acks the CONNECT itself with +OK in
            # verbose mode. Failing to drain it here leaves every later
            # flush() off-by-one: the CONNECT ack counts as the first
            # publish's confirmation and the LAST publish of each flush
            # is never actually confirmed (its -ERR surfaces one flush
            # late, or never) — breaking the at-least-once guarantee.
            while True:
                line = self._read_line()
                if self._handle_control(line):
                    continue
                if line != b"+OK":
                    raise NatsError(f"expected +OK for CONNECT, got {line[:40]!r}")
                break

    # ------------------------------------------------------------- io

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self.sock.recv(1 << 16)
            if not chunk:
                raise NatsError("connection closed")
            self._buf += chunk
        line, _, rest = bytes(self._buf).partition(b"\r\n")
        self._buf = bytearray(rest)
        return line

    def _handle_control(self, line: bytes) -> bool:
        """PING and -ERR can interleave anywhere; returns True if the
        line was a control message (caller should read again)."""
        if line == b"PING":
            self.sock.sendall(b"PONG\r\n")
            return True
        if line.startswith(b"-ERR"):
            raise NatsError(line.decode(errors="replace"))
        return False

    # ------------------------------------------------------------ pub

    def hpub(self, subject: str, headers: dict[str, str], payload: bytes | str) -> None:
        """HPUB <subject> <hdr_len> <total_len>: the headers block is
        ``NATS/1.0\\r\\nK: V...\\r\\n\\r\\n`` and hdr_len counts it whole."""
        if isinstance(payload, str):
            payload = payload.encode()
        hdr = b"NATS/1.0\r\n"
        for k, v in headers.items():
            hdr += f"{k}: {v}\r\n".encode()
        hdr += b"\r\n"
        cmd = f"HPUB {subject} {len(hdr)} {len(hdr) + len(payload)}\r\n".encode()
        self.sock.sendall(cmd + hdr + payload + b"\r\n")
        if self.verbose:
            self._unconfirmed += 1

    def flush(self) -> None:
        """Drain one ``+OK`` per unconfirmed publish (verbose mode)."""
        while self._unconfirmed:
            line = self._read_line()
            if self._handle_control(line):
                continue
            if line != b"+OK":
                raise NatsError(f"expected +OK, got {line[:40]!r}")
            self._unconfirmed -= 1

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def nats_hpub_client_factory(host: str, port: int):
    """``nats_jetstream_sink``-shaped factory: one NATS connection per
    Spark partition, verbose +OK drain on flush."""

    def factory():
        import socket as _socket

        client = NatsClient(_socket.create_connection((host, port)))

        class _C:
            def send(self, subject, fields):
                client.hpub(subject, fields["headers"], fields["payload"] or "")

            def flush(self):
                client.flush()

            def close(self):
                client.flush()
                client.close()

        return _C()

    return factory


def nats_jetstream_sink_tcp(
    df,
    host: str,
    port: int,
    *,
    default_subject: str,
    batch_size: int = 500,
    strict: bool = True,
):
    """The JetStream sink over a REAL socket: one NATS connection per
    partition, HPUB with the reference header contract (Nats-Msg-Id =
    idempotency key for duplicate_window dedup, df-key only when a
    routing key resolved), verbose +OK confirmation per flush."""
    from .clients import nats_jetstream_sink

    return nats_jetstream_sink(
        df, nats_hpub_client_factory(host, port),
        default_subject=default_subject, batch_size=batch_size, strict=strict,
    )
