"""RESP (REdis Serialization Protocol) client — the wire half of the
Redis Streams sink (reference redis.rs drives the `redis` crate; this
is the same protocol spoken directly, stdlib-only, so the XADD path is
exercisable over a real TCP socket against any RESP2 server).

Covers what a pipelined XADD producer needs: command arrays of bulk
strings out, the five RESP2 reply types back (+simple, -error, :int,
$bulk, *array), pipelining (N commands, then N replies), and loud
``-ERR`` surfacing. Binary-safe by construction — lengths are
byte-counted, never delimiter-scanned.
"""

from __future__ import annotations

from typing import Any


class RespError(RuntimeError):
    """A ``-ERR``/``-WRONGTYPE``... reply, or protocol framing failure."""


def encode_command(*args: str | bytes | int | float) -> bytes:
    """``['XADD', 'stream', '*', 'k', 'v']`` → RESP array of bulk strings."""
    out = bytearray(f"*{len(args)}\r\n".encode())
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out += f"${len(b)}\r\n".encode() + b + b"\r\n"
    return bytes(out)


class RespReader:
    """Incremental RESP reply parser over arbitrary byte boundaries."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, chunk: bytes) -> None:
        self._buf += chunk

    def try_read(self) -> tuple[bool, Any]:
        """(True, reply) if one complete reply is buffered, else
        (False, None). ``-ERR`` replies come back as RespError
        INSTANCES (the pipeline layer decides whether to raise)."""
        got, value, rest = _parse(bytes(self._buf))
        if not got:
            return False, None
        del self._buf[: len(self._buf) - len(rest)]
        return True, value


def _parse(buf: bytes) -> tuple[bool, Any, bytes]:
    if not buf or b"\r\n" not in buf:
        return False, None, buf
    head, rest = buf.split(b"\r\n", 1)
    tag, body = head[:1], head[1:]
    if tag == b"+":
        return True, body.decode(), rest
    if tag == b"-":
        return True, RespError(body.decode()), rest
    if tag == b":":
        return True, int(body), rest
    if tag == b"$":
        n = int(body)
        if n == -1:
            return True, None, rest
        if len(rest) < n + 2:
            return False, None, buf
        if rest[n : n + 2] != b"\r\n":
            raise RespError("bulk string missing terminator")
        return True, rest[:n], rest[n + 2 :]
    if tag == b"*":
        n = int(body)
        if n == -1:
            return True, None, rest
        items = []
        cur = rest
        for _ in range(n):
            got, v, cur = _parse(cur)
            if not got:
                return False, None, buf
            items.append(v)
        return True, items, cur
    raise RespError(f"unknown RESP tag {tag!r}")


class RespClient:
    """Pipelined RESP client over a connected socket (anything with
    ``sendall``/``recv``). ``queue()`` commands, ``execute()`` flushes
    and reads one reply per queued command — the redis-py
    ``pipeline()`` shape the sink's partition writer expects."""

    def __init__(self, sock) -> None:
        self.sock = sock
        self._reader = RespReader()
        self._pending = 0
        self._out = bytearray()

    def queue(self, *args: str | bytes | int | float) -> None:
        self._out += encode_command(*args)
        self._pending += 1

    def execute(self) -> list[Any]:
        """Flush the pipeline; raise on the FIRST error reply (after
        draining all replies, so the connection stays usable)."""
        if self._pending == 0:
            return []
        self.sock.sendall(bytes(self._out))
        self._out = bytearray()
        replies: list[Any] = []
        while len(replies) < self._pending:
            got, value = self._reader.try_read()
            if got:
                replies.append(value)
                continue
            chunk = self.sock.recv(1 << 16)
            if not chunk:
                raise RespError("connection closed mid-reply")
            self._reader.feed(chunk)
        self._pending = 0
        errors = [r for r in replies if isinstance(r, RespError)]
        if errors:
            raise errors[0]
        return replies

    def command(self, *args: str | bytes | int | float) -> Any:
        self.queue(*args)
        return self.execute()[0]

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def resp_xadd_client_factory(host: str, port: int):
    """``write_client_sink``-shaped factory: one RESP connection per
    Spark partition, XADD commands pipelined until flush."""

    def factory():
        import socket as _socket

        client = RespClient(_socket.create_connection((host, port)))

        class _C:
            def send(self, dest, fields):
                args: list[Any] = ["XADD", dest, "*"]
                for k, v in fields.items():
                    args += [k, v]
                client.queue(*args)

            def flush(self):
                client.execute()

            def close(self):
                client.close()

        return _C()

    return factory


def redis_stream_sink_tcp(
    df,
    host: str,
    port: int,
    *,
    stream_template: str = "deltaforge",
    batch_size: int = 500,
) -> None:
    """The Redis Streams sink over a REAL socket: one RESP connection
    per partition, XADD commands pipelined ``batch_size`` at a time
    with the reference-exact field layout (redis.rs:439-479 via
    ``redis_xadd_fields``). Scale shape: executor-side fan-out, no
    driver hop; a pipeline flush is one round-trip per batch, not per
    row."""
    from .clients import redis_xadd_fields, write_client_sink

    write_client_sink(
        df, resp_xadd_client_factory(host, port),
        default_dest=stream_template, batch_size=batch_size,
        fields_fn=redis_xadd_fields,
    )
