"""ClickHouse RowBinary encoder/decoder (pure Python, byte-pinned).

The reference sink speaks RowBinary over HTTP (reference:
crates/sinks/src/clickhouse/rowbinary.rs:1-180 encode rules;
types.rs:8-57 the v1 type set; client.rs:127 ``INSERT INTO db.table
FORMAT RowBinary``); this module implements the same PUBLIC ClickHouse
wire format (documented at clickhouse.com/docs/interfaces/formats,
RowBinary section) independently in Python, so the Spark sink can post
the bytes the reference sink posts. In this format a row is just its
column values back-to-back with no framing: integer and float columns
are packed little-endian at their declared width; a ``String`` starts
with its byte length as a LEB128 varint and continues with the UTF-8
payload; wrapping a type in ``Nullable`` prepends a single presence
byte (``\\x01`` when the value is absent); a ``Decimal`` travels as its
scaled integer representation, with the storage width chosen from the
precision (32-bit up to 9 digits, 64-bit up to 18, 128-bit beyond);
``DateTime64(3)`` is the epoch-millisecond count as a signed 64-bit
integer; ``Bool`` and ``UInt8`` occupy one byte. ``LowCardinality``
is transparent on the wire — the dictionary encoding is a storage
concern, so the inner type's bytes are what travel.

Unlike the JSONEachRow path (which serializes JVM-side via ``to_json``),
RowBinary is encoded in Python per partition — the same place the
reference pays serde cost — batched per insert chunk so the per-row
overhead is a dict lookup + struct.pack, no Arrow round-trip.

The decoder exists for the loopback server tests (server-side decode =
the client's bytes are verified against an independent reading of the
spec) and for JSONEachRow parity asserts; a production consumer never
needs it.
"""

from __future__ import annotations

import json
import re
import struct
from datetime import date, datetime, timezone
from decimal import Decimal


class ChEncodeError(ValueError):
    """A value cannot be encoded as its declared ClickHouse type
    (rowbinary.rs EncodeError::Type — the caller DLQs or raises)."""

    def __init__(self, expected: str, got: object):
        super().__init__(f"RowBinary type mismatch: {expected} required, row value was {got!r}")
        self.expected = expected
        self.got = got


# A parsed column type: (kind, precision, scale). kind is one of
# uint8|int16|int32|int64|uint64|float64|string|decimal|datetime64_3|bool
ChSpec = tuple[str, int, int]

_SIMPLE = {
    "UInt8": "uint8",
    "Int16": "int16",
    "Int32": "int32",
    "Int64": "int64",
    "UInt64": "uint64",
    "Float64": "float64",
    "String": "string",
    "DateTime64(3)": "datetime64_3",
    "Bool": "bool",
}
_DECIMAL_RE = re.compile(r"^Decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


def parse_ch_type(ddl_type: str) -> tuple[ChSpec, bool]:
    """DDL type name → (spec, nullable). Accepts the v1 set emitted by
    ``map_spark_type`` / ``create_table_ddl``, with ``Nullable(...)``
    and ``LowCardinality(...)`` wrappers."""
    t = ddl_type.strip()
    nullable = False
    if t.startswith("Nullable(") and t.endswith(")"):
        nullable, t = True, t[len("Nullable(") : -1].strip()
    if t.startswith("LowCardinality(") and t.endswith(")"):
        t = t[len("LowCardinality(") : -1].strip()
    if t in _SIMPLE:
        return (_SIMPLE[t], 0, 0), nullable
    m = _DECIMAL_RE.match(t)
    if m:
        return ("decimal", int(m.group(1)), int(m.group(2))), nullable
    raise ValueError(f"unsupported ClickHouse type for RowBinary: {ddl_type!r}")


def write_varuint(buf: bytearray, n: int) -> None:
    """LEB128 var-uint (the String length prefix; rowbinary.rs:39-50)."""
    if n < 0:
        raise ValueError("varuint is unsigned")
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_varuint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _as_int(v: object, expected: str) -> int:
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    raise ChEncodeError(expected, v)


def _datetime_millis(v: object) -> int:
    """Epoch-ms for DateTime64(3): accepts an int (already ms), a
    datetime/date (naive = UTC, the engine convention everywhere in
    this repo), or an ISO-8601 string (rowbinary.rs:113-127)."""
    if isinstance(v, bool):
        raise ChEncodeError("DateTime64(3)", v)
    if isinstance(v, int):
        return v
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, date):
        dt = datetime(v.year, v.month, v.day, tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    if isinstance(v, str):
        try:
            dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            raise ChEncodeError("DateTime64(3)", v) from None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    raise ChEncodeError("DateTime64(3)", v)


def decimal_str_to_unscaled(text: str, scale: int) -> int:
    """``"12.34"``, scale 2 → 1234; ``"-1.2"``, scale 3 → -1200. Extra
    fractional digits TRUNCATE (not round) — rowbinary.rs:160-180."""
    neg = text.startswith("-")
    t = text.lstrip("+-")
    int_part, _, frac = t.partition(".")
    frac = frac[:scale].ljust(scale, "0")
    try:
        n = int((int_part or "0") + frac)
    except ValueError:
        raise ChEncodeError(f"Decimal(?, {scale})", text) from None
    return -n if neg else n


def _encode_decimal(buf: bytearray, p: int, s: int, v: object) -> None:
    if isinstance(v, bool):
        raise ChEncodeError(f"Decimal({p}, {s})", v)
    if isinstance(v, Decimal):
        text = format(v, "f")
    elif isinstance(v, (int, float)):
        text = repr(v) if isinstance(v, float) else str(v)
    elif isinstance(v, str):
        text = v
    else:
        raise ChEncodeError(f"Decimal({p}, {s})", v)
    n = decimal_str_to_unscaled(text, s)
    if p <= 9:
        buf += struct.pack("<i", n)
    elif p <= 18:
        buf += struct.pack("<q", n)
    else:
        buf += n.to_bytes(16, "little", signed=True)


def encode_value(buf: bytearray, spec: ChSpec, nullable: bool, v: object) -> None:
    """Append one value's RowBinary bytes (rowbinary.rs:53-105)."""
    kind, p, s = spec
    if nullable:
        if v is None:
            buf.append(1)
            return
        buf.append(0)
    elif v is None:
        raise ChEncodeError(f"non-null {kind}", v)

    if kind in ("bool", "uint8"):
        buf.append(_as_int(v, kind) & 0xFF)
    elif kind == "int16":
        buf += struct.pack("<h", _as_int(v, kind))
    elif kind == "int32":
        buf += struct.pack("<i", _as_int(v, kind))
    elif kind == "int64":
        buf += struct.pack("<q", _as_int(v, kind))
    elif kind == "uint64":
        buf += struct.pack("<Q", _as_int(v, kind) & 0xFFFFFFFFFFFFFFFF)
    elif kind == "float64":
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ChEncodeError(kind, v)
        buf += struct.pack("<d", float(v))
    elif kind == "datetime64_3":
        buf += struct.pack("<q", _datetime_millis(v))
    elif kind == "decimal":
        _encode_decimal(buf, p, s, v)
    elif kind == "string":
        if isinstance(v, str):
            raw = v.encode("utf-8")
        elif isinstance(v, (bytes, bytearray)):
            raw = bytes(v)
        else:
            # numbers/bools/objects → JSON text (rowbinary.rs:96-99)
            raw = json.dumps(v, separators=(",", ":"), default=str).encode("utf-8")
        write_varuint(buf, len(raw))
        buf += raw
    else:  # pragma: no cover — parse_ch_type guards the kind set
        raise ChEncodeError(kind, v)


# --------------------------------------------------------------- row helpers

# A column layout: list of (name, spec, nullable) in table-DDL order.
ChLayout = list[tuple[str, ChSpec, bool]]


def layout_from_ddl_types(cols: list[tuple[str, str]]) -> ChLayout:
    """[(name, ddl_type)] → layout, e.g. from ``map_spark_type`` output."""
    out: ChLayout = []
    for name, ddl_type in cols:
        spec, nullable = parse_ch_type(ddl_type)
        out.append((name, spec, nullable))
    return out


def encode_row(buf: bytearray, layout: ChLayout, values: tuple) -> None:
    for (name, spec, nullable), v in zip(layout, values):
        try:
            encode_value(buf, spec, nullable, v)
        except ChEncodeError as e:
            raise ChEncodeError(f"{name}: {e.expected}", e.got) from None


def encode_rows(layout: ChLayout, rows: list[tuple]) -> bytes:
    buf = bytearray()
    for row in rows:
        encode_row(buf, layout, row)
    return bytes(buf)


# ------------------------------------------------------------------ decoding


def _decode_value(data: bytes, pos: int, spec: ChSpec, nullable: bool):
    kind, p, s = spec
    if nullable:
        flag = data[pos]
        pos += 1
        if flag == 1:
            return None, pos
    if kind in ("bool", "uint8"):
        return data[pos], pos + 1
    if kind == "int16":
        return struct.unpack_from("<h", data, pos)[0], pos + 2
    if kind == "int32":
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if kind == "int64":
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    if kind == "uint64":
        return struct.unpack_from("<Q", data, pos)[0], pos + 8
    if kind == "float64":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if kind == "datetime64_3":
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    if kind == "decimal":
        if p <= 9:
            n, w = struct.unpack_from("<i", data, pos)[0], 4
        elif p <= 18:
            n, w = struct.unpack_from("<q", data, pos)[0], 8
        else:
            n, w = int.from_bytes(data[pos : pos + 16], "little", signed=True), 16
        return Decimal(n).scaleb(-s), pos + w
    if kind == "string":
        ln, pos = read_varuint(data, pos)
        return data[pos : pos + ln].decode("utf-8"), pos + ln
    raise ValueError(f"unsupported kind {kind}")  # pragma: no cover


def decode_rows(layout: ChLayout, data: bytes) -> list[dict]:
    """Decode a RowBinary body back into dict rows (test/loopback-server
    verification path). Raises if the body ends mid-row or has trailing
    bytes — framing errors must be loud."""
    rows: list[dict] = []
    pos = 0
    while pos < len(data):
        row = {}
        for name, spec, nullable in layout:
            v, pos = _decode_value(data, pos, spec, nullable)
            row[name] = v
        rows.append(row)
    if pos != len(data):  # pragma: no cover — loop exits exactly at len
        raise ValueError("trailing bytes after last RowBinary row")
    return rows
