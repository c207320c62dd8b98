"""MySQL binary JSON (JSONB) codec — the on-the-wire format binlog row
events carry for ``JSON`` columns.

The reference decodes these bytes with its connector's jsonb parser and
falls back to text (handle_json, crates/sources/src/mysql/mysql_object.rs:54-67);
the byte grammar itself is MySQL's public json_binary format
(sql/json_binary.h documentation): a type byte then a payload —

====  =======================  =========================================
type  meaning                  payload
====  =======================  =========================================
0x00  small object             u16 count, u16 size, key entries
                               (u16 offset, u16 len), value entries
                               (type + u16 inlined-or-offset), keys, vals
0x01  large object             same but u32 count/size/offsets
0x02  small array              u16 count, u16 size, value entries, vals
0x03  large array              u32 variant
0x04  literal                  0x00 null / 0x01 true / 0x02 false
0x05  int16   (inlineable)     2 bytes LE
0x06  uint16  (inlineable)     2 bytes LE
0x07  int32   (large-inline)   4 bytes LE
0x08  uint32  (large-inline)   4 bytes LE
0x09  int64                    8 bytes LE
0x0a  uint64                   8 bytes LE
0x0b  double                   8 bytes LE IEEE-754
0x0c  string                   LEB128 varint length, utf8 bytes
====  =======================  =========================================

Offsets are measured from the start of the enclosing object/array
payload (the byte after its type byte). Small containers may inline
literal/int16/uint16 values in the 2-byte offset slot; large containers
additionally inline int32/uint32 in their 4-byte slot.

Both directions implemented: encode is the fixture generator for the
binlog synth stream, decode is the product path — and both are
byte-pinned in tests so they can't drift into a private dialect.
"""

from __future__ import annotations

import struct
from typing import Any


class JsonbError(ValueError):
    """Malformed JSONB bytes (truncated, bad type, offset out of range)."""


TYPE_SMALL_OBJECT = 0x00
TYPE_LARGE_OBJECT = 0x01
TYPE_SMALL_ARRAY = 0x02
TYPE_LARGE_ARRAY = 0x03
TYPE_LITERAL = 0x04
TYPE_INT16 = 0x05
TYPE_UINT16 = 0x06
TYPE_INT32 = 0x07
TYPE_UINT32 = 0x08
TYPE_INT64 = 0x09
TYPE_UINT64 = 0x0A
TYPE_DOUBLE = 0x0B
TYPE_STRING = 0x0C

LITERAL_NULL = 0x00
LITERAL_TRUE = 0x01
LITERAL_FALSE = 0x02


def _varint_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint_decode(buf: bytes, off: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        if off >= len(buf):
            raise JsonbError("varint truncated")
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7
        if shift > 35:
            raise JsonbError("varint too long")


# ------------------------------------------------------------------
# encode
# ------------------------------------------------------------------


def _scalar_type_and_payload(v: Any) -> tuple[int, bytes]:
    """(type byte, payload bytes) for a non-container value."""
    if v is None:
        return TYPE_LITERAL, bytes([LITERAL_NULL])
    if v is True:
        return TYPE_LITERAL, bytes([LITERAL_TRUE])
    if v is False:
        return TYPE_LITERAL, bytes([LITERAL_FALSE])
    if isinstance(v, int):
        if -(1 << 15) <= v < 1 << 15:
            return TYPE_INT16, struct.pack("<h", v)
        if -(1 << 31) <= v < 1 << 31:
            return TYPE_INT32, struct.pack("<i", v)
        if -(1 << 63) <= v < 1 << 63:
            return TYPE_INT64, struct.pack("<q", v)
        if v < 1 << 64:
            return TYPE_UINT64, struct.pack("<Q", v)
        raise JsonbError(f"integer {v} out of JSONB range")
    if isinstance(v, float):
        return TYPE_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return TYPE_STRING, _varint_encode(len(b)) + b
    raise JsonbError(f"unsupported scalar {type(v).__name__}")


def _encode_value_payload(v: Any) -> tuple[int, bytes]:
    """(type byte, payload) for any value, containers included."""
    if isinstance(v, dict):
        return _encode_container(sorted(v.items()), is_object=True)
    if isinstance(v, (list, tuple)):
        return _encode_container([(None, x) for x in v], is_object=False)
    return _scalar_type_and_payload(v)


def _encode_container(
    items: list[tuple[Any, Any]], *, is_object: bool
) -> tuple[int, bytes]:
    # Encode children first to know sizes; then try small format, fall
    # back to large when any offset/size exceeds u16.
    encoded: list[tuple[int, bytes]] = [ _encode_value_payload(v) for _, v in items ]
    keys = [str(k).encode("utf-8") for k, _ in items] if is_object else []
    for small in (True, False):
        w = 2 if small else 4
        inline_ok = (
            {TYPE_LITERAL, TYPE_INT16, TYPE_UINT16}
            if small
            else {TYPE_LITERAL, TYPE_INT16, TYPE_UINT16, TYPE_INT32, TYPE_UINT32}
        )
        n = len(items)
        header = 2 * w
        entry_bytes = (w + 2 if is_object else 0) * n + (1 + w) * n
        # key area then non-inlined value area
        off = header + entry_bytes
        key_offsets = []
        for kb in keys:
            key_offsets.append(off)
            off += len(kb)
        val_entries = bytearray()
        val_area = bytearray()
        ok = True
        for t, payload in encoded:
            if t in inline_ok and len(payload) <= w:
                val_entries.append(t)
                val_entries += payload.ljust(w, b"\x00")
            else:
                if small and off + len(payload) > 0xFFFF:
                    ok = False
                    break
                val_entries.append(t)
                val_entries += off.to_bytes(w, "little")
                val_area += payload
                off += len(payload)
        if not ok:
            continue
        total = off
        if small and (total > 0xFFFF or any(ko > 0xFFFF for ko in key_offsets)):
            continue
        out = bytearray()
        out += n.to_bytes(w, "little")
        out += total.to_bytes(w, "little")
        if is_object:
            for ko, kb in zip(key_offsets, keys):
                if len(kb) > 0xFFFF:
                    raise JsonbError("object key longer than u16")
                out += ko.to_bytes(w, "little")
                out += len(kb).to_bytes(2, "little")
        out += val_entries
        for kb in keys:
            out += kb
        out += val_area
        if is_object:
            t = TYPE_SMALL_OBJECT if small else TYPE_LARGE_OBJECT
        else:
            t = TYPE_SMALL_ARRAY if small else TYPE_LARGE_ARRAY
        return t, bytes(out)
    raise JsonbError("container does not fit JSONB addressing")


def jsonb_encode(v: Any) -> bytes:
    """Full JSONB value: type byte + payload."""
    t, payload = _encode_value_payload(v)
    return bytes([t]) + payload


# ------------------------------------------------------------------
# decode
# ------------------------------------------------------------------


def jsonb_decode(buf: bytes) -> Any:
    """Parse a full JSONB value (type byte + payload)."""
    if not buf:
        raise JsonbError("empty jsonb value")
    return _decode_typed(buf[0], buf[1:], full=True)


def _decode_typed(t: int, payload: bytes, *, full: bool) -> Any:
    # loud-decode contract (found by protocol fuzzing): truncated bytes
    # raise the documented JsonbError, never a bare IndexError/
    # struct.error. Enforced by the try/except at the bottom instead of
    # an upfront width lookup — this function runs once per value of
    # every JSON column of every decoded row, and on 3.11 the zero-cost
    # try keeps the happy path free where a per-call dict get measurably
    # taxed the binlog decode kernels.
    try:
        return _decode_typed_unchecked(t, payload, full=full)
    except (IndexError, struct.error) as e:
        raise JsonbError(f"value payload truncated (type {t:#x})") from e


def _decode_typed_unchecked(t: int, payload: bytes, *, full: bool) -> Any:
    if t == TYPE_LITERAL:
        lit = payload[0]
        if lit == LITERAL_NULL:
            return None
        if lit == LITERAL_TRUE:
            return True
        if lit == LITERAL_FALSE:
            return False
        raise JsonbError(f"bad literal {lit:#x}")
    if t == TYPE_INT16:
        return struct.unpack_from("<h", payload)[0]
    if t == TYPE_UINT16:
        return struct.unpack_from("<H", payload)[0]
    if t == TYPE_INT32:
        return struct.unpack_from("<i", payload)[0]
    if t == TYPE_UINT32:
        return struct.unpack_from("<I", payload)[0]
    if t == TYPE_INT64:
        return struct.unpack_from("<q", payload)[0]
    if t == TYPE_UINT64:
        return struct.unpack_from("<Q", payload)[0]
    if t == TYPE_DOUBLE:
        return struct.unpack_from("<d", payload)[0]
    if t == TYPE_STRING:
        n, off = _varint_decode(payload, 0)
        if off + n > len(payload):
            raise JsonbError("string overruns value")
        return payload[off : off + n].decode("utf-8")
    if t in (TYPE_SMALL_OBJECT, TYPE_LARGE_OBJECT, TYPE_SMALL_ARRAY, TYPE_LARGE_ARRAY):
        return _decode_container(t, payload)
    raise JsonbError(f"unsupported jsonb type {t:#x}")


_HDR_SMALL = struct.Struct("<HH")
_HDR_LARGE = struct.Struct("<II")
# per-call set literals alloc'd measurably in the binlog decode kernels
_INLINE_SMALL = frozenset((TYPE_LITERAL, TYPE_INT16, TYPE_UINT16))
_INLINE_LARGE = frozenset(
    (TYPE_LITERAL, TYPE_INT16, TYPE_UINT16, TYPE_INT32, TYPE_UINT32)
)


def _decode_container(t: int, payload: bytes) -> Any:
    small = t in (TYPE_SMALL_OBJECT, TYPE_SMALL_ARRAY)
    is_object = t in (TYPE_SMALL_OBJECT, TYPE_LARGE_OBJECT)
    w = 2 if small else 4
    if len(payload) < 2 * w:
        raise JsonbError("container header truncated")
    n, total = (_HDR_SMALL if small else _HDR_LARGE).unpack_from(payload)
    if total > len(payload):
        raise JsonbError("container size exceeds available bytes")
    inline_ok = _INLINE_SMALL if small else _INLINE_LARGE
    p = 2 * w
    keys: list[str] = []
    if is_object:
        # all key metas in ONE unpack (little-endian: no padding)
        try:
            key_meta = struct.unpack_from("<" + ("HH" if small else "IH") * n, payload, p)
        except struct.error as e:
            raise JsonbError("key metadata truncated") from e
        p += n * (w + 2)
        for i in range(0, 2 * n, 2):
            ko, kl = key_meta[i], key_meta[i + 1]
            if ko + kl > total:
                raise JsonbError("key offset out of range")
            keys.append(payload[ko : ko + kl].decode("utf-8"))
    values: list[Any] = []
    for _ in range(n):
        if p + 1 + w > len(payload):
            raise JsonbError("value entries truncated")
        vt = payload[p]
        slot = payload[p + 1 : p + 1 + w]
        p += 1 + w
        if vt in inline_ok:
            values.append(_decode_typed(vt, slot, full=False))
        else:
            off = int.from_bytes(slot, "little")
            if off > total:
                raise JsonbError("value offset out of range")
            values.append(_decode_typed(vt, payload[off:total], full=False))
    if is_object:
        return dict(zip(keys, values))
    return values
