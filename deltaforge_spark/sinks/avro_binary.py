"""Pure-Python Avro binary codec for the CDC envelope path.

Closes the "Avro end-to-end" gap: the container has no spark-avro jar,
so ``to_avro`` is unusable — but Avro binary encoding itself is a tiny
deterministic format (zigzag varints, length-prefixed bytes, field
order from the schema). This module compiles the schema JSON produced
by ``avro_schema.build_envelope_schema`` into an encoder, applied over
Arrow batches via ``mapInPandas`` (never per-row Python in the JVM
plan; one Python stage, vectorized transfer).

Reference parity: crates/deltaforge-core/src/encoding/avro.rs:3-270
(Confluent wire format + apache-avro crate binary encoding). The byte
output is checked against the Avro 1.11 specification's worked example
(record {"a": long 27, "b": string "foo"} -> 36 06 66 6f 6f) in
tests/test_avro_binary.py, plus a full decode round-trip.

Scale note: encoding is embarrassingly parallel (map-only, no shuffle);
the schema is compiled once per executor via closure capture, and the
Confluent 5-byte header is baked into the prefix bytes — the hot loop
is append-only buffer writes.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import struct as _struct
from decimal import Decimal
from typing import Any, Callable, Iterator

_EPOCH_DATE = _dt.date(1970, 1, 1)


# ----------------------------------------------------------- primitives


def zigzag(n: int) -> bytes:
    """Avro long: zigzag then LEB128 varint."""
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _is_null(v: Any) -> bool:
    if v is None:
        return True
    # pandas NA / NaN scalars in object columns
    try:
        return isinstance(v, float) and math.isnan(v)
    except Exception:
        return False


# ------------------------------------------------------------- encoder


class AvroBinaryCodec:
    """Schema-compiled Avro binary encoder + decoder.

    Supports every type the envelope generator emits: null, boolean,
    int, long, float, double, bytes, string, record, enum, array, map,
    fixed, unions, and the date / timestamp-millis logical types.
    Named-type references resolve against previously defined names
    (the generator inlines everything, but references stay legal).
    """

    def __init__(self, schema: dict | str):
        if isinstance(schema, str):
            schema = json.loads(schema)
        self.schema = schema
        self._named: dict[str, Any] = {}
        self._collect_names(schema, None)

    # -- named-type registry (records/enums/fixed referenced by name)
    def _collect_names(self, node: Any, namespace: str | None) -> None:
        if isinstance(node, list):
            for b in node:
                self._collect_names(b, namespace)
            return
        if not isinstance(node, dict):
            return
        t = node.get("type")
        ns = node.get("namespace", namespace)
        if t in ("record", "enum", "fixed") and "name" in node:
            name = node["name"]
            full = f"{ns}.{name}" if ns and "." not in name else name
            self._named[full] = node
            self._named.setdefault(name, node)
        if t == "record":
            for f in node.get("fields", []):
                self._collect_names(f.get("type"), ns)
        elif t == "array":
            self._collect_names(node.get("items"), ns)
        elif t == "map":
            self._collect_names(node.get("values"), ns)

    def _resolve(self, node: Any) -> Any:
        if isinstance(node, str) and node in self._named:
            return self._named[node]
        return node

    # ------------------------------------------------------------ encode

    def encode(self, value: Any, node: Any = None, out: bytearray | None = None) -> bytes:
        buf = bytearray() if out is None else out
        self._enc(value, self.schema if node is None else node, buf)
        return bytes(buf)

    def _enc(self, v: Any, node: Any, buf: bytearray) -> None:
        node = self._resolve(node)
        if isinstance(node, list):  # union: branch index then branch body
            idx, branch = self._pick_branch(v, node)
            buf += zigzag(idx)
            if branch != "null":
                self._enc(v, branch, buf)
            return
        t = node["type"] if isinstance(node, dict) else node
        if isinstance(t, (dict, list)):  # {"type": {"type": "array", ...}}
            self._enc(v, t, buf)
            return
        if t == "null":
            return
        if t == "boolean":
            buf.append(1 if v else 0)
        elif t in ("int", "long"):
            buf += zigzag(self._to_int(v, node))
        elif t == "float":
            buf += _struct.pack("<f", float(v))
        elif t == "double":
            buf += _struct.pack("<d", float(v))
        elif t == "bytes":
            b = bytes(v)
            buf += zigzag(len(b))
            buf += b
        elif t == "string":
            b = (v if isinstance(v, str) else _coerce_str(v)).encode("utf-8")
            buf += zigzag(len(b))
            buf += b
        elif t == "record":
            for f in node["fields"]:
                fv = v.get(f["name"]) if isinstance(v, dict) else getattr(v, f["name"])
                self._enc(fv, f["type"], buf)
        elif t == "enum":
            buf += zigzag(node["symbols"].index(v))
        elif t == "array":
            items = list(v)
            if items:
                buf += zigzag(len(items))
                for it in items:
                    self._enc(it, node["items"], buf)
            buf += zigzag(0)
        elif t == "map":
            entries = list(v.items())
            if entries:
                buf += zigzag(len(entries))
                for k, mv in entries:
                    self._enc(k, "string", buf)
                    self._enc(mv, node["values"], buf)
            buf += zigzag(0)
        elif t == "fixed":
            b = bytes(v)
            if len(b) != node["size"]:
                raise ValueError(f"fixed size {node['size']} != {len(b)}")
            buf += b
        else:
            raise ValueError(f"unsupported avro type {t!r}")

    def _pick_branch(self, v: Any, union: list) -> tuple[int, Any]:
        branches = [self._resolve(b) for b in union]
        kinds = [b["type"] if isinstance(b, dict) else b for b in branches]
        if _is_null(v) and "null" in kinds and not (
            isinstance(v, float) and ("double" in kinds or "float" in kinds)
        ):
            return kinds.index("null"), "null"
        for i, (b, k) in enumerate(zip(branches, kinds)):
            if k == "null":
                continue
            if _match_branch(v, k):
                return i, b
        # fall back to the first non-null branch (generator unions are
        # always ["null", X], so this is the X branch)
        for i, k in enumerate(kinds):
            if k != "null":
                return i, branches[i]
        raise ValueError(f"no union branch for {type(v)}")

    @staticmethod
    def _to_int(v: Any, node: Any) -> int:
        logical = node.get("logicalType") if isinstance(node, dict) else None
        if logical == "date" and isinstance(v, (_dt.date, _dt.datetime)):
            d = v.date() if isinstance(v, _dt.datetime) else v
            return (d - _EPOCH_DATE).days
        if logical in ("timestamp-millis", "timestamp-micros"):
            scale = 1000 if logical == "timestamp-millis" else 1000000
            if hasattr(v, "value"):  # pandas Timestamp: ns since epoch
                return int(v.value) // (1000000000 // scale)
            if isinstance(v, _dt.datetime):
                epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                return int((v - epoch).total_seconds() * scale)
        return int(v)

    # ------------------------------------------------------------ decode

    def decode(self, data: bytes, node: Any = None) -> Any:
        v, pos = self._dec(data, 0, self.schema if node is None else node)
        return v

    def _dec(self, buf: bytes, pos: int, node: Any) -> tuple[Any, int]:
        node = self._resolve(node)
        if isinstance(node, list):
            idx, pos = _read_zigzag(buf, pos)
            return self._dec(buf, pos, node[idx])
        t = node["type"] if isinstance(node, dict) else node
        if isinstance(t, (dict, list)):
            return self._dec(buf, pos, t)
        if t == "null":
            return None, pos
        if t == "boolean":
            return buf[pos] == 1, pos + 1
        if t in ("int", "long"):
            return _read_zigzag(buf, pos)
        if t == "float":
            return _struct.unpack_from("<f", buf, pos)[0], pos + 4
        if t == "double":
            return _struct.unpack_from("<d", buf, pos)[0], pos + 8
        if t in ("bytes", "string"):
            n, pos = _read_zigzag(buf, pos)
            raw = bytes(buf[pos : pos + n])
            return (raw.decode("utf-8") if t == "string" else raw), pos + n
        if t == "record":
            rec = {}
            for f in node["fields"]:
                rec[f["name"]], pos = self._dec(buf, pos, f["type"])
            return rec, pos
        if t == "enum":
            i, pos = _read_zigzag(buf, pos)
            return node["symbols"][i], pos
        if t == "array":
            items = []
            while True:
                n, pos = _read_zigzag(buf, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # block with byte-size prefix
                    _, pos = _read_zigzag(buf, pos)
                    n = -n
                for _ in range(n):
                    it, pos = self._dec(buf, pos, node["items"])
                    items.append(it)
        if t == "map":
            m = {}
            while True:
                n, pos = _read_zigzag(buf, pos)
                if n == 0:
                    return m, pos
                if n < 0:
                    _, pos = _read_zigzag(buf, pos)
                    n = -n
                for _ in range(n):
                    k, pos = self._dec(buf, pos, "string")
                    m[k], pos = self._dec(buf, pos, node["values"])
        if t == "fixed":
            return bytes(buf[pos : pos + node["size"]]), pos + node["size"]
        raise ValueError(f"unsupported avro type {t!r}")


def _coerce_str(v: Any) -> str:
    if isinstance(v, Decimal):
        return str(v)  # fixed-scale repr, matches decimal-as-string policy
    return str(v)


def _match_branch(v: Any, kind: str) -> bool:
    if kind == "boolean":
        return isinstance(v, bool)
    if kind in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool) or hasattr(v, "value")
    if kind in ("float", "double"):
        return isinstance(v, float) or isinstance(v, int)
    if kind == "string":
        return isinstance(v, (str, Decimal))
    if kind == "bytes":
        return isinstance(v, (bytes, bytearray, memoryview))
    if kind == "record":
        return isinstance(v, dict)
    if kind == "array":
        return isinstance(v, (list, tuple))
    if kind == "map":
        return isinstance(v, dict)
    if kind == "enum":
        return isinstance(v, str)
    if kind == "fixed":
        return isinstance(v, (bytes, bytearray))
    return False


# ----------------------------------------------------- Spark integration


def _clean_row(d: dict) -> dict:
    """Arrow→pandas puts np scalars / NaN into object cells; normalize
    so the codec's union resolution sees plain Python values."""
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out[k] = _clean_row(v)
        elif hasattr(v, "item") and not hasattr(v, "value"):  # numpy scalar
            out[k] = v.item()
        else:
            out[k] = v
    return out


def avro_frame_rows(
    df,
    schema_json: dict | str,
    *,
    schema_id: int,
    key_col: str | None = None,
    passthrough: list[str] | None = None,
):
    """Envelope rows → Confluent-framed Avro binary via one Arrow-batched
    mapInPandas stage (map-only, no shuffle). Output schema:
    ``key string, value binary`` plus any ``passthrough`` columns copied
    verbatim (e.g. per-row ``topic`` for the Kafka writer contract).

    The top-level Avro record's fields must be a subset of df's columns
    (``plan_avro_encoding`` guarantees this for the envelope shape).
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    schema_str = (
        schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    )
    prefix = bytes([0]) + _struct.pack(">i", schema_id)
    key_name = key_col
    extra = list(passthrough or [])
    out_ddl = "key string, value binary" + "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in extra
    )

    def encode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        codec = AvroBinaryCodec(schema_str)
        fields = [f["name"] for f in codec.schema["fields"]]
        for pdf in batches:
            keys = (
                pdf[key_name].astype(str)
                if key_name is not None
                else pd.Series([""] * len(pdf), index=pdf.index, dtype=str)
            )
            values = []
            for _, row in pdf.iterrows():
                rec = _clean_row({f: row[f] for f in fields})
                values.append(prefix + codec.encode(rec))
            out = {"key": keys.tolist(), "value": values}
            for c in extra:
                out[c] = pdf[c].tolist()
            yield pd.DataFrame(out)

    return df.mapInPandas(encode_batches, schema=out_ddl)


def decode_confluent_frame(
    frame: bytes, schema_json: dict | str
) -> tuple[int, Any]:
    """Test-side inverse: (schema_id, decoded record)."""
    if frame[0] != 0:
        raise ValueError("bad magic byte")
    schema_id = _struct.unpack_from(">i", frame, 1)[0]
    return schema_id, AvroBinaryCodec(schema_json).decode(frame[5:])
