"""JSON Schema export of inferred payload schemas.

Mirrors the reference's sensing export (reference:
crates/schema-sensing/src/json_schema.rs:82-196): inferred schema →
a draft-2020-12 JSON Schema subset — type / properties / items /
required / format — with a depth limit of 10 that degrades to a
``(depth limit reached)`` description, binary as base64 string with
``format: byte``, and non-nullable struct fields listed as required.

Input is a Spark ``DataType`` (what ``schema_of_json`` /
``spark.read.json`` inference produces), so the export composes with
the sensing layer's ``infer_json_schema`` directly. Pure driver-side
metadata transform — no jobs, no data movement.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

SCHEMA_URI = "https://json-schema.org/draft/2020-12/schema"
MAX_DEPTH = 10


def _convert(dt: T.DataType, depth: int) -> dict[str, Any]:
    if depth > MAX_DEPTH:
        return {"description": "(depth limit reached)"}
    if isinstance(dt, T.NullType):
        return {"type": "null"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": "integer"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.BinaryType):
        return {
            "type": "string",
            "format": "byte",
            "description": "Base64-encoded binary data",
        }
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        # inference over JSON text yields strings for these; keep the
        # format hint when a typed source produced the schema
        return {"type": "string", "format": "date-time"}
    if isinstance(dt, T.StringType):
        return {"type": "string"}
    if isinstance(dt, T.ArrayType):
        out: dict[str, Any] = {"type": "array"}
        out["items"] = _convert(dt.elementType, depth + 1)
        return out
    if isinstance(dt, T.MapType):
        # dynamic string-keyed payloads (the sensing layer's map-vs-
        # struct classifier routes high-cardinality objects here)
        return {"type": "object", "additionalProperties": True}
    if isinstance(dt, T.StructType):
        out = {"type": "object"}
        props: dict[str, Any] = {}
        required: list[str] = []
        for f in dt.fields:
            props[f.name] = _convert(f.dataType, depth + 1)
            if not f.nullable:
                required.append(f.name)
        if props:
            out["properties"] = props
        if required:
            out["required"] = required
        return out
    # remaining scalar types serialize as strings on the JSON wire
    return {"type": "string"}


def to_json_schema(dt: T.DataType) -> dict[str, Any]:
    """Export a (typically inferred) Spark type as a JSON Schema dict;
    the top-level document carries the draft 2020-12 ``$schema`` URI."""
    out = {"$schema": SCHEMA_URI}
    out.update(_convert(dt, 0))
    return out


def to_json_schema_string(dt: T.DataType, *, indent: int | None = None) -> str:
    return json.dumps(to_json_schema(dt), indent=indent, sort_keys=True)
