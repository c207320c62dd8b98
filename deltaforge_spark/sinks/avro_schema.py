"""Avro schema generation + Schema Registry client for the CDC envelope.

Re-expresses the reference's schema layer (reference:
crates/deltaforge-core/src/encoding/avro_schema.rs — the fixed envelope
record structure: Envelope{before:["null",BeforeValue], after:["null",
AfterValue], source:Source{…, position:["null",<connector Position>]},
op, ts_ms, event_id, schema_version, transaction:["null",Transaction]}
with namespaces ``deltaforge.cdc[.{connector}.{db}.{table}]`` and
Before/After inlined as independent records (no Ref nodes);
avro_types.rs — MySQL/PG column-type → Avro field rules with the
Exact/Lossy/Unsafe policies (unsigned-bigint → string|long, enum →
string|enum, naive timestamp → string|timestamp-millis, decimal →
string); avro.rs:100-250 — Schema Registry client with per-subject
(id, schema) cache).

Three entry points, matching the reference's paths:
- Path A (DDL-authoritative): ``mysql_column_to_avro`` /
  ``postgres_column_to_avro`` over captured column descriptors
  (sources/ddl.py ColumnDesc shape).
- Path B (Spark-schema): ``spark_type_to_avro`` /
  ``value_fields_from_struct`` derive the Value record from the
  envelope's after-struct — used when the pipeline already normalized
  types (functions/typerules.py).
- Assembly: ``build_envelope_schema`` + ``subject_name`` +
  ``confluent_frame`` produce the registered schema and the framed
  payload; ``SchemaRegistryClient`` caches subject → id over an
  injected HTTP transport (no registry in this container).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import types as T


# ----------------------------------------------------------- type-rule opts


@dataclass
class TypeConversionOpts:
    """avro_types.rs TypeConversionOpts: safe string defaults."""

    unsigned_bigint_mode: str = "string"  # string | long
    enum_mode: str = "string"  # string | enum
    naive_timestamp_mode: str = "string"  # string | timestamp


@dataclass
class ColumnDesc:
    """Connector-agnostic column description (avro_types.rs ColumnDesc)."""

    name: str
    data_type: str
    column_type: str = ""
    nullable: bool = True
    precision: int | None = None
    scale: int | None = None
    unsigned: bool = False
    is_array: bool = False
    element_type: str | None = None


def _wrap_field(name: str, avro_type: Any, nullable: bool) -> dict:
    if nullable:
        return {"name": name, "type": ["null", avro_type], "default": None}
    return {"name": name, "type": avro_type}


# -------------------------------------------------------------- MySQL rules


def _parse_mysql_enum_values(column_type: str) -> list[str]:
    m = re.search(r"enum\((.*?)\)", column_type, re.IGNORECASE)
    if not m:
        return []
    return [s.strip().strip("'") for s in m.group(1).split(",") if s.strip().strip("'")]


def mysql_column_to_avro(col: ColumnDesc, opts: TypeConversionOpts | None = None) -> dict:
    """MySQL column → Avro field (avro_types.rs mysql_type_to_avro)."""
    opts = opts or TypeConversionOpts()
    dt = col.data_type.lower()
    if dt in ("tinyint", "smallint", "mediumint"):
        t: Any = "int"
    elif dt in ("int", "integer"):
        t = "long" if col.unsigned else "int"  # INT UNSIGNED fits in long
    elif dt == "bigint":
        if col.unsigned:
            t = "string" if opts.unsigned_bigint_mode == "string" else "long"
        else:
            t = "long"
    elif dt == "float":
        t = "float"
    elif dt in ("double", "real"):
        t = "double"
    elif dt in ("decimal", "numeric"):
        t = "string"  # two's-complement decimal deferred, same as reference
    elif dt in ("varchar", "char", "text", "tinytext", "mediumtext", "longtext"):
        t = "string"
    elif dt in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob"):
        t = "bytes"
    elif dt == "date":
        t = {"type": "int", "logicalType": "date"}
    elif dt == "datetime":
        t = (
            "string"
            if opts.naive_timestamp_mode == "string"
            else {"type": "long", "logicalType": "timestamp-millis"}
        )
    elif dt == "timestamp":
        t = {"type": "long", "logicalType": "timestamp-millis"}
    elif dt == "time":
        t = {"type": "long", "logicalType": "time-millis"}
    elif dt == "year":
        t = "int"
    elif dt in ("boolean", "bool") or (dt == "bit" and col.precision == 1):
        t = "boolean"
    elif dt == "bit":
        t = "bytes"
    elif dt == "json":
        t = "string"
    elif dt == "enum":
        if opts.enum_mode == "string":
            t = "string"
        else:
            symbols = _parse_mysql_enum_values(col.column_type)
            t = (
                {"type": "enum", "name": f"{col.name}_enum", "symbols": symbols}
                if symbols
                else "string"
            )
    elif dt == "set":
        t = "string"
    else:
        t = "string"  # catch-all: lossy
    return _wrap_field(col.name, t, col.nullable)


# ----------------------------------------------------------------- PG rules


def _normalize_pg_type(data_type: str) -> str:
    s = data_type.lower().strip()
    if s.startswith("character varying"):
        return "varchar"
    if s.startswith("character(") or s == "character":
        return "char"
    if s.startswith(("numeric(", "numeric")):
        return "numeric" if s.startswith("numeric") else s
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("timestamptz") or (s.startswith("timestamp") and "with time zone" in s):
        return "timestamptz"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("timetz") or (s.startswith("time") and "with time zone" in s):
        return "timetz"
    if s.startswith("time"):
        return "time"
    if s.startswith("double precision"):
        return "double precision"
    return re.sub(r"\(.*\)", "", s).strip()


_PG_SCALAR: dict[str, Any] = {
    "smallint": "int",
    "int2": "int",
    "integer": "int",
    "int": "int",
    "int4": "int",
    "bigint": "long",
    "int8": "long",
    "serial": "int",
    "bigserial": "long",
    "smallserial": "int",
    "real": "float",
    "float4": "float",
    "double precision": "double",
    "float8": "double",
    "numeric": "string",
    "decimal": "string",
    "boolean": "boolean",
    "bool": "boolean",
    "text": "string",
    "varchar": "string",
    "char": "string",
    "name": "string",
    "citext": "string",
    "bytea": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamptz": {"type": "long", "logicalType": "timestamp-micros"},
    "time": {"type": "long", "logicalType": "time-micros"},
    "timetz": "string",  # offset would be lost as time-micros
    "interval": "string",
    "uuid": {"type": "string", "logicalType": "uuid"},
    "json": "string",
    "jsonb": "string",
    "inet": "string",
    "cidr": "string",
    "macaddr": "string",
    "macaddr8": "string",
    "hstore": {"type": "map", "values": "string"},
    "money": "string",
    "xml": "string",
}


def _pg_scalar_to_avro(data_type: str, opts: TypeConversionOpts) -> Any:
    norm = _normalize_pg_type(data_type)
    if norm == "timestamp":
        return (
            "string"
            if opts.naive_timestamp_mode == "string"
            else {"type": "long", "logicalType": "timestamp-micros"}
        )
    if norm.endswith("range"):
        return "string"
    if norm in ("point", "line", "lseg", "box", "path", "polygon", "circle"):
        return "string"
    return _PG_SCALAR.get(norm, "string")


def postgres_column_to_avro(
    col: ColumnDesc, opts: TypeConversionOpts | None = None
) -> dict:
    """PG column → Avro field; arrays become {"type":"array"}
    (avro_types.rs postgres_column_to_avro)."""
    opts = opts or TypeConversionOpts()
    if col.is_array:
        items = _pg_scalar_to_avro(col.element_type or "text", opts)
        return _wrap_field(col.name, {"type": "array", "items": items}, col.nullable)
    return _wrap_field(col.name, _pg_scalar_to_avro(col.data_type, opts), col.nullable)


# ------------------------------------------------------- Spark-schema path B


def spark_type_to_avro(dt: T.DataType, *, name: str = "rec") -> Any:
    """Spark type → Avro type for the already-normalized envelope schema."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DecimalType):
        return "string"  # same decimal-as-string policy as Path A
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-millis"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": spark_type_to_avro(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {"type": "map", "values": spark_type_to_avro(dt.valueType)}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                _wrap_field(
                    f.name, spark_type_to_avro(f.dataType, name=f"{name}_{f.name}"), f.nullable
                )
                for f in dt.fields
            ],
        }
    return "string"


def value_fields_from_struct(schema: T.StructType) -> list[dict]:
    return [
        _wrap_field(f.name, spark_type_to_avro(f.dataType, name=f.name), f.nullable)
        for f in schema.fields
    ]


# ----------------------------------------------------------- envelope shape


def _position_schema(connector: str) -> dict:
    """Per-connector position record (avro_schema.rs:31-80)."""
    if connector == "mysql":
        ns, fields = "deltaforge.cdc.mysql", [
            ("server_id", "int"),
            ("file", "string"),
            ("pos", "long"),
            ("gtid", "string"),
            ("row", "int"),
        ]
    elif connector in ("postgresql", "postgres"):
        ns, fields = "deltaforge.cdc.postgres", [
            ("lsn", "string"),
            ("tx_id", "long"),
            ("xmin", "long"),
        ]
    else:
        ns, fields = "deltaforge.cdc.generic", [("sequence", "string")]
    return {
        "type": "record",
        "name": "Position",
        "namespace": ns,
        "fields": [
            {"name": n, "type": ["null", t], "default": None} for n, t in fields
        ],
    }


def _source_schema(connector: str) -> dict:
    return {
        "type": "record",
        "name": "Source",
        "namespace": "deltaforge.cdc",
        "fields": [
            {"name": "version", "type": "string"},
            {"name": "connector", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "ts_ms", "type": "long"},
            {"name": "db", "type": "string"},
            {"name": "schema", "type": ["null", "string"], "default": None},
            {"name": "table", "type": "string"},
            {"name": "snapshot", "type": ["null", "string"], "default": None},
            {
                "name": "position",
                "type": ["null", _position_schema(connector)],
                "default": None,
            },
        ],
    }


def _transaction_schema() -> dict:
    return {
        "type": "record",
        "name": "Transaction",
        "namespace": "deltaforge.cdc",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "total_order", "type": ["null", "long"], "default": None},
            {"name": "data_collection_order", "type": ["null", "long"], "default": None},
        ],
    }


def build_value_schema(
    connector: str, db: str, table: str, fields: list[dict]
) -> dict:
    """Path C fallback Value record (avro_schema.rs build_value_schema)."""
    return {
        "type": "record",
        "name": "Value",
        "namespace": f"deltaforge.{connector}.{db}.{table}",
        "fields": fields,
    }


def build_envelope_schema(
    connector: str, db: str, table: str, value_schema: dict
) -> dict:
    """The full CDC envelope record. Before/After are inlined as two
    independent records — no Avro Ref nodes (avro_schema.rs:150-220)."""
    before = dict(value_schema, name="BeforeValue")
    after = dict(value_schema, name="AfterValue")
    return {
        "type": "record",
        "name": "Envelope",
        "namespace": f"deltaforge.cdc.{connector}.{db}.{table}",
        "doc": (
            f"CDC envelope for {connector}.{db}.{table}. "
            "Schema source: DDL (authoritative)."
        ),
        "fields": [
            {"name": "before", "type": ["null", before], "default": None},
            {"name": "after", "type": ["null", after], "default": None},
            {"name": "source", "type": _source_schema(connector)},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": "long"},
            {"name": "event_id", "type": ["null", "string"], "default": None},
            {"name": "schema_version", "type": ["null", "string"], "default": None},
            {"name": "transaction", "type": ["null", _transaction_schema()], "default": None},
        ],
    }


def envelope_schema_for_struct(
    connector: str, db: str, table: str, row_schema: T.StructType
) -> dict:
    """Path B end-to-end: Spark after-struct → Value record → envelope."""
    value = build_value_schema(
        connector, db, table, value_fields_from_struct(row_schema)
    )
    return build_envelope_schema(connector, db, table, value)


# --------------------------------------------------- schema registry client


class SchemaRegistryClient:
    """Confluent SR client over an injected transport (avro.rs:100-250):
    ``register(subject, schema_json) -> schema_id`` with a per-subject
    cache so the hot path never re-posts. Transport:
    ``post(subject, schema_str) -> int``."""

    def __init__(self, transport: Callable[[str, str], int]):
        self._post = transport
        self._cache: dict[str, tuple[int, str]] = {}

    def register(self, subject: str, schema: dict | str) -> int:
        if subject in self._cache:
            return self._cache[subject][0]
        schema_str = schema if isinstance(schema, str) else json.dumps(schema)
        schema_id = int(self._post(subject, schema_str))
        self._cache[subject] = (schema_id, schema_str)
        return schema_id

    def cached(self, subject: str) -> tuple[int, str] | None:
        return self._cache.get(subject)


def plan_avro_encoding(
    row_schema: T.StructType,
    client: SchemaRegistryClient,
    *,
    connector: str,
    db: str,
    table: str,
    topic: str,
    strategy: str = "topic_name",
) -> tuple[str, int, dict]:
    """End-to-end assembly (the reference's AvroEncoder startup path:
    avro.rs get_envelope_schema → subject → register): derive the
    envelope schema from the row struct, resolve the subject, register
    (cached), return (subject, schema_id, schema_json). The schema_id
    then feeds ``avro.confluent_frame`` / ``avro.envelope_avro``."""
    from .avro import subject_name

    env = envelope_schema_for_struct(connector, db, table, row_schema)
    record_name = f"{env['namespace']}.Envelope"
    subject = subject_name(strategy, topic=topic, record_name=record_name)
    schema_id = client.register(subject, env)
    return subject, schema_id, env


@dataclass
class InMemoryRegistry:
    """Test double with Confluent semantics: schema ids are global per
    schema *text* (registering identical text under a new subject
    returns the same id); each (subject, text) pair gets a version row."""

    ids: dict[str, int] = field(default_factory=dict)
    subjects: dict[str, list[int]] = field(default_factory=dict)
    next_id: int = 1
    posts: int = 0

    def post(self, subject: str, schema_str: str) -> int:
        self.posts += 1
        if schema_str not in self.ids:
            self.ids[schema_str] = self.next_id
            self.next_id += 1
        sid = self.ids[schema_str]
        versions = self.subjects.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid
