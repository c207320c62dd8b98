"""The change-event envelope.

Mirrors the reference's ``Event`` struct (reference:
crates/deltaforge-core/src/lib.rs:364-456) as a Spark row shape:

    op: string                      -- c/u/d/r/t (Debezium codes)
    ts_ms: long
    before: struct<...> | string    -- typed struct per table, or JSON string
    after:  struct<...> | string
    source: struct<connector, name, db, schema, table, snapshot, sequence>
    event_id: string
    tenant_id: string
    schema_version: string
    schema_sequence: long
    transaction: struct<id, total_order, data_collection_order>
    tx_end: boolean
    synthetic: string               -- processor id for fan-out provenance
    routing: struct<topic, key, headers map<string,string>, raw_payload>

``before``/``after`` are *typed per pipeline* — the envelope is a
structural convention, not a single fixed StructType (the reference keeps
them as dynamic JSON; we prefer typed structs so Catalyst can prune and
push down, falling back to JSON strings only for schema-less payloads).

Ops (reference lib.rs:95-136):
    c=Create  u=Update  d=Delete  r=Read(snapshot)  t=Truncate
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OPS = ("c", "u", "d", "r", "t")

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("snapshot", T.BooleanType()),
        T.StructField("sequence", T.LongType()),
    ]
)

TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("total_order", T.LongType()),
        T.StructField("data_collection_order", T.LongType()),
    ]
)

ROUTING_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("raw_payload", T.BooleanType()),
    ]
)

# Canonical envelope column order (payload struct types vary per table).
ENVELOPE_COLS = [
    "op",
    "ts_ms",
    "before",
    "after",
    "source",
    "event_id",
    "tenant_id",
    "schema_version",
    "schema_sequence",
    "transaction",
    "tx_end",
    "ddl",
    "synthetic",
    "routing",
]


def source_col(
    connector: str,
    pipeline: str,
    db: str,
    table: str,
    schema: str | None = None,
    snapshot: Column | bool = False,
    sequence: Column | None = None,
) -> Column:
    """Debezium-compatible source metadata block (reference lib.rs:177-209)."""
    snap = snapshot if isinstance(snapshot, Column) else F.lit(bool(snapshot))
    seq = sequence if sequence is not None else F.lit(None).cast("long")
    return F.struct(
        F.lit(connector).alias("connector"),
        F.lit(pipeline).alias("name"),
        F.lit(db).alias("db"),
        F.lit(schema).cast("string").alias("schema"),
        F.lit(table).alias("table"),
        snap.cast("boolean").alias("snapshot"),
        seq.cast("long").alias("sequence"),
    )


def null_routing() -> Column:
    return F.lit(None).cast(ROUTING_SCHEMA)


def null_transaction() -> Column:
    return F.lit(None).cast(TRANSACTION_SCHEMA)


def finish_envelope(df: DataFrame) -> DataFrame:
    """Project to the canonical envelope column order, filling optional
    envelope columns with typed nulls when absent."""
    defaults: dict[str, Column] = {
        "tenant_id": F.lit(None).cast("string"),
        "schema_version": F.lit(None).cast("string"),
        "schema_sequence": F.lit(None).cast("long"),
        "transaction": null_transaction(),
        "tx_end": F.lit(None).cast("boolean"),
        "ddl": F.lit(None).cast("string"),
        "synthetic": F.lit(None).cast("string"),
        "routing": null_routing(),
    }
    cols = []
    present = set(df.columns)
    for name in ENVELOPE_COLS:
        if name in present:
            cols.append(F.col(name))
        elif name in defaults:
            cols.append(defaults[name].alias(name))
        else:
            raise ValueError(f"envelope missing required column {name!r}")
    return df.select(*cols)


def idempotency_key(
    tenant: Column | None = None,
    db: Column | None = None,
    table: Column | None = None,
    tx_id: Column | None = None,
    event_id: Column | None = None,
) -> Column:
    """Deterministic consumer-side dedup key
    ``{tenant}|{db}.{table}|{tx_id}|{event_id}``
    (reference lib.rs:583-606; docs/src/guarantees.md:317-331)."""
    tenant = tenant if tenant is not None else F.col("tenant_id")
    db = db if db is not None else F.col("source.db")
    table = table if table is not None else F.col("source.table")
    tx_id = tx_id if tx_id is not None else F.col("transaction.id")
    event_id = event_id if event_id is not None else F.col("event_id")
    blank = F.lit("")
    return F.concat_ws(
        "|",
        F.coalesce(tenant, blank),
        F.concat_ws(".", F.coalesce(db, blank), F.coalesce(table, blank)),
        F.coalesce(tx_id, blank),
        F.coalesce(event_id, blank),
    )
