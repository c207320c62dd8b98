"""Avro + Confluent Schema Registry wire-format encoding.

Re-expresses the reference's Avro encoding layer (reference:
crates/deltaforge-core/src/encoding/avro.rs:3-270 — Confluent wire
format = 1 magic byte 0x00 + 4-byte big-endian schema id + Avro binary;
subject strategies topic_name|topic_record|record; schema cache).

Spark mapping: ``to_avro(struct)`` from spark-avro produces the Avro
binary; the Confluent 5-byte header is plain column algebra
(``concat`` of binary literals). The spark-avro jar is not bundled with
the pip distribution and this container has no network, so ``to_avro``
is imported lazily — ``avro_available()`` gates callers, and
``confluent_frame``/subject resolution are testable without the jar.
On a real cluster: ``spark-submit --packages org.apache.spark:spark-avro_2.13:<ver>``.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def avro_available(spark=None) -> bool:
    """True when to_avro is actually usable. The Python module always
    imports; only JVM plan analysis reveals a missing spark-avro jar,
    so probe with a tiny plan when a session is given."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except Exception:
        return False
    if spark is None:
        return True
    try:
        spark.range(1).select(to_avro(F.struct(F.lit(1).alias("x")))).schema
        return True
    except Exception:
        return False


def subject_name(
    strategy: str, *, topic: str | None = None, record_name: str | None = None
) -> str:
    """Confluent subject strategies (reference sinks_cfg.rs:46-247)."""
    if strategy == "topic_name":
        return f"{topic}-value"
    if strategy == "topic_record":
        return f"{topic}-{record_name}"
    if strategy == "record":
        return str(record_name)
    raise ValueError(f"unknown subject strategy {strategy!r}")


def confluent_frame(avro_binary: Column, schema_id: int) -> Column:
    """Prepend the Confluent wire header: 0x00 magic + int32 BE schema id
    (avro.rs wire format). Pure column expression over binary."""
    header = bytes([0]) + struct.pack(">i", schema_id)
    return F.concat(F.lit(header), avro_binary)


def envelope_avro(
    df: DataFrame,
    *,
    schema_id: int,
    out_col: str = "value",
) -> DataFrame:
    """Event struct → Confluent-framed Avro binary column. Requires the
    spark-avro package on the classpath (see module docstring)."""
    from pyspark.sql.avro.functions import to_avro  # gated import

    from ..operators.envelopes import _event_struct

    return df.withColumn(out_col, confluent_frame(to_avro(_event_struct(df)), schema_id))


def avro_kafka_payload(
    df: DataFrame,
    client,
    *,
    default_topic: str,
    strategy: str = "topic_name",
) -> DataFrame:
    """Kafka writer payload with an Avro-binary value instead of JSON:
    resolve topic/key exactly like ``kafka.kafka_payload`` (routing
    cascade, kafka.rs:379-436), derive the Avro record schema from the
    event columns, register it (cached), then encode each row through
    the pure-Python codec (``avro_binary``) in one map-only Arrow stage.

    Returns ``topic, key, value(binary), headers_json`` — drop-in for
    the EOS writer via its ``payload_fn`` hook. Uses the Python codec
    unconditionally: identical bytes to ``to_avro`` for this schema
    subset, no jar dependency.
    """
    from pyspark.sql import types as T

    from ..envelope import idempotency_key
    from .avro_schema import spark_type_to_avro
    from .avro_binary import avro_frame_rows

    event_cols = [
        c
        for c in (
            "before", "after", "source", "op", "ts_ms", "event_id",
            "tenant_id", "schema_version", "schema_sequence",
            "transaction", "tx_end", "ddl", "synthetic",
        )
        if c in df.columns
    ]
    has_routing = "routing" in df.columns
    topic = (
        F.coalesce(F.col("routing.topic"), F.lit(default_topic))
        if has_routing
        else F.lit(default_topic)
    )
    key = (
        F.coalesce(F.col("routing.key"), idempotency_key())
        if has_routing
        else idempotency_key()
    )
    staged = df.select(
        topic.alias("topic"),
        key.cast("string").alias("_key"),
        *event_cols,
    )

    struct_t = T.StructType([df.schema[c] for c in event_cols])
    schema = spark_type_to_avro(struct_t, name="Envelope")
    schema["namespace"] = "deltaforge.cdc"
    record_name = f"{schema['namespace']}.Envelope"
    subject = subject_name(strategy, topic=default_topic, record_name=record_name)
    schema_id = client.register(subject, schema)

    framed = avro_frame_rows(
        staged, schema, schema_id=schema_id, key_col="_key", passthrough=["topic"]
    )
    return framed.select(
        "topic", "key", "value", F.lit(None).cast("string").alias("headers_json")
    )
