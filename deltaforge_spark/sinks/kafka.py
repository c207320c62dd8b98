"""Kafka sink payload projection.

Re-expresses the reference's Kafka sink (reference:
crates/sinks/src/kafka.rs — topic resolution :379-415, key :418-436,
routing headers :439-453). Spark's Kafka writer natively supports
per-row ``topic``, ``key``, ``value`` and ``headers`` columns, so the
whole resolution cascade is a projection; the write itself is
``df.write.format("kafka")`` (at-least-once — consumers dedup on the
idempotency key per guarantees.md:317-341; a faithful exactly-once
variant would be a transactional foreachPartition producer, documented
as out of scope for this container: no broker available).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import idempotency_key


def kafka_payload(
    df: DataFrame,
    *,
    value_col: str = "value",
    default_topic: str | None = None,
    key_template_col: str | None = None,
) -> DataFrame:
    """Project a change-event DataFrame (with an envelope `value`
    column) to Kafka writer shape: key, value, topic, headers.

    Resolution order matches the reference:
      topic: routing.topic → default_topic  (kafka.rs:379-415)
      key:   routing.key → idempotency key  (kafka.rs:418-436)
      headers: routing.headers as array<struct<key,value:binary>>
    """
    topic = F.coalesce(F.col("routing.topic"), F.lit(default_topic))
    key = F.coalesce(
        F.col("routing.key"),
        F.col(key_template_col) if key_template_col else idempotency_key(),
    )
    headers = F.when(
        F.col("routing.headers").isNotNull(),
        F.transform(
            F.map_entries(F.col("routing.headers")),
            lambda kv: F.struct(
                kv["key"].alias("key"), F.encode(kv["value"], "UTF-8").alias("value")
            ),
        ),
    )
    return df.select(
        key.cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
        topic.alias("topic"),
        headers.alias("headers"),
    )


def write_kafka(
    df: DataFrame,
    *,
    bootstrap: str,
    default_topic: str | None = None,
    client_conf: dict | None = None,
) -> None:
    """The actual write (requires a broker; untested in this container).
    ``client_conf`` entries (performance.md:58-76 tuning, e.g.
    ``linger.ms``) are applied last as ``kafka.*`` writer options — the
    same defaults-then-overrides layering as the EOS producer."""
    payload = kafka_payload(df, default_topic=default_topic)
    writer = (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("kafka.compression.type", "lz4")
        .option("kafka.linger.ms", "5")
    )
    for k, v in (client_conf or {}).items():
        writer = writer.option(f"kafka.{k}", str(v))
    writer.save()
