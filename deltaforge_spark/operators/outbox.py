"""Outbox processor: transactional-outbox rows → routed domain events.

Re-expresses the reference's outbox processor
(reference: crates/processors/src/outbox.rs:48-344; config
crates/deltaforge-config/src/outbox_capture.rs). Semantics:

- applies to INSERT (``op='c'``) events from designated outbox tables
  (the reference tags them ``source.schema == "__outbox"``,
  mysql_event.rs:208-239; we match on configurable db/table patterns).
- extracts ``aggregate_type / aggregate_id / event_type / payload``
  from configurable column names of the ``after`` image.
- topic resolution cascade: explicit template → topic column → default
  (outbox.rs resolve_topic); key template default ``${aggregate_id}``.
- promotes headers ``df-event-id``, ``df-aggregate-type``,
  ``df-aggregate-id``, ``df-event-type`` plus custom header columns.
- ``strict`` mode: any row missing a required field fails → here the
  row is flagged (``_outbox_error``) so the caller can DLQ or raise.
- the payload replaces ``after`` (``raw_payload`` passthrough flag kept
  on routing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .routing import compile_template


@dataclass
class OutboxSpec:
    aggregate_type_col: str = "aggregate_type"
    aggregate_id_col: str = "aggregate_id"
    event_type_col: str = "event_type"
    payload_col: str = "payload"
    topic_template: str | None = None  # e.g. "outbox-${aggregate_type}"
    topic_col: str | None = "topic"  # fallback column holding a topic
    default_topic: str | None = None
    key_template: str | None = None  # default: aggregate_id
    header_cols: dict[str, str] = field(default_factory=dict)  # header name -> column
    raw_payload: bool = True
    strict: bool = False


def outbox_transform(df: DataFrame, spec: OutboxSpec | None = None) -> DataFrame:
    """Outbox rows only (caller pre-filters table gate); returns events
    with payload promoted to ``after`` (as JSON string), routing set,
    and ``_outbox_error`` flag for strict-mode violations."""
    spec = spec or OutboxSpec()
    a = lambda c: F.col(f"after.{c}")  # noqa: E731

    agg_type = a(spec.aggregate_type_col).cast("string")
    agg_id = a(spec.aggregate_id_col).cast("string")
    ev_type = a(spec.event_type_col).cast("string")
    payload = a(spec.payload_col).cast("string")

    # topic cascade: template -> topic column -> default (outbox.rs:resolve_topic)
    candidates: list[Column] = []
    if spec.topic_template:
        candidates.append(compile_template(spec.topic_template, strict=True))
    if spec.topic_col:
        candidates.append(a(spec.topic_col).cast("string"))
    if spec.default_topic:
        candidates.append(F.lit(spec.default_topic))
    topic = F.coalesce(*candidates) if candidates else F.lit(None).cast("string")

    key = (
        compile_template(spec.key_template, strict=False)
        if spec.key_template
        else F.coalesce(agg_id, F.lit(""))
    )

    header_entries: list[Column] = [
        F.lit("df-event-id"),
        F.coalesce(F.col("event_id"), F.lit("")),
        F.lit("df-aggregate-type"),
        F.coalesce(agg_type, F.lit("")),
        F.lit("df-aggregate-id"),
        F.coalesce(agg_id, F.lit("")),
        F.lit("df-event-type"),
        F.coalesce(ev_type, F.lit("")),
    ]
    for hname, hcol in spec.header_cols.items():
        header_entries.extend([F.lit(hname), F.coalesce(a(hcol).cast("string"), F.lit(""))])

    missing = agg_id.isNull() | ev_type.isNull() | payload.isNull() | topic.isNull()

    out = df.filter(F.col("op") == "c").select(
        F.col("op"),
        F.col("ts_ms"),
        F.lit(None).cast("string").alias("before"),
        payload.alias("after"),
        F.col("source"),
        F.col("event_id"),
        F.col("tenant_id"),
        F.col("schema_version"),
        F.col("schema_sequence"),
        F.col("transaction"),
        F.col("tx_end"),
        F.col("ddl"),
        F.col("synthetic"),
        F.struct(
            topic.alias("topic"),
            key.alias("key"),
            F.create_map(*header_entries).alias("headers"),
            F.lit(spec.raw_payload).alias("raw_payload"),
        ).alias("routing"),
        agg_type.alias("aggregate_type"),
        agg_id.alias("aggregate_id"),
        ev_type.alias("outbox_event_type"),
        (missing if spec.strict else F.lit(False)).alias("_outbox_error"),
    )
    return out
