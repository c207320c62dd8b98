"""Wire envelopes: Native / Debezium / CloudEvents 1.0.

Re-expresses the reference's envelope layer
(reference: crates/deltaforge-core/src/envelope/{native.rs,debezium.rs,
cloudevents.rs}; README.md:177-190) as pure column expressions producing
a ``value`` JSON string (plus the event columns for sink routing).

- native:     the event payload serialized directly.
- debezium:   ``{"schema": null, "payload": <event>}``.
- cloudevents ``{specversion:"1.0", id, source:"deltaforge/{name}/{db.table}",
  type:"{prefix}.{created|updated|deleted|snapshot|truncated}", time,
  subject, data:{before,after,op}}`` (cloudevents.rs:29-108).

All are ``to_json(struct(...))`` — JVM-side, codegen'd, no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OP_NAME = {
    "c": "created",
    "u": "updated",
    "d": "deleted",
    "r": "snapshot",
    "t": "truncated",
}


def _event_struct(df: DataFrame) -> Column:
    cols = [c for c in ("before", "after", "source", "op", "ts_ms", "event_id",
                        "tenant_id", "schema_version", "schema_sequence",
                        "transaction", "tx_end", "ddl", "synthetic") if c in df.columns]
    return F.struct(*[F.col(c) for c in cols])


# serde emits null-valued fields ("before": null on inserts, NULL row
# columns as null) — Spark's to_json drops them by default, so every
# envelope serializes with ignoreNullFields=false for byte-level parity
# (envelopes.md native/debezium examples show the explicit nulls)
_JSON_OPTS = {"ignoreNullFields": "false"}


def envelope_native(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Debezium-payload-shaped event JSON (envelope/native.rs)."""
    return df.withColumn(out_col, F.to_json(_event_struct(df), _JSON_OPTS))


def envelope_debezium(df: DataFrame, out_col: str = "value") -> DataFrame:
    """``{"schema": null, "payload": ...}`` wrapper (envelope/debezium.rs).

    The ``schema`` key is emitted literally: ``to_json`` drops
    null-valued struct fields, but Debezium consumers key on the
    wrapper's exact shape — so the wrapper is a concat around the
    payload JSON, still one codegen'd projection."""
    payload = F.to_json(_event_struct(df), _JSON_OPTS)
    return df.withColumn(
        out_col, F.concat(F.lit('{"schema":null,"payload":'), payload, F.lit("}"))
    )


def cloudevents_type(prefix: str = "com.deltaforge.cdc") -> Column:
    t = None
    for code, name in _OP_NAME.items():
        c = F.when(F.col("op") == code, F.lit(f"{prefix}.{name}"))
        t = c if t is None else t.when(F.col("op") == code, F.lit(f"{prefix}.{name}"))
    return t.otherwise(F.lit(f"{prefix}.unknown"))


def envelope_cloudevents(
    df: DataFrame,
    *,
    type_prefix: str = "com.deltaforge.cdc",
    out_col: str = "value",
) -> DataFrame:
    """CloudEvents 1.0 restructure (envelope/cloudevents.rs:29-108)."""
    source = F.concat_ws(
        "/",
        F.lit("deltaforge"),
        F.col("source.name"),
        F.concat_ws(".", F.col("source.db"), F.col("source.table")),
    )
    ce = F.struct(
        F.lit("1.0").alias("specversion"),
        F.col("event_id").alias("id"),
        source.alias("source"),
        cloudevents_type(type_prefix).alias("type"),
        F.date_format(
            F.timestamp_millis(F.col("ts_ms")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        ).alias("time"),
        F.lit("application/json").alias("datacontenttype"),
        F.concat_ws(".", F.col("source.db"), F.col("source.table")).alias("subject"),
        F.struct(F.col("before"), F.col("after"), F.col("op")).alias("data"),
    )
    return df.withColumn(out_col, F.to_json(ce, _JSON_OPTS))
