"""Dead-letter queue: per-event failures split out of the batch instead
of blocking it.

Re-expresses the reference's DLQ (reference: crates/runner/src/dlq.rs:23-330
— storage-backed queue, overflow policies, REST peek/ack). In a
DataFrame engine the idiomatic shape is a *split*: a predicate marks
rows that failed a conversion/routing step, the healthy subset flows on,
failures append to a DLQ table with error metadata. Overflow policies
become table-retention policies (the queue is a parquet/Delta table, not
a bounded ring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_dlq(df: DataFrame, error_col) -> tuple[DataFrame, DataFrame]:
    """Split into (ok, failed) on a boolean error column/expression.
    ``error_col`` may be a column name or a Column predicate."""
    pred = F.col(error_col) if isinstance(error_col, str) else error_col
    pred = F.coalesce(pred.cast("boolean"), F.lit(False))
    return df.filter(~pred), df.filter(pred)


def write_dlq(
    failed: DataFrame,
    path: str,
    *,
    pipeline: str,
    stage: str,
    reason_col=None,
) -> None:
    """Append failed events to the DLQ table with provenance metadata
    (reference journal entry shape: deltaforge-core/src/journal.rs:13-46)."""
    reason = (
        (F.col(reason_col) if isinstance(reason_col, str) else reason_col)
        if reason_col is not None
        else F.lit(None).cast("string")
    )
    out = (
        failed.withColumn("dlq_pipeline", F.lit(pipeline))
        .withColumn("dlq_stage", F.lit(stage))
        .withColumn("dlq_reason", reason)
        .withColumn("dlq_ts", F.current_timestamp())
    )
    out.write.mode("append").parquet(path)


def strict_routing_dlq(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The reference's strict-topic rule: events whose resolved routing
    topic is null (missing template field) go to the DLQ
    (common/src/routing.rs strict resolution; docs/src/routing.md)."""
    return split_dlq(df, F.col("routing").isNotNull() & F.col("routing.topic").isNull())
