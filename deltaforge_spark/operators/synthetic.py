"""Synthetic-event provenance marking.

Re-expresses the reference's SyntheticMarkingProcessor wrapper
(reference: crates/processors/src/synthetic.rs:28-65): any event a
processor *created* (its event_id wasn't in the batch on entry) gets
``synthetic = <processor_id>`` so downstream sink filters can
include/exclude fan-out events (sinks/src/filter.rs:16-76).

In a declarative engine, fan-out transforms set provenance at creation
time — cheaper than the reference's entry-snapshot diff, identical
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mark_synthetic(df: DataFrame, processor_id: str, *, where=None) -> DataFrame:
    """Stamp ``synthetic = processor_id`` on rows matching ``where``
    (default: rows not already attributed)."""
    cond = where if where is not None else F.col("synthetic").isNull()
    return df.withColumn(
        "synthetic",
        F.when(cond, F.lit(processor_id)).otherwise(F.col("synthetic")),
    )


def sink_filter(
    df: DataFrame,
    *,
    exclude_synthetic: bool = False,
    synthetic_only: bool = False,
    producers: list[str] | None = None,
) -> DataFrame:
    """Per-sink event filter (reference sinks/src/filter.rs:16-76;
    config sinks_cfg.rs:911-953)."""
    out = df
    if exclude_synthetic:
        out = out.filter(F.col("synthetic").isNull())
    if synthetic_only:
        out = out.filter(F.col("synthetic").isNotNull())
    if producers:
        out = out.filter(F.col("synthetic").isin(producers))
    return out
