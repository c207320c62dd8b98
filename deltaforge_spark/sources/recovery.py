"""Restart recovery: offset validity + schema reconciliation.

The reference's failover machinery (reference: crates/sources/src/
failover/{identity.rs,reconciler.rs}; mysql/mod.rs:599-763 — detect
server identity change, verify the checkpoint is still reachable
(GTID purged?), diff schemas, then `adapt` or `halt`) reduces, for a
Spark engine fronted by replayable storage, to two restart-time checks
(SURVEY.md §2.1):

1. **Offset validity**: is the MIN-resume offset still available at the
   source (Kafka retention / file compaction / binlog purge)?
   - ``halt``  → raise, operator intervenes (reference default)
   - ``adapt`` → resume from the earliest available offset; downstream
     dedup on idempotency keys absorbs the replay
2. **Schema reconciliation**: diff the live schema against the
   registry's current entry (``schema.drift.detect_drift`` /
   ``SchemaRegistry``) and either accept (adapt) or halt on breaking
   changes.
"""

from __future__ import annotations

from dataclasses import dataclass


class CheckpointUnreachable(RuntimeError):
    pass


@dataclass
class ResumeDecision:
    offset: int
    replayed: bool  # True when we fell back to earliest (adapt)


def check_resume_offset(
    resume_offset: int,
    earliest_available: int,
    *,
    policy: str = "halt",
) -> ResumeDecision:
    """Validate a MIN-resume offset against source retention
    (reference reconciler semantics: checkpoint reachability)."""
    if resume_offset >= earliest_available:
        return ResumeDecision(offset=resume_offset, replayed=False)
    if policy == "adapt":
        return ResumeDecision(offset=earliest_available, replayed=True)
    raise CheckpointUnreachable(
        f"resume offset {resume_offset} purged (earliest available "
        f"{earliest_available}); policy=halt — restore from snapshot or rerun "
        f"initial load (reference: failover reconciler 'halt')"
    )


def reconcile_schema_on_restart(registry, spark_df, db: str, table: str, *, policy: str = "halt"):
    """Diff live payload schema vs registry; register the new version in
    adapt mode, raise on drift in halt mode. Returns the drift report."""
    import pyspark.sql.types as T

    from ..schema.drift import detect_drift

    cur = registry.current(db, table)
    if cur is None:
        return None
    declared = T.StructType.fromJson(__import__("json").loads(cur["schema_json"]))
    report = detect_drift(spark_df, "after", declared)
    issues = report.collect()
    if issues and policy == "halt":
        raise CheckpointUnreachable(f"schema drift on restart for {db}.{table}: {issues}")
    if issues:
        registry.register(db, table, spark_df.schema["after"].dataType)
    return report
