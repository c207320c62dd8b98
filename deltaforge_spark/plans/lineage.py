"""Lineage-barrier helpers shared by the iterative/peeling operators.

Spark has no public "release this localCheckpoint" API: the blocks
behind a checkpointed frame live until the ContextCleaner notices the
RDD is unreachable, which on a long-lived session means every peeling
round / archive-replay slice accumulates executor storage. The helpers
here make the pattern explicit and auditable:

- :func:`pin` — truncate lineage, reliably when a checkpoint dir is
  configured (survives executor loss), locally otherwise.
- :func:`release_local_checkpoint` — free the storage blocks behind a
  ``localCheckpoint``'ed frame the moment it is superseded.

Used by operators/graph.py (PageRank / k-core peeling rounds),
operators/dedup.py (connected-components rounds) and
sources/pgoutput.py (``_ranked_by_seq`` rank pinning on the archive
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin", "release_local_checkpoint"]


def pin(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` behind a lineage barrier.

    With ``spark.sparkContext.setCheckpointDir(...)`` configured, uses
    RELIABLE checkpointing: blocks land in the checkpoint dir, so a
    lost executor recomputes nothing and long archive-replay jobs
    survive node loss. Without one, falls back to
    ``localCheckpoint`` — faster, but the pinned partitions live only
    in executor storage: losing an executor makes them unrecoverable
    and fails the job instead of recomputing (the documented trade-off
    ADVICE r9 flagged for ``_ranked_by_seq``)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind a ``localCheckpoint``'ed frame.

    The checkpointed plan is a LogicalRDD scan over a cached RDD;
    unpersisting that RDD releases its blocks immediately instead of
    waiting for the ContextCleaner to notice the reference is gone —
    the difference between a loop whose superseded rounds accumulate
    executor storage for the session lifetime and one whose footprint
    is a single round. Best-effort: a plan that isn't a checkpoint
    scan (including a reliable ``checkpoint``, whose blocks live on
    disk in the checkpoint dir) is a silent no-op."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:  # pragma: no cover - non-checkpoint plans
        pass
