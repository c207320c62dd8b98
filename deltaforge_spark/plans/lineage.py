"""Lineage-barrier helpers shared by the iterative/peeling operators.

Spark has no public "release this checkpoint" API: the blocks (or
checkpoint files) behind a pinned frame live until the ContextCleaner
notices the RDD is unreachable, which on a long-lived session means
every peeling round / archive-replay slice accumulates storage. The
helpers here make the pattern explicit and auditable:

- :func:`pin` — truncate lineage, reliably when a checkpoint dir is
  configured (survives executor loss), locally otherwise.
- :func:`release_pinned` — free the storage behind a pinned frame the
  moment it is superseded: executor blocks for ``localCheckpoint``,
  checkpoint files (via the Hadoop FS API, so HDFS/S3 dirs work too)
  for reliable checkpoints.

``session.ensure_checkpoint_dir`` wires a default checkpoint dir into
every locally-built session (VERDICT r10 #3), so the reliable branch
is the PRODUCTION default; ``pin(df, reliable=False)`` is the explicit
opt-out for loops whose rounds are cheap to recompute and whose caller
prefers executor-memory pinning.

Used by operators/graph.py (PageRank / k-core peeling rounds),
operators/dedup.py (connected-components rounds), operators/
textanalysis.py (BPE merge rounds) and sources/pgoutput.py
(``_ranked_by_seq`` rank pinning on the archive path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "pin",
    "release_pinned",
    "release_local_checkpoint",
    "retain",
    "release_retained",
]


def pin(df: DataFrame, *, eager: bool = True, reliable: bool | None = None) -> DataFrame:
    """Materialize ``df`` behind a lineage barrier.

    ``reliable=None`` (default) resolves from the session: with
    ``setCheckpointDir`` configured (which ``session.py`` defaults for
    local masters), uses RELIABLE checkpointing — blocks land in the
    checkpoint dir, so a lost executor recomputes nothing and long
    archive-replay jobs survive node loss. Without one — or with
    ``reliable=False`` — falls back to ``localCheckpoint``: faster,
    but the pinned partitions live only in executor storage, and
    losing an executor fails the job instead of recomputing.

    The reliable branch persists the frame around the checkpoint:
    ``Dataset.checkpoint(eager=True)`` otherwise computes the plan
    TWICE (once for the materializing action, once more when the
    checkpoint-write job re-runs the RDD) — the transient cache makes
    the write job a cache read, and is dropped before returning.
    """
    sc = df.sparkSession.sparkContext
    if reliable is None:
        reliable = sc.getCheckpointDir() is not None
    if not reliable:
        return df.localCheckpoint(eager=eager)
    if sc.getCheckpointDir() is None:
        raise ValueError("pin(reliable=True) needs spark.sparkContext.setCheckpointDir")
    if not eager:
        return df.checkpoint(eager=False)
    # unpersist() is keyed by logical plan, not by who persisted: if
    # the CALLER already cached this frame, a transient persist here
    # followed by unpersist(True) would silently evict the caller's
    # cache entry (ADVICE r11). Skip the transient cache then — the
    # checkpoint-write job reads the caller's cache instead.
    already_cached = df.storageLevel.useMemory or df.storageLevel.useDisk
    if already_cached:
        return df.checkpoint(eager=True)
    cached = df.persist()
    try:
        return df.checkpoint(eager=True)
    finally:
        # blocking: callers (and the storage-bound tests) must observe
        # the transient cache as gone the moment pin() returns
        cached.unpersist(True)


def release_pinned(df: DataFrame) -> None:
    """Free the storage behind a ``pin``'ed frame.

    localCheckpoint: the checkpointed plan is a LogicalRDD scan over a
    cached RDD; unpersisting that RDD releases its blocks immediately
    instead of waiting for the ContextCleaner — the difference between
    a loop whose superseded rounds accumulate executor storage for the
    session lifetime and one whose footprint is a single round.

    Reliable checkpoint: deletes the RDD's checkpoint files through
    the Hadoop FS API (so local dirs, HDFS and S3 all work). Only
    call once the frame is genuinely superseded — the files are its
    ONLY materialization.

    Persisted (cached) frame: ``DataFrame.unpersist`` drops its blocks
    — so operators that retain a *cache* instead of a checkpoint (the
    classifier's feature frame keeps its hash partitioning that way)
    release through the same hook.

    Best-effort: a plan that isn't a checkpoint scan or a cached frame
    is a silent no-op."""
    try:
        if df.storageLevel.useMemory or df.storageLevel.useDisk:
            df.unpersist(False)
    except Exception:  # pragma: no cover
        pass
    try:
        jrdd = df._jdf.queryExecution().logical().rdd()
    except Exception:  # pragma: no cover - non-checkpoint plans
        return
    try:
        jrdd.unpersist(False)
    except Exception:  # pragma: no cover
        pass
    try:
        opt = jrdd.getCheckpointFile()
        if opt is not None and opt.isDefined():
            sc = df.sparkSession.sparkContext
            jvm = sc._jvm
            path = jvm.org.apache.hadoop.fs.Path(opt.get())
            fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
            fs.delete(path, True)
    except Exception:  # pragma: no cover - fs races are non-fatal
        pass


# compatibility alias: callers predating the reliable-release extension
release_local_checkpoint = release_pinned


#: attribute carrying the pins a returned frame still depends on
_RETAINED_ATTR = "_deltaforge_retained_pins"


def retain(df: DataFrame, *pins: DataFrame) -> DataFrame:
    """Record that ``df`` depends on ``pins`` whose storage the
    producing operator could NOT release before returning (ADVICE r12:
    ``bpe_apply_merges``'s last inter-chunk pin backs the final unpinned
    chunk, and ``perplexity_bins``'s eagerly-pinned result IS its only
    materialization — releasing either inside the operator would break
    the frame it returns). The retained-pin convention:

    - an operator that must leave pinned storage alive behind its
      result tags the result with ``retain(out, *pins)`` (a pin may be
      ``out`` itself);
    - the CALLER releases with :func:`release_retained` once the frame
      is fully consumed (collected, written, or persisted elsewhere) —
      after release the frame is no longer computable;
    - a caller that never releases leaks exactly one checkpoint per
      invocation until process exit (the pre-r13 behavior), so
      long-lived sessions invoking these operators repeatedly should
      release superseded results.
    """
    lst = list(getattr(df, _RETAINED_ATTR, ()))
    lst.extend(pins)
    setattr(df, _RETAINED_ATTR, lst)
    return df


def retained_pins(df: DataFrame) -> list[DataFrame]:
    """The pins still backing ``df`` (empty for ordinary frames)."""
    return list(getattr(df, _RETAINED_ATTR, ()))


def release_retained(df: DataFrame) -> None:
    """Free every pin recorded by :func:`retain` on ``df``. Call only
    once the frame is fully consumed: the pins are its backing
    storage, so the frame cannot be recomputed afterwards."""
    for p in getattr(df, _RETAINED_ATTR, ()):
        release_pinned(p)
    setattr(df, _RETAINED_ATTR, [])
