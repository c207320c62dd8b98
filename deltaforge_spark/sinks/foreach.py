"""foreachBatch fan-out: one frozen batch → N sinks, per-sink outcomes,
commit-policy gate, per-sink offsets.

Re-expresses the reference's coordinator delivery path (reference:
crates/runner/src/coordinator.rs:881-1156 — concurrent fan-out over a
frozen ``Arc<[Event]>``, commit policy all/required/quorum gating the
checkpoint, per-sink checkpoint keys with MIN-resume;
pipeline_manager.rs:31-107).

Spark mapping:
- frozen shared batch   → ``batch_df.persist()`` (cache once, write N times)
- per-sink outcome      → each writer runs in try/except, outcomes collected
- commit policy         → raising from foreachBatch fails the micro-batch,
                          forcing replay from the last checkpoint — the
                          exact at-least-once contract the reference
                          documents (guarantees.md:134-195); sinks dedup
                          downstream on the idempotency key
- per-sink checkpoints  → OffsetStore table (sink, batch_id, status);
                          on restart, resume = MIN(committed) across sinks
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class SinkSpec:
    name: str
    write: Callable[[DataFrame], None]
    required: bool = True
    # per-sink event filter (reference sinks/src/filter.rs)
    filter: Callable[[DataFrame], DataFrame] | None = None
    # resolved transport settings (e.g. the Kafka producer config after
    # defaults + client_conf overrides) — introspectable by tests and
    # the control plane, not consumed by the write path itself
    transport_conf: dict | None = None
    # optional shutdown flush (the reference rolls remaining writers on
    # drop, main.rs lifecycle): one-shot runners (CLI `run`) call it
    # after the last batch; streaming keeps sinks open across batches
    close: Callable[[], None] | None = None
    # batch-id-aware write: sinks whose replay idempotence keys on the
    # REAL micro-batch id (the rolling pool's `batch_id <= last_batch`
    # skip) set this; fan_out_batch prefers it over `write` so Spark's
    # replayed batch N arrives as N, never as a locally re-counted 0
    write_batch: Callable[[DataFrame, int], None] | None = None


@dataclass
class CommitPolicy:
    """all | required (default) | quorum{n} — coordinator.rs:124-135."""

    kind: str = "required"
    quorum: int = 0

    def satisfied(self, outcomes: dict[str, bool], specs: list[SinkSpec]) -> bool:
        if self.kind == "all":
            return all(outcomes.values())
        if self.kind == "quorum":
            return sum(outcomes.values()) >= self.quorum
        # required: every required sink must succeed
        return all(outcomes[s.name] for s in specs if s.required)


class OffsetStore:
    """Per-sink commit bookkeeping (reference per-sink checkpoint keys
    ``{source}::sink::{sink_id}``, pipeline_manager.rs:31-107).

    Default backing: a tiny JSON file per pipeline
    ({sink: last_committed_batch_id}, tmp+rename atomic). Alternatively
    any ``checkpoints.CheckpointStore`` backend (mem/file/sqlite) via
    ``OffsetStore.on_store(store, source_id)`` — offsets then live under
    the reference's ``{source}::sink::{sink}`` key layout, and a
    versioned backend (SQLite) keeps commit history for rollback.
    Restart resume point = MIN across sinks, so an uncommitted sink
    forces replay of its missed batches (sinks dedup on idempotency
    key). On a cluster the store sits on shared storage; the contract —
    atomic per-sink upsert + MIN on read — is the same.
    """

    def __init__(self, path: str | None = None, *, store=None, source_id: str = ""):
        if (path is None) == (store is None):
            raise ValueError("exactly one of path / store required")
        self.path = path
        self.store = store
        self.source_id = source_id

    @classmethod
    def on_store(cls, store, source_id: str) -> "OffsetStore":
        """Back offsets onto a CheckpointStore (reference key layout)."""
        return cls(store=store, source_id=source_id)

    def _key(self, sink: str) -> str:
        from ..checkpoints import sink_checkpoint_key

        return sink_checkpoint_key(self.source_id, sink)

    def _load(self) -> dict[str, int]:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def commit(self, sink: str, batch_id: int) -> None:
        if self.store is not None:
            prev = self.committed(sink)
            cp = {"batch_id": max(prev, int(batch_id))}
            self.store.put(self._key(sink), cp)
            return
        state = self._load()
        state[sink] = max(int(state.get(sink, -1)), int(batch_id))
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def committed(self, sink: str) -> int:
        if self.store is not None:
            cp = self.store.get(self._key(sink))
            return -1 if cp is None else int(cp.get("batch_id", -1))
        return int(self._load().get(sink, -1))

    def resume_point(self, sinks: list[str]) -> int:
        """MIN across sinks: replay everything any sink hasn't seen."""
        if self.store is not None:
            return min((self.committed(s) for s in sinks), default=-1)
        state = self._load()
        return min((int(state.get(s, -1)) for s in sinks), default=-1)


def ordered_for_delivery(
    batch_df: DataFrame, *, key_cols: list[str], order_col: str
) -> DataFrame:
    """Restore the reference's per-PK ordering guarantee
    (guarantees.md:47-51) for keyed sinks.

    After Spark shuffles, row order inside a batch is arbitrary; a keyed
    transport (Kafka partition, Redis stream, per-key webhook) needs
    each key's events in source order. One hash repartition on the key
    set puts every key's rows in a single task, and a partition-local
    sort by (key, source order) makes the ``foreachPartition`` writer
    emit them in order — the same guarantee the reference gets from its
    single-threaded delivery loop, without serializing the whole batch.

    Scale: the shuffle is on the delivery key the transport partitions
    by anyway; the sort is per-partition (spillable), never global.
    """
    from pyspark.sql import functions as F

    return batch_df.repartition(*[F.col(c) for c in key_cols]).sortWithinPartitions(
        *key_cols, order_col
    )


def fan_out_batch(
    batch_df: DataFrame,
    batch_id: int,
    sinks: list[SinkSpec],
    *,
    policy: CommitPolicy | None = None,
    offsets: OffsetStore | None = None,
    already_committed: set[str] | None = None,
    pipeline_name: str | None = None,
) -> dict[str, bool]:
    """Deliver one batch to every sink; commit offsets for successes;
    raise if the commit policy is unmet (fails the micro-batch → replay).

    ``already_committed`` names sinks that committed this batch before a
    crash: they are not re-written on replay but still count as
    successes, so a quorum reached cumulatively across crash/replay
    stays satisfiable (reference evaluates the policy over the full
    sink set, coordinator.rs:1043-1056).
    """
    import time as _time

    from ..metrics import get_registry

    metrics = get_registry()
    pipeline = pipeline_name or ""
    policy = policy or CommitPolicy()
    skip = already_committed or set()
    batch_df.persist()
    try:
        outcomes: dict[str, bool] = {}
        errors: dict[str, Exception] = {}
        for spec in sinks:
            if spec.name in skip:
                outcomes[spec.name] = True
                continue
            df = spec.filter(batch_df) if spec.filter else batch_df
            t0 = _time.perf_counter()
            try:
                if spec.write_batch is not None:
                    spec.write_batch(df, batch_id)
                else:
                    spec.write(df)
                outcomes[spec.name] = True
                metrics.inc(
                    "deltaforge_sink_batch_total", pipeline=pipeline, sink=spec.name
                )
                metrics.observe(
                    "deltaforge_sink_latency_seconds",
                    _time.perf_counter() - t0,
                    pipeline=pipeline,
                    sink=spec.name,
                )
            except Exception as e:  # per-sink isolation: one sink failing
                outcomes[spec.name] = False  # must not poison the others
                errors[spec.name] = e
                metrics.inc(
                    "deltaforge_sink_errors_total", pipeline=pipeline, sink=spec.name
                )
        if offsets is not None:
            for name, ok in outcomes.items():
                if ok and name not in skip:
                    offsets.commit(name, batch_id)
                    metrics.inc("deltaforge_checkpoints_total", pipeline=pipeline, sink=name)
                    metrics.set(
                        "deltaforge_last_checkpoint_ts",
                        _time.time(),
                        pipeline=pipeline,
                        sink=name,
                    )
        if not policy.satisfied(outcomes, sinks):
            failed = [n for n, ok in outcomes.items() if not ok]
            raise RuntimeError(
                f"commit policy {policy.kind} unmet for batch {batch_id}: "
                f"failed sinks {failed}: "
                + "; ".join(f"{n}: {e}" for n, e in errors.items())
            )
        return outcomes
    finally:
        batch_df.unpersist()
