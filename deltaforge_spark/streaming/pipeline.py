"""Structured Streaming orchestration.

The reference's runtime loop (reference: crates/runner/src/
coordinator.rs:558-717 — accumulate → process → fan out → commit) maps
onto Structured Streaming directly:

- batch accumulation (max_events/max_bytes/max_ms, config
  lib.rs:287-297)        → trigger interval + maxOffsetsPerTrigger /
                            maxFilesPerTrigger
- bounded-channel backpressure (guarantees.md:300-313)
                         → micro-batch pull model (native)
- processor chain        → DataFrame transforms (same functions as batch)
- concurrent sink fan-out + commit policy + per-sink offsets
                         → ``foreachBatch(fan_out_batch)``
- checkpoint/resume      → checkpointLocation (+ OffsetStore MIN-resume)
- duplicate suppression  → dropDuplicatesWithinWatermark(event_id)
- pause/resume/stop REST → StreamingQuery.stop() / restart from checkpoint

Event-time operators the reference explicitly lacks (guarantees.md:380)
are exposed natively: ``withWatermark`` + windowed aggs, and
``session_window`` for sessionization.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.foreach import CommitPolicy, OffsetStore, SinkSpec, fan_out_batch


def dedup_events(df: DataFrame, *, watermark_col: str = "event_time", delay: str = "10 minutes") -> DataFrame:
    """At-least-once → effectively-once within the watermark horizon:
    drop duplicate event_ids (replays land inside the delay window).
    State is bounded by the watermark — safe at 100 TB/day volumes,
    unlike an unbounded dropDuplicates."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(["event_id"])


@dataclass
class StreamingPipeline:
    """pipeline = source → transforms → N sinks (reference PipelineSpec,
    deltaforge-config/src/lib.rs:93-140)."""

    name: str
    source: Callable[[SparkSession], DataFrame]
    transforms: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    sinks: list[SinkSpec] = field(default_factory=list)
    policy: CommitPolicy = field(default_factory=CommitPolicy)
    checkpoint_dir: str = ""
    offsets_path: str = ""
    # hot pause: batches block at admission while paused (streaming/pause.py);
    # None = no gate. Cancel fails the in-flight batch -> checkpoint replay.
    gate: object | None = None

    def build(self, spark: SparkSession) -> DataFrame:
        df = self.source(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def start(self, spark: SparkSession, *, trigger_available_now: bool = False, processing_time: str | None = None):
        df = self.build(spark)
        offsets = OffsetStore(self.offsets_path) if self.offsets_path else None

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            # pause gate: finish nothing new while paused (the reference
            # pauses between events, pause.rs; Spark's unit is the batch).
            # Cancellation raises so the uncommitted batch replays after
            # restart instead of being silently marked done.
            if self.gate is not None and not self.gate.wait_until_resumed():
                raise RuntimeError(f"pipeline {self.name} cancelled while paused")
            # per-sink offset skip: a sink that already committed this
            # batch (pre-crash) is not re-written on replay, but still
            # counts toward the commit policy (quorum reached across a
            # crash/replay boundary must stay satisfiable)
            committed = {
                s.name
                for s in self.sinks
                if offsets is not None and offsets.committed(s.name) >= batch_id
            }
            if len(committed) == len(self.sinks):
                return
            fan_out_batch(
                batch_df,
                batch_id,
                self.sinks,
                policy=self.policy,
                offsets=offsets,
                already_committed=committed,
                pipeline_name=self.name,
            )

        writer = df.writeStream.foreachBatch(handle).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


def file_change_source(path: str, schema, *, max_files_per_trigger: int = 10):
    """A file-backed change-event stream (the test/CI stand-in for the
    Kafka/Debezium front; reference boundary per SURVEY.md §7.2)."""

    def make(spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(path)
        )

    return make


def run_stream_to_memory(
    stream_df: DataFrame,
    *,
    name: str,
    output_mode: str = "complete",
    timeout: int = 120,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a bounded streaming frame into a memory sink with an
    availableNow trigger and return the result as a batch DataFrame.

    The bounded-drain verification harness for streaming twins: the
    stream processes its whole backlog (one or more triggers depending
    on maxFilesPerTrigger), the memory sink holds the final state, and
    the caller compares it to the batch/oracle result. ``complete``
    output mode keeps full aggregation state — correct for a bounded
    drain, NOT the unbounded-production mode (that's watermark+append/
    update, exercised in test_streaming_semantics).

    ``state_partitions`` (r13 optimization, guide §2.2/§1.2): stateful
    operators pin their partition count from ``shuffle.partitions`` at
    FIRST-batch planning, and every state partition carries fixed
    per-micro-batch overhead — one store instance per operator (a
    stream-stream join holds FOUR) with open + commit + delta-file
    write each batch, and AQE cannot coalesce stateful exchanges. A
    drain whose total state is thousands of rows pays that overhead 32x
    for nothing (measured: the stream-stream join drain is ~linear in
    the partition count, 25s @ 32 -> 8s @ 8 -> 2.7s @ 2, identical
    output). Callers therefore size this to the STATE VOLUME (target
    ~5-50k state rows per partition), not the session's batch-shuffle
    width; production at 100 TB computes the same quotient and lands
    ABOVE the session default, in which case this raises it. Values
    are per-key-group decisions, so results are partitioning-invariant.
    ``DELTAFORGE_STREAM_STATE_PARTITIONS`` overrides globally (cluster
    knob); None inherits the session conf unchanged. The session conf
    is restored after the drain — the setting is scoped to the one
    streaming query, whose checkpoint pins it for its whole life.
    """
    import tempfile

    spark = stream_df.sparkSession
    env_parts = os.environ.get("DELTAFORGE_STREAM_STATE_PARTITIONS")
    if env_parts:
        state_partitions = int(env_parts)
    # checkpoint on tmpfs when available (r13 optimization): the state
    # store writes one delta + commit file per partition per micro-batch
    # — on the container's shared disk those tiny writes land in the
    # noisy-tenant stall path the session already routes shuffle/scratch
    # around (session.py _scratch_dir rationale); a real cluster uses
    # shared storage via checkpointLocation as before
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    checkpoint = tempfile.mkdtemp(prefix=f"dfspark-{name}-ckpt-", dir=base)
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
        if q.isActive:
            q.stop()
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        # never hand back a partial drain as if it were the answer
        raise TimeoutError(
            f"stream {name!r} did not drain within {timeout}s"
        )
    # the memory sink holds the drained result; the finished query's
    # checkpoint is dead state (and RAM when tmpfs-backed) — drop it
    import shutil

    shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name)
