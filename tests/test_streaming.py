"""Streaming: file-stream source → transforms → fan-out with
checkpoint/replay — the kill-and-restart harness standing in for the
reference's chaos crash_recovery scenario (SURVEY.md §5)."""

import glob

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.operators import FilterSpec, apply_filter
from deltaforge_spark.sinks import OffsetStore, SinkSpec
from deltaforge_spark.sources import snapshot_events
from deltaforge_spark.streaming import StreamingPipeline
from deltaforge_spark.streaming.pipeline import file_change_source


@pytest.fixture()
def event_dir(spark, tmp_path):
    base = spark.createDataFrame([(i, f"n{i}") for i in range(20)], ["id", "name"])
    ev = snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )
    path = str(tmp_path / "in")
    ev.repartition(4).write.parquet(path)
    return path, ev.schema


def test_stream_end_to_end(spark, event_dir, tmp_path):
    path, schema = event_dir
    out_dir = str(tmp_path / "out")
    pipe = StreamingPipeline(
        name="p1",
        source=file_change_source(path, schema, max_files_per_trigger=2),
        transforms=[lambda df: apply_filter(df, FilterSpec(fields=[{"field": "id", "op": "gte", "value": 10}]))],
        sinks=[SinkSpec("files", lambda df: df.write.mode("append").parquet(out_dir))],
        checkpoint_dir=str(tmp_path / "ckpt"),
        offsets_path=str(tmp_path / "offsets.json"),
    )
    q = pipe.start(spark, trigger_available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 10  # ids 10..19
    # multiple micro-batches happened (maxFilesPerTrigger=2 over 4 files)
    assert OffsetStore(str(tmp_path / "offsets.json")).committed("files") >= 1


def test_stream_restart_skips_committed_batches(spark, event_dir, tmp_path):
    """Kill-and-restart: second run from the same checkpoint must not
    duplicate delivered batches (per-sink offset skip)."""
    path, schema = event_dir
    out_dir = str(tmp_path / "out2")
    kwargs = dict(
        name="p2",
        source=file_change_source(path, schema, max_files_per_trigger=2),
        sinks=[SinkSpec("files", lambda df: df.write.mode("append").parquet(out_dir))],
        checkpoint_dir=str(tmp_path / "ckpt2"),
        offsets_path=str(tmp_path / "offsets2.json"),
    )
    q = StreamingPipeline(**kwargs).start(spark, trigger_available_now=True)
    q.awaitTermination(120)
    n_files_first = len(glob.glob(f"{out_dir}/*.parquet"))
    assert spark.read.parquet(out_dir).count() == 20

    # restart from the same checkpoint: no new input -> no new writes
    q2 = StreamingPipeline(**kwargs).start(spark, trigger_available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 20
    assert len(glob.glob(f"{out_dir}/*.parquet")) == n_files_first
