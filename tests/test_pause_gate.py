"""Pause gate semantics (pause.rs) and the hot-pause path through a
live StreamingPipeline: batches block at admission while paused, the
position holds, resume continues exactly where it left off."""

import threading
import time

import pytest

from deltaforge_spark.streaming.pause import PauseGate, PauseResult


def test_fast_path_not_paused():
    g = PauseGate()
    assert g.wait_until_resumed() is True
    assert g.wait_with_timeout(0.01) is PauseResult.RESUMED


def test_resume_wakes_waiter():
    g = PauseGate()
    g.pause()
    out = []
    t = threading.Thread(target=lambda: out.append(g.wait_until_resumed()))
    t.start()
    time.sleep(0.05)
    assert not out  # still blocked
    g.resume()
    t.join(timeout=2)
    assert out == [True]


def test_cancel_wakes_waiter_false():
    g = PauseGate()
    g.pause()
    out = []
    t = threading.Thread(target=lambda: out.append(g.wait_until_resumed()))
    t.start()
    g.cancel()
    t.join(timeout=2)
    assert out == [False]
    # cancelled gates stay cancelled (terminal, like a cancel token)
    assert g.wait_until_resumed() is False


def test_timeout_returns_for_housekeeping_and_continues():
    g = PauseGate()
    g.pause()
    r = g.wait_with_timeout(0.02)
    assert r is PauseResult.TIMEOUT and r.should_continue()
    g.cancel()
    r2 = g.wait_with_timeout(0.02)
    assert r2 is PauseResult.CANCELLED and not r2.should_continue()


@pytest.mark.spark
def test_hot_pause_holds_batches_then_resumes(spark, tmp_path):
    """Paused pipeline admits no new micro-batches; resume delivers the
    backlog without loss or duplication."""
    from pyspark.sql import types as T

    from deltaforge_spark.sinks.foreach import SinkSpec
    from deltaforge_spark.streaming.pipeline import (
        StreamingPipeline,
        file_change_source,
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    schema = T.StructType([T.StructField("x", T.LongType())])
    delivered = []

    def write(df):
        delivered.extend(r.x for r in df.collect())

    gate = PauseGate()
    pipe = StreamingPipeline(
        name="hotpause",
        source=file_change_source(str(src_dir), schema, max_files_per_trigger=1),
        sinks=[SinkSpec(name="mem", write=write)],
        checkpoint_dir=str(tmp_path / "ckpt"),
        offsets_path=str(tmp_path / "offsets.json"),
        gate=gate,
    )
    spark.createDataFrame([(1,)], schema).coalesce(1).write.mode("append").parquet(str(src_dir))
    gate.pause()
    q = pipe.start(spark, processing_time="50 milliseconds")
    try:
        time.sleep(2)
        assert delivered == []  # batch 0 held at the gate
        gate.resume()
        deadline = time.time() + 30
        while sorted(delivered) != [1] and time.time() < deadline:
            time.sleep(0.2)
        assert sorted(delivered) == [1]
        # more data after resume flows normally
        spark.createDataFrame([(2,)], schema).coalesce(1).write.mode("append").parquet(str(src_dir))
        deadline = time.time() + 30
        while sorted(delivered) != [1, 2] and time.time() < deadline:
            time.sleep(0.2)
        assert sorted(delivered) == [1, 2]
    finally:
        q.stop()
