"""Pipeline control plane: create/status/pause/resume/patch/stop/delete
lifecycle + checkpointed resume — mirrors rest-api/pipelines.rs route
semantics over pipeline_manager.rs controller methods."""

import os

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.control import PipelineManager, deep_merge


def _feed_dir(spark, tmp_path, ids, subdir="feed"):
    path = str(tmp_path / subdir)
    df = spark.createDataFrame(
        [(i, "c", f"n{i}") for i in ids], ["event_id", "op", "name"]
    )
    df.coalesce(1).write.mode("append").parquet(path)
    return path


def _spec(feed_path, out_path, **extra):
    spec = {
        "metadata": {"name": "p1"},
        "spec": {
            "source": {"type": "stream_parquet", "path": feed_path},
            "processors": [],
            "sinks": [{"name": "out", "type": "parquet", "path": out_path}],
        },
    }
    return deep_merge(spec, extra)


def test_deep_merge_patch_semantics():
    base = {"a": {"b": 1, "c": 2}, "list": [1, 2], "x": 1}
    out = deep_merge(base, {"a": {"c": 3}, "list": [9], "x": None})
    assert out == {"a": {"b": 1, "c": 3}, "list": [9]}
    assert base["a"]["c"] == 2  # original untouched


def test_create_runs_and_reports_status(spark, tmp_path):
    feed = _feed_dir(spark, tmp_path, range(10))
    out = str(tmp_path / "out")
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    st = mgr.create(_spec(feed, out))
    assert st["name"] == "p1"
    mgr.await_drained("p1")
    assert spark.read.parquet(out).count() == 10
    assert mgr.status("p1")["status"] in ("running", "finished")
    assert [s["name"] for s in mgr.list()] == ["p1"]


def test_pause_resume_resumes_from_checkpoint(spark, tmp_path):
    feed = _feed_dir(spark, tmp_path, range(5))
    out = str(tmp_path / "out")
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    mgr.create(_spec(feed, out))
    mgr.await_drained("p1")
    assert spark.read.parquet(out).count() == 5

    st = mgr.pause("p1")
    assert st["status"] == "paused" and not st["active"]

    # new data lands while paused; resume processes ONLY the new file
    _feed_dir(spark, tmp_path, range(100, 103))
    mgr.resume("p1")
    mgr.await_drained("p1")
    got = spark.read.parquet(out)
    assert got.count() == 8  # 5 + 3, no reprocessing of the old backlog
    assert got.filter(F.col("event_id") >= 100).count() == 3


def test_patch_merges_spec_and_restarts(spark, tmp_path):
    feed = _feed_dir(spark, tmp_path, range(10))
    out = str(tmp_path / "out")
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    mgr.create(_spec(feed, out))
    mgr.await_drained("p1")

    # new events land, then PATCH adds an op-gate filter; the restart
    # must run them through the merged processor chain
    d_feed = spark.createDataFrame(
        [(200, "d", "gone"), (201, "c", "kept")], ["event_id", "op", "name"]
    )
    d_feed.coalesce(1).write.mode("append").parquet(feed)
    mgr.patch(
        "p1",
        {"spec": {"processors": [{"type": "filter", "ops": ["c"]}]}},
    )
    handle_spec = mgr._handles["p1"].spec["spec"]
    assert handle_spec["processors"] == [{"type": "filter", "ops": ["c"]}]
    # spec persisted for manager-restart recovery
    import json

    with open(os.path.join(str(tmp_path / "state"), "p1", "spec.json")) as f:
        assert json.load(f)["spec"]["processors"] == handle_spec["processors"]
    mgr.await_drained("p1")
    got = spark.read.parquet(out).filter(F.col("event_id") >= 200)
    assert [r["event_id"] for r in got.collect()] == [201]  # 'd' filtered


def test_stop_and_delete(spark, tmp_path):
    feed = _feed_dir(spark, tmp_path, range(3))
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    mgr.create(_spec(feed, str(tmp_path / "out")))
    mgr.await_drained("p1")
    assert mgr.stop("p1")["status"] == "stopped"
    mgr.delete("p1")
    with pytest.raises(KeyError):
        mgr.status("p1")


def test_create_duplicate_running_rejected(spark, tmp_path):
    feed = _feed_dir(spark, tmp_path, range(3))
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    mgr.create(_spec(feed, str(tmp_path / "out")))
    with pytest.raises(ValueError, match="already running"):
        mgr.create(_spec(feed, str(tmp_path / "out2")))
    mgr.stop("p1")


def test_dlq_inspection_endpoint(spark, tmp_path):
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    feed = _feed_dir(spark, tmp_path, range(2))
    mgr.create(_spec(feed, str(tmp_path / "out")), start=False)
    dlq = mgr.dlq("p1")
    failed = spark.createDataFrame([(1, "boom")], ["event_id", "err"])
    dlq.write(failed, sink_id="out", error_kind="routing", reason_col="err")
    assert dlq.peek(5).collect()[0]["pipeline"] == "p1"
    assert dlq.ack([0]) == 1
    assert dlq.queue_len() == 0


def test_declarative_kafka_eos_sink_end_to_end(spark, tmp_path):
    """Spec-driven exactly-once delivery: a stream_parquet pipeline with
    a kafka_eos sink (file transport) delivers every event inside
    committed transactions — the YAML-to-EOS integration path."""
    from deltaforge_spark.sinks.kafka_eos import FileTransactionalBroker
    from deltaforge_spark.sources import snapshot_events

    base = spark.createDataFrame([(i, f"n{i}") for i in range(12)], ["id", "name"])
    ev = snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )
    feed = str(tmp_path / "feed")
    ev.coalesce(1).write.parquet(feed)
    broker_dir = str(tmp_path / "broker")
    spec = {
        "metadata": {"name": "eos-pipe"},
        "spec": {
            "source": {"type": "stream_parquet", "path": feed},
            "processors": [
                {"type": "route", "topic": "t-fixed", "key": "${event_id}"},
                {"type": "envelope", "kind": "native"},
            ],
            "sinks": [
                {"name": "k", "type": "kafka_eos", "spool_dir": broker_dir, "topic": "t-fixed"}
            ],
        },
    }
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    mgr.create(spec)
    mgr.await_drained("eos-pipe")
    broker = FileTransactionalBroker(broker_dir)
    msgs = broker.read_committed()
    assert len(msgs) == 12
    assert {m["topic"] for m in msgs} == {"t-fixed"}
    assert all(m["txn_id"].startswith("deltaforge-eos-pipe-k-p") for m in msgs)
