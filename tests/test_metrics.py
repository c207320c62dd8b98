"""Metrics registry + instrumentation points (reference metrics:: macro
surface — sink delivery, DLQ, lifecycle — exposed via GET /metrics)."""

import urllib.request

import pyspark.sql.functions as F

from deltaforge_spark.metrics import MetricsRegistry, get_registry
from deltaforge_spark.sinks.dlq import DlqStore
from deltaforge_spark.sinks.foreach import CommitPolicy, SinkSpec, fan_out_batch


def test_registry_counter_gauge_histogram():
    m = MetricsRegistry()
    m.inc("c_total", pipeline="p")
    m.inc("c_total", 2, pipeline="p")
    m.set("g", 0.5, pipeline="p")
    m.observe("lat_seconds", 0.2, sink="s")
    m.observe("lat_seconds", 0.4, sink="s")
    assert m.value("c_total", pipeline="p") == 3
    assert m.value("g", pipeline="p") == 0.5
    h = m.hist("lat_seconds", sink="s")
    assert h["count"] == 2 and abs(h["sum"] - 0.6) < 1e-9
    text = m.render_prometheus()
    assert 'c_total{pipeline="p"} 3' in text
    assert "# TYPE lat_seconds summary" in text
    assert 'lat_seconds_count{sink="s"} 2' in text


def test_fan_out_batch_instruments_sinks(spark):
    reg = get_registry()
    reg.reset()
    df = spark.range(5)
    seen = []

    def ok_sink(d):
        seen.append(d.count())

    def bad_sink(d):
        raise RuntimeError("down")

    outcomes = fan_out_batch(
        df,
        0,
        [SinkSpec("good", ok_sink), SinkSpec("bad", bad_sink, required=False)],
        policy=CommitPolicy(kind="required"),
        pipeline_name="p1",
    )
    assert outcomes == {"good": True, "bad": False}
    assert reg.value("deltaforge_sink_batch_total", pipeline="p1", sink="good") == 1
    assert reg.value("deltaforge_sink_errors_total", pipeline="p1", sink="bad") == 1
    assert reg.hist("deltaforge_sink_latency_seconds", pipeline="p1", sink="good")["count"] == 1


def test_dlq_metrics(spark, tmp_path):
    reg = get_registry()
    reg.reset()
    store = DlqStore(spark, str(tmp_path / "dlq"), pipeline="p2", max_entries=3)
    df = spark.createDataFrame([(str(i), "r") for i in range(5)], ["event_id", "reason"])
    store.write(df, sink_id="s", error_kind="serialization", reason_col="reason")
    assert reg.value("deltaforge_dlq_events_total", pipeline="p2") == 5
    assert reg.value("deltaforge_dlq_evicted_total", pipeline="p2") == 2
    assert reg.value("deltaforge_dlq_entries", pipeline="p2") == 3
    assert reg.value("deltaforge_dlq_saturation_ratio", pipeline="p2") == 1.0


def test_metrics_route(spark, tmp_path):
    from deltaforge_spark.control import PipelineManager
    from deltaforge_spark.rest import ControlPlaneServer

    get_registry().reset()
    get_registry().inc("deltaforge_sink_batch_total", pipeline="px", sink="s")
    srv = ControlPlaneServer(PipelineManager(spark, str(tmp_path / "st"))).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=10
        ) as r:
            text = r.read().decode()
            assert r.headers["Content-Type"].startswith("text/plain")
    finally:
        srv.stop()
    assert 'deltaforge_sink_batch_total{pipeline="px",sink="s"} 1' in text
