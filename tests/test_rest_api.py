"""HTTP control plane (rest.py): the reference's rest-api route table
served over PipelineManager — create/status/patch/lifecycle/DLQ routes,
error mapping (404/400/409), health probes."""

import json
import urllib.error
import urllib.request

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.control import PipelineManager
from deltaforge_spark.rest import ControlPlaneServer


def _req(port, method, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def server(spark, tmp_path):
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    srv = ControlPlaneServer(mgr).start()
    yield srv, mgr, tmp_path
    srv.stop()


def _feed(spark, tmp_path, n=10):
    path = str(tmp_path / "feed")
    spark.createDataFrame(
        [(i, "c", f"n{i}") for i in range(n)], ["event_id", "op", "name"]
    ).coalesce(1).write.mode("append").parquet(path)
    return path


def _spec(feed, out):
    return {
        "metadata": {"name": "p1"},
        "spec": {
            "source": {"type": "stream_parquet", "path": feed},
            "processors": [],
            "sinks": [{"name": "out", "type": "parquet", "path": out}],
        },
    }


def test_health_and_ready(server):
    srv, _, _ = server
    assert _req(srv.port, "GET", "/health") == (200, {"status": "ok"})
    code, body = _req(srv.port, "GET", "/ready")
    assert code == 200 and body["ready"] is True


def test_create_status_list_lifecycle(server, spark):
    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "out")
    code, st = _req(srv.port, "POST", "/pipelines", _spec(feed, out))
    assert code == 201 and st["name"] == "p1"
    mgr.await_drained("p1")
    assert spark.read.parquet(out).count() == 10

    code, lst = _req(srv.port, "GET", "/pipelines")
    assert code == 200 and [p["name"] for p in lst] == ["p1"]
    code, st = _req(srv.port, "GET", "/pipelines/p1")
    assert code == 200 and st["status"] in ("running", "finished")

    assert _req(srv.port, "POST", "/pipelines/p1/pause")[1]["status"] == "paused"
    assert _req(srv.port, "POST", "/pipelines/p1/resume")[1]["status"] == "running"
    assert _req(srv.port, "POST", "/pipelines/p1/stop")[1]["status"] == "stopped"
    assert _req(srv.port, "DELETE", "/pipelines/p1") == (200, {"deleted": "p1"})
    assert _req(srv.port, "GET", "/pipelines/p1")[0] == 404


def test_patch_deep_merges_and_restarts(server, spark):
    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "out")
    _req(srv.port, "POST", "/pipelines", _spec(feed, out))
    mgr.await_drained("p1")
    out2 = str(tmp_path / "out2")
    code, st = _req(
        srv.port, "PATCH", "/pipelines/p1",
        {"spec": {"sinks": [{"name": "out", "type": "parquet", "path": out2}]}},
    )
    assert code == 200
    mgr.await_drained("p1")
    # checkpointed restart: already-delivered batches don't replay into
    # the patched sink; new spec is persisted
    assert json.load(open(f"{tmp_path}/state/p1/spec.json"))["spec"]["sinks"][0]["path"] == out2


def test_error_mapping(server):
    srv, _, _ = server
    assert _req(srv.port, "GET", "/pipelines/nope")[0] == 404
    assert _req(srv.port, "POST", "/pipelines/nope/pause")[0] == 404
    code, body = _req(srv.port, "POST", "/pipelines", {"bogus": True})
    assert code == 400
    assert _req(srv.port, "GET", "/nosuch")[0] == 404


def test_dlq_routes(server, spark):
    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    _req(srv.port, "POST", "/pipelines", _spec(feed, str(tmp_path / "out")))
    mgr.await_drained("p1")
    bad = spark.createDataFrame(
        [(str(i), f"boom-{i}") for i in range(3)], ["event_id", "reason"]
    )
    mgr.dlq("p1").write(bad, sink_id="out", error_kind="serialization", reason_col="reason")

    code, body = _req(srv.port, "GET", "/pipelines/p1/journal/dlq/count")
    assert (code, body) == (200, {"count": 3})
    code, body = _req(srv.port, "GET", "/pipelines/p1/journal/dlq?n=2")
    assert code == 200 and len(body["entries"]) == 2
    seqs = [e["seq"] for e in body["entries"]]
    code, body = _req(srv.port, "POST", "/pipelines/p1/journal/dlq/ack", {"seqs": seqs})
    assert (code, body) == (200, {"acked": 2})
    code, body = _req(srv.port, "DELETE", "/pipelines/p1/journal/dlq")
    assert (code, body) == (200, {"purged": 1})


def test_schema_and_sensing_routes(server, spark):
    from pyspark.sql import types as T

    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    _req(srv.port, "POST", "/pipelines", _spec(feed, str(tmp_path / "out")))
    mgr.await_drained("p1")

    sch = T.StructType([T.StructField("id", T.LongType(), False)])
    mgr.schemas("p1").register("testdb", "users", sch)
    sch2 = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("v", T.StringType())]
    )
    mgr.schemas("p1").register("testdb", "users", sch2)

    code, lst = _req(srv.port, "GET", "/pipelines/p1/schemas")
    assert code == 200 and len(lst) == 1 and lst[0]["version"] == 2
    code, cur = _req(srv.port, "GET", "/pipelines/p1/schemas/testdb/users")
    assert code == 200 and cur["version"] == 2
    code, vers = _req(srv.port, "GET", "/pipelines/p1/schemas/testdb/users/versions")
    assert code == 200 and [v["version"] for v in vers] == [1, 2]
    assert _req(srv.port, "GET", "/pipelines/p1/schemas/testdb/nope")[0] == 404
    assert _req(srv.port, "POST", "/pipelines/p1/schemas/reload")[0] == 501

    mgr.sensed("p1").register("__sensed", "events", sch2)
    code, lst = _req(srv.port, "GET", "/pipelines/p1/sensing/schemas")
    assert code == 200 and lst[0]["table"] == "events"
    code, js = _req(srv.port, "GET", "/pipelines/p1/sensing/schemas/events/json-schema")
    assert code == 200
    assert js["type"] == "object" and js["properties"]["id"] == {"type": "integer"}
    assert js["required"] == ["id"]
    # unknown pipeline 404s on every inspection family
    assert _req(srv.port, "GET", "/pipelines/ghost/schemas")[0] == 404
    assert _req(srv.port, "GET", "/pipelines/ghost/sensing/schemas")[0] == 404


def test_validate_and_log_level_routes(server, spark, tmp_path):
    srv, _, _ = server
    feed = _feed(spark, tmp_path)
    good = _spec(feed, str(tmp_path / "out"))
    code, body = _req(srv.port, "POST", "/validate", good)
    assert (code, body) == (200, {"valid": True})
    bad = {"metadata": {"name": "x"}, "spec": {"source": {"type": "nope"}, "sinks": []}}
    code, body = _req(srv.port, "POST", "/validate", bad)
    assert code == 200 and body["valid"] in (True, False)  # builds lazily or flags
    code, body = _req(
        srv.port, "POST", "/validate",
        {"metadata": {"name": "x"}, "spec": {"source": {}, "processors": [{"type": "bogus"}], "sinks": []}},
    )
    assert code == 200 and body["valid"] is False and "bogus" in body["error"]

    code, body = _req(srv.port, "GET", "/log-level")
    assert code == 200 and isinstance(body["level"], str)
    code, body = _req(srv.port, "PUT", "/log-level", {"level": "ERROR"})
    assert (code, body) == (200, {"level": "ERROR"})


def test_checkpoints_route(server, spark):
    """GET /pipelines/{name}/checkpoints: per-sink committed positions
    (apireference.md Checkpoint Inspection, batch-id positions here)."""
    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    out = str(tmp_path / "out")
    _req(srv.port, "POST", "/pipelines", _spec(feed, out))
    mgr.await_drained("p1")
    code, cps = _req(srv.port, "GET", "/pipelines/p1/checkpoints")
    assert code == 200 and len(cps) == 1
    cp = cps[0]
    assert cp["sink_id"] == "out"
    assert cp["position"]["batch_id"] >= 0
    assert cp["age_seconds"] >= 0
    assert _req(srv.port, "GET", "/pipelines/nope/checkpoints")[0] == 404


def test_drift_routes(server, spark):
    """GET /pipelines/{name}/drift[/{table}] serves reports the drift
    step records (drift_detector.rs accumulation surface)."""
    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    _req(srv.port, "POST", "/pipelines", _spec(feed, str(tmp_path / "out")))
    report = {
        "table": "orders",
        "has_drift": True,
        "columns": [
            {
                "column": "amount",
                "expected_type": "double",
                "observed_types": ["string"],
                "mismatch_count": 2,
            }
        ],
        "events_analyzed": 10,
        "events_with_drift": 2,
    }
    mgr.record_drift("p1", [report])
    code, all_reports = _req(srv.port, "GET", "/pipelines/p1/drift")
    assert code == 200 and all_reports == [report]
    code, one = _req(srv.port, "GET", "/pipelines/p1/drift/orders")
    assert code == 200 and one["has_drift"] is True
    assert _req(srv.port, "GET", "/pipelines/p1/drift/nope")[0] == 404


def test_sensing_stats_route(server, spark):
    srv, mgr, tmp_path = server
    feed = _feed(spark, tmp_path)
    _req(srv.port, "POST", "/pipelines", _spec(feed, str(tmp_path / "out")))
    from pyspark.sql import types as T

    mgr.sensed("p1").register(
        "__sensed", "events", T.StructType([T.StructField("a", T.LongType())])
    )
    code, stats = _req(srv.port, "GET", "/pipelines/p1/sensing/stats")
    assert code == 200
    assert stats["total_structures"] == 1
    assert stats["tables"][0]["table"] == "events"


def test_validate_accepts_reference_vocabulary(server):
    """POST /validate understands the reference's own YAML vocabulary
    (apiVersion deltaforge/v1, tagged source/sink config blocks)."""
    srv, _, _ = server
    ref_spec = {
        "apiVersion": "deltaforge/v1",
        "metadata": {"name": "v", "tenant": "t"},
        "spec": {
            "source": {"type": "mysql", "config": {"id": "m", "tables": ["db.t"]}},
            "processors": [],
            "sinks": [
                {
                    "type": "kafka",
                    "config": {"id": "k", "brokers": "b:9092", "topic": "t"},
                }
            ],
            "commit_policy": {"mode": "required"},
        },
    }
    code, body = _req(srv.port, "POST", "/validate", ref_spec)
    assert code == 200 and body["valid"] is True
    bad = dict(ref_spec)
    bad["spec"] = dict(ref_spec["spec"], processors=[{"type": "mystery"}])
    code, body = _req(srv.port, "POST", "/validate", bad)
    assert code == 200 and body["valid"] is False and "mystery" in body["error"]


def test_schemas_reload_via_catalog_seam(spark, tmp_path):
    """POST .../schemas/reload with a wired JDBC catalog seam: the
    registry re-bootstraps from the recorded INFORMATION_SCHEMA dump
    (pattern expansion from the pipeline's table allow-list), and a
    second reload of an unchanged catalog registers nothing new."""
    from test_catalog_loader import mysql_execute

    mgr = PipelineManager(spark, str(tmp_path / "state2"), catalog_execute=mysql_execute)
    srv = ControlPlaneServer(mgr).start()
    try:
        feed = _feed(spark, tmp_path)
        spec = _spec(feed, str(tmp_path / "out2"))
        spec["spec"]["source"]["config"] = {"tables": ["shop.*"]}
        code, _ = _req(srv.port, "POST", "/pipelines", spec)
        assert code in (200, 201)

        code, out = _req(srv.port, "POST", "/pipelines/p1/schemas/reload")
        assert code == 200
        assert out["reloaded"] == 3
        assert "shop.orders" in out["tables"]
        code, lst = _req(srv.port, "GET", "/pipelines/p1/schemas")
        assert code == 200 and len(lst) == 3

        # unchanged catalog → same versions (fingerprint dedupe)
        _req(srv.port, "POST", "/pipelines/p1/schemas/reload")
        code, vers = _req(srv.port, "GET", "/pipelines/p1/schemas/shop/orders/versions")
        assert code == 200 and [v["version"] for v in vers] == [1]

        # single-table form
        code, out = _req(srv.port, "POST", "/pipelines/p1/schemas/audit/events/reload")
        assert code == 200 and out["tables"] == ["audit.events"]

        # unknown pipeline stays 404
        assert _req(srv.port, "POST", "/pipelines/ghost/schemas/reload")[0] == 404
    finally:
        srv.stop()
