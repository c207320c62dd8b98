"""Client sinks (partition-local, injectable transport) + restart
recovery (offset validity, schema reconciliation)."""

import json

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest
from pyspark.sql import Row

from deltaforge_spark.operators import envelope_native, with_routing
from deltaforge_spark.sinks.clients import (
    read_spool,
    spool_sink_factory,
    write_client_sink,
)
from deltaforge_spark.sources import snapshot_events
from deltaforge_spark.sources.recovery import (
    CheckpointUnreachable,
    check_resume_offset,
    reconcile_schema_on_restart,
)
from deltaforge_spark.schema import SchemaRegistry


def _events(spark):
    base = spark.createDataFrame([(i, f"n{i}") for i in range(10)], ["id", "name"])
    ev = snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )
    return with_routing(
        envelope_native(ev), topic_template="s-${after.id}", key_template="${after.id}"
    )


def test_client_sink_routing_and_fields(spark, tmp_path):
    spool = str(tmp_path / "spool")
    write_client_sink(
        _events(spark), spool_sink_factory(spool), default_dest="fallback", batch_size=3
    )
    got = read_spool(spool)
    assert len(got) == 10
    by_key = {g["df-key"]: g for g in got}
    assert by_key["7"]["dest"] == "s-7"
    assert by_key["7"]["idempotency_key"].endswith("|7")  # {tenant}|{db.table}|{tx}|{event}
    assert "testdb.t1" in by_key["7"]["idempotency_key"]
    payload = json.loads(by_key["7"]["payload"])
    assert payload["after"]["id"] == 7 and payload["op"] == "r"


def test_client_sink_default_dest(spark, tmp_path):
    ev = envelope_native(
        snapshot_events(
            spark.createDataFrame([(1, "a")], ["id", "name"]),
            table="t1",
            event_id=F.col("id").cast("string"),
        )
    )  # no routing set -> default destination
    spool = str(tmp_path / "spool2")
    write_client_sink(ev, spool_sink_factory(spool), default_dest="the-default")
    got = read_spool(spool)
    assert got and all(g["dest"] == "the-default" for g in got)


def test_offset_validity_policies():
    ok = check_resume_offset(100, 50)
    assert (ok.offset, ok.replayed) == (100, False)
    with pytest.raises(CheckpointUnreachable, match="purged"):
        check_resume_offset(10, 50, policy="halt")
    adapted = check_resume_offset(10, 50, policy="adapt")
    assert (adapted.offset, adapted.replayed) == (50, True)


def test_schema_reconcile_on_restart(spark, tmp_path):
    reg = SchemaRegistry(spark, str(tmp_path / "reg"))
    declared = T.StructType([T.StructField("id", T.LongType()), T.StructField("name", T.StringType())])
    reg.register("db1", "t1", declared)

    same = spark.createDataFrame([Row(after=Row(id=1, name="x"))])
    assert reconcile_schema_on_restart(reg, same, "db1", "t1").count() == 0

    drifted = spark.createDataFrame([Row(after=Row(id=1, name="x", extra=2))])
    with pytest.raises(CheckpointUnreachable, match="drift"):
        reconcile_schema_on_restart(reg, drifted, "db1", "t1", policy="halt")
    report = reconcile_schema_on_restart(reg, drifted, "db1", "t1", policy="adapt")
    assert {r["issue"] for r in report.collect()} == {"undeclared_column"}
    assert reg.current("db1", "t1")["version"] == 2  # adapt registered v2


# ------------------------------------------------------------ HTTP batching


def _spool_session_factory(spool_dir, fail_first=0):
    """Factory building a fake requests.Session inside the worker
    (classes defined in the test module aren't importable by executor
    processes; a closure serializes by value). Every request lands as
    one file; the first ``fail_first`` requests per worker return 500."""

    def factory():
        import json as _json
        import os
        import uuid

        state = {"n": 0}

        class _Resp:
            def __init__(self, status):
                self.status_code = status

            def raise_for_status(self):
                pass

        class _Sess:
            def request(self, method, url, data=None):
                os.makedirs(spool_dir, exist_ok=True)
                state["n"] += 1
                status = 500 if state["n"] <= fail_first else 200
                with open(f"{spool_dir}/{uuid.uuid4().hex}.json", "w") as f:
                    _json.dump(
                        {"method": method, "url": url, "body": data, "status": status}, f
                    )
                return _Resp(status)

            def close(self):
                pass

        return _Sess()

    return factory


def _read_http_spool(spool_dir):
    import glob

    out = []
    for p in glob.glob(f"{spool_dir}/*.json"):
        with open(p) as f:
            out.append(json.load(f))
    return out


def test_http_batch_mode_one_array_request_per_chunk(spark, tmp_path):
    from deltaforge_spark.sinks.clients import http_webhook_sink

    spool = str(tmp_path / "http")
    routed = with_routing(
        _events(spark), topic_template="https://hook.example/t1"
    ).coalesce(1)
    http_webhook_sink(
        routed,
        url_template="https://hook.example/fallback",
        batch_mode=True,
        session_factory=_spool_session_factory(spool),
    )
    reqs = [r for r in _read_http_spool(spool) if r["status"] == 200]
    assert len(reqs) == 1  # one partition, one chunk → ONE array POST
    body = json.loads(reqs[0]["body"])
    assert isinstance(body, list) and len(body) == 10
    assert reqs[0]["url"] == "https://hook.example/t1"
    assert {d["op"] for d in body} == {"r"}


def test_http_per_event_mode_one_request_each(spark, tmp_path):
    from deltaforge_spark.sinks.clients import http_webhook_sink

    spool = str(tmp_path / "http")
    routed = with_routing(
        _events(spark), topic_template="https://hook.example/t1"
    ).coalesce(1)
    http_webhook_sink(
        routed,
        url_template="https://hook.example/fallback",
        session_factory=_spool_session_factory(spool),
    )
    assert len(_read_http_spool(spool)) == 10


def test_http_5xx_retried_until_success(spark, tmp_path):
    from deltaforge_spark.sinks.clients import http_webhook_sink

    spool = str(tmp_path / "http")
    routed = with_routing(
        _events(spark), topic_template="https://hook.example/t1"
    ).coalesce(1)
    http_webhook_sink(
        routed,
        url_template="https://hook.example/fallback",
        batch_mode=True,
        max_retries=3,
        session_factory=_spool_session_factory(spool, fail_first=2),
    )
    reqs = _read_http_spool(spool)
    assert sum(1 for r in reqs if r["status"] == 500) == 2  # two failed attempts
    assert sum(1 for r in reqs if r["status"] == 200) == 1  # then success


# ---------------------------------------------------- redis/nats parity


def test_redis_xadd_field_layout(spark, tmp_path):
    """Reference-exact XADD map (redis.rs:439-479): event_id +
    idempotency_key + df-event always; df-key from the routing-key →
    event_id cascade; df-headers only when routing headers exist."""
    from deltaforge_spark.sinks.clients import redis_xadd_fields

    spool = str(tmp_path / "spool-redis")
    write_client_sink(
        _events(spark),
        spool_sink_factory(spool),
        default_dest="df-stream",
        fields_fn=redis_xadd_fields,
    )
    got = read_spool(spool)
    assert len(got) == 10
    row = {g["df-key"]: g for g in got}["4"]
    assert row["dest"] == "s-4"
    assert row["event_id"] == "4"
    assert row["df-event"].startswith("{")  # the envelope JSON
    assert "testdb.t1" in row["idempotency_key"]
    assert "payload" not in row and "df-headers" not in row


def test_redis_xadd_key_cascade_falls_to_event_id(spark, tmp_path):
    from deltaforge_spark.operators import envelope_native
    from deltaforge_spark.sinks.clients import redis_xadd_fields
    from deltaforge_spark.sources import snapshot_events

    ev = envelope_native(
        snapshot_events(
            spark.createDataFrame([(9, "x")], ["id", "name"]),
            table="t1",
            event_id=F.col("id").cast("string"),
        )
    )  # no routing struct -> routing_key null -> df-key = event_id
    spool = str(tmp_path / "spool-redis2")
    write_client_sink(
        ev, spool_sink_factory(spool), default_dest="s", fields_fn=redis_xadd_fields
    )
    got = read_spool(spool)
    assert got[0]["df-key"] == "9" and got[0]["event_id"] == "9"


def test_nats_headers_and_msg_id(spark, tmp_path):
    """Nats-Msg-Id = idempotency key on every message (JetStream dedup,
    nats.rs:291-305); df-key only when a routing key resolved."""
    from deltaforge_spark.sinks.clients import nats_jetstream_sink

    spool = str(tmp_path / "spool-nats")
    df = _events(spark).withColumn(
        "routing",
        F.col("routing").withField("topic", F.lit("orders.cdc")),
    )
    nats_jetstream_sink(
        df, spool_sink_factory(spool), default_subject="orders.cdc"
    )
    got = read_spool(spool)
    assert len(got) == 10
    for g in got:
        assert g["dest"] == "orders.cdc"
        assert "testdb.t1" in g["headers"]["Nats-Msg-Id"]
        assert g["headers"]["df-key"] == json.loads(g["payload"])["event_id"]


def test_nats_subject_validation_strict_and_split(spark, tmp_path):
    """Invalid subjects (space / * / > / empty, nats.rs:248-270):
    strict mode fails the batch at send time; lenient mode publishes
    valid rows and returns the invalid ones for the DLQ."""
    from deltaforge_spark.sinks.clients import nats_jetstream_sink

    df = _events(spark).withColumn(
        "routing",
        F.col("routing").withField(
            "topic",
            F.when(F.col("event_id") == "3", F.lit("bad subject"))
            .when(F.col("event_id") == "5", F.lit("evil.*"))
            .otherwise(F.concat(F.lit("ok."), F.col("event_id"))),
        ),
    )
    with pytest.raises(Exception, match="invalid NATS subject"):
        nats_jetstream_sink(
            df, spool_sink_factory(str(tmp_path / "s1")), default_subject="d"
        )

    spool = str(tmp_path / "s2")
    bad = nats_jetstream_sink(
        df, spool_sink_factory(spool), default_subject="d", strict=False
    )
    got = read_spool(spool)
    assert len(got) == 8 and all(g["dest"].startswith("ok.") for g in got)
    assert sorted(r["event_id"] for r in bad.select("event_id").collect()) == ["3", "5"]
