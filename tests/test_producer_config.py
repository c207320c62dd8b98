"""Kafka producer-config surface (reference kafka.rs:176-236 layering,
performance.md:58-76 client_conf tuning): defaults, EOS/ALO branches,
overrides-applied-last, and the spec → sink → producer round-trip."""

from deltaforge_spark.plans.refspec import compile_reference_pipeline, parse_reference_spec
from deltaforge_spark.sinks.kafka_eos import resolve_producer_config


def test_defaults_match_reference_transactional():
    cfg = resolve_producer_config(
        brokers="b:9092", sink_id="k1", pipeline="p1", exactly_once=True
    )
    # kafka.rs:180-190 connection + batching defaults
    assert cfg["bootstrap.servers"] == "b:9092"
    assert cfg["client.id"] == "deltaforge-k1"
    assert cfg["compression.type"] == "lz4"
    assert cfg["linger.ms"] == "5"
    # kafka.rs:196-202 transactional timeouts bounded by txn timeout
    assert cfg["transaction.timeout.ms"] == "60000"
    assert cfg["message.timeout.ms"] == "30000"
    assert cfg["delivery.timeout.ms"] == "30000"
    assert cfg["request.timeout.ms"] == "15000"
    # kafka.rs:211-221 exactly-once reliability
    assert cfg["transactional.id"] == "deltaforge-p1-k1"
    assert cfg["enable.idempotence"] == "true"
    assert cfg["acks"] == "all"
    assert cfg["retries"] == "1000000"


def test_defaults_match_reference_at_least_once():
    cfg = resolve_producer_config(
        brokers="b:9092", sink_id="k1", pipeline="p1", exactly_once=False
    )
    # kafka.rs:203-209 ALO timeouts, :222-228 bounded retries, no txn id
    assert cfg["message.timeout.ms"] == "60000"
    assert cfg["delivery.timeout.ms"] == "120000"
    assert cfg["request.timeout.ms"] == "30000"
    assert cfg["retries"] == "10"
    assert "transactional.id" not in cfg and "transaction.timeout.ms" not in cfg


def test_client_conf_overrides_apply_last():
    # performance.md:58-76 — linger.ms: "0" for drain workloads must
    # beat the built-in 5ms default; unknown keys pass through verbatim
    cfg = resolve_producer_config(
        brokers="b:9092",
        sink_id="k1",
        pipeline="p1",
        exactly_once=True,
        client_conf={"linger.ms": "0", "compression.type": "zstd", "batch.num.messages": 50000},
    )
    assert cfg["linger.ms"] == "0"
    assert cfg["compression.type"] == "zstd"
    assert cfg["batch.num.messages"] == "50000"  # stringified like ClientConfig::set


SPEC = {
    "apiVersion": "deltaforge/v1",
    "kind": "Pipeline",
    "metadata": {"name": "tune", "tenant": "acme"},
    "spec": {
        "source": {"type": "mysql", "config": {"dsn": "mysql://u:p@h/db"}},
        "sinks": [
            {
                "type": "kafka",
                "config": {
                    "id": "k1",
                    "brokers": "b:9092",
                    "topic": "cdc.${source.table}",
                    "exactly_once": True,
                    "client_conf": {"linger.ms": "0", "compression.type": "zstd"},
                },
            }
        ],
    },
}


def test_spec_roundtrip_reaches_producer(spark, sf_dir, tmp_path):
    """The YAML client_conf block must survive parse → lower → resolved
    transport config → the actual per-partition producer object."""
    ref = parse_reference_spec(SPEC)
    assert ref.sinks[0].config["client_conf"]["linger.ms"] == "0"

    spool = str(tmp_path / "broker")
    program, sinks, _policy, _ref = compile_reference_pipeline(
        ref, transports={"k1": spool}
    )
    [sink] = sinks
    # lowered SinkSpec exposes the resolved config: defaults + overrides
    tc = sink.transport_conf
    assert tc["linger.ms"] == "0" and tc["compression.type"] == "zstd"
    assert tc["transactional.id"] == "deltaforge-tune-k1"
    assert tc["enable.idempotence"] == "true"  # untouched default

    # and the file-broker producer factory hands it to every producer
    from deltaforge_spark.sinks.kafka_eos import file_broker_producer_factory

    p = file_broker_producer_factory(spool, config=tc)("txn-1")
    assert p.config["linger.ms"] == "0"

    # end-to-end: the lowered sink still delivers through the spool
    df = program(spark, sf_dir).limit(20)
    sink.write(df)
    import glob as _g

    assert _g.glob(f"{spool}/log/*.ndjson")
