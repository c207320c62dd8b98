"""Exactly-once Kafka delivery matrix — mirrors the reference's
transactional semantics (kafka.rs:679-800): commit visibility,
abort-on-failure, replay without duplicates, zombie fencing fatal.
The broker is the filesystem test double (read_committed isolation)."""

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.operators import envelope_native, with_routing
from deltaforge_spark.sinks import (
    FileTransactionalBroker,
    ProducerFencedError,
    SinkFatalError,
    SinkRetryableError,
    file_broker_producer_factory,
    write_kafka_eos,
)
from deltaforge_spark.sinks.kafka_eos import _deliver_partition
from deltaforge_spark.sources import snapshot_events


@pytest.fixture()
def routed(spark):
    base = spark.createDataFrame([(i, f"n{i}") for i in range(20)], ["id", "name"])
    ev = snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )
    return with_routing(
        envelope_native(ev), topic_template="t-${source.table}", key_template="${after.id}"
    )


def test_eos_commit_visible_exactly_once(routed, tmp_path):
    state = str(tmp_path / "broker")
    write_kafka_eos(
        routed,
        file_broker_producer_factory(state),
        pipeline="p1",
        sink_id="kafka-main",
    )
    broker = FileTransactionalBroker(state)
    msgs = broker.read_committed()
    assert len(msgs) == 20
    assert {m["topic"] for m in msgs} == {"t-t1"}
    assert sorted(int(m["key"]) for m in msgs) == list(range(20))
    # one transaction per non-empty partition, each all-or-nothing
    assert broker.committed_transactions() >= 1
    assert all(m["txn_id"].startswith("deltaforge-p1-kafka-main-p") for m in msgs)


class _Rows:
    """Tiny row stand-in for unit-level _deliver_partition tests."""

    def __init__(self, n):
        self.n = n

    def __iter__(self):
        # positional (topic, key, value, headers_json) — the
        # _deliver_partition row contract (Spark Rows are tuples)
        return (("t", str(i), f"v{i}", None) for i in range(self.n))


class _FailingSendProducer:
    """Delegates to a real file producer but fails the Nth send."""

    def __init__(self, inner, fail_at):
        self.inner = inner
        self.fail_at = fail_at
        self.sent = 0
        self.aborted = False

    def init_transactions(self):
        self.inner.init_transactions()

    def begin_transaction(self):
        self.inner.begin_transaction()

    def send(self, *a):
        if self.sent == self.fail_at:
            raise IOError("delivery timeout")
        self.sent += 1
        self.inner.send(*a)

    def commit_transaction(self):
        self.inner.commit_transaction()

    def abort_transaction(self):
        self.aborted = True
        self.inner.abort_transaction()


def test_eos_abort_on_send_failure_nothing_visible(tmp_path):
    broker = FileTransactionalBroker(str(tmp_path / "b"))
    p = _FailingSendProducer(broker.producer("txn-1"), fail_at=3)
    p.init_transactions()
    with pytest.raises(SinkRetryableError, match="kafka batch error"):
        _deliver_partition(iter(_Rows(10)), p)
    assert p.aborted
    assert broker.read_committed() == []  # read_committed sees nothing


def test_eos_replay_after_abort_no_duplicates(tmp_path):
    broker = FileTransactionalBroker(str(tmp_path / "b"))
    # attempt 1 dies mid-transaction
    p1 = _FailingSendProducer(broker.producer("txn-1"), fail_at=5)
    p1.init_transactions()
    with pytest.raises(SinkRetryableError):
        _deliver_partition(iter(_Rows(10)), p1)
    # replay with a fresh producer incarnation (same transactional.id)
    p2 = broker.producer("txn-1")
    p2.init_transactions()
    n = _deliver_partition(iter(_Rows(10)), p2)
    assert n == 10
    msgs = broker.read_committed()
    assert len(msgs) == 10  # exactly one copy despite the replay
    assert broker.committed_transactions() == 1


def test_fenced_producer_is_fatal(tmp_path):
    broker = FileTransactionalBroker(str(tmp_path / "b"))
    zombie = broker.producer("txn-1")
    zombie.init_transactions()
    # a newer incarnation registers the same transactional.id
    fresh = broker.producer("txn-1")
    fresh.init_transactions()
    # the zombie's next transactional op is fenced → fatal, not retryable
    with pytest.raises(SinkFatalError, match="begin_transaction fatal"):
        _deliver_partition(iter(_Rows(3)), zombie)
    # the fresh producer is unaffected
    assert _deliver_partition(iter(_Rows(3)), fresh) == 3
    assert len(broker.read_committed()) == 3


def test_fenced_during_commit_is_fatal(tmp_path):
    broker = FileTransactionalBroker(str(tmp_path / "b"))
    zombie = broker.producer("txn-1")
    zombie.init_transactions()
    zombie.begin_transaction()
    zombie.send("t", "k", "v", None)
    # fencing happens while the zombie's transaction is in flight
    fresh = broker.producer("txn-1")
    fresh.init_transactions()
    with pytest.raises(ProducerFencedError):
        zombie.commit_transaction()
    assert broker.read_committed() == []


class _FlakyCommitProducer:
    def __init__(self, inner):
        self.inner = inner
        self.aborted = False

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def commit_transaction(self):
        raise IOError("commit timeout")

    def abort_transaction(self):
        self.aborted = True
        self.inner.abort_transaction()


def test_commit_failure_aborts_and_is_retryable(tmp_path):
    broker = FileTransactionalBroker(str(tmp_path / "b"))
    p = _FlakyCommitProducer(broker.producer("txn-1"))
    p.init_transactions()
    with pytest.raises(SinkRetryableError, match="commit_transaction failed"):
        _deliver_partition(iter(_Rows(4)), p)
    assert p.aborted
    assert broker.read_committed() == []
