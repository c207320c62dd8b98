"""StorageBackend primitives: KV+TTL, Log global sequence, Slot CAS,
Queue FIFO — memory and sqlite backends must agree on every contract.

Mirrors the reference's storage crate semantics (storage/src/lib.rs
doc contract; memory.rs global AtomicU64 sequence; sqlite.rs lazy TTL
expiry + sweep) and the checkpoint adapter (adapters/checkpoint.rs).
"""

import pytest

from deltaforge_spark.checkpoints import sink_checkpoint_key
from deltaforge_spark.sinks.foreach import OffsetStore
from deltaforge_spark.storage import (
    BackendCheckpointStore,
    MemoryStorageBackend,
    SqliteStorageBackend,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def backends(tmp_path, clock):
    return [
        MemoryStorageBackend(clock=clock),
        SqliteStorageBackend(str(tmp_path / "s.db"), clock=clock),
    ]


def test_kv_roundtrip_delete_list(tmp_path):
    for b in backends(tmp_path, FakeClock()):
        assert b.kv_get("ns", "k") is None
        b.kv_put("ns", "k", b"v1")
        b.kv_put("ns", "k2", b"v2")
        b.kv_put("other", "k", b"x")
        assert b.kv_get("ns", "k") == b"v1"
        assert b.kv_list("ns") == ["k", "k2"]  # namespace-scoped
        assert b.kv_list("ns", prefix="k2") == ["k2"]
        assert b.kv_delete("ns", "k") is True
        assert b.kv_delete("ns", "k") is False
        assert b.kv_list("ns") == ["k2"]


def test_kv_ttl_lazy_expiry(tmp_path):
    clock = FakeClock(1000.0)
    for b in backends(tmp_path, clock):
        clock.t = 1000.0  # the loop body below advances the clock
        b.kv_put_with_ttl("ns", "lease", b"holder-a", ttl_secs=60)
        assert b.kv_get("ns", "lease") == b"holder-a"
        clock.t = 1061.0
        assert b.kv_get("ns", "lease") is None  # lazy expiry on read
        assert b.kv_list("ns") == []  # listing also filters expired
        # a plain put clears any TTL (sqlite.rs:176-179)
        clock.t = 1000.0
        b.kv_put_with_ttl("ns", "x", b"1", ttl_secs=10)
        b.kv_put("ns", "x", b"2")
        clock.t = 2000.0
        assert b.kv_get("ns", "x") == b"2"


def test_sqlite_ttl_sweep(tmp_path):
    clock = FakeClock(1000.0)
    b = SqliteStorageBackend(str(tmp_path / "sweep.db"), clock=clock)
    b.kv_put_with_ttl("ns", "a", b"1", 10)
    b.kv_put_with_ttl("ns", "b", b"1", 1000)
    b.kv_put("ns", "c", b"1")
    clock.t = 1500.0
    assert b.sweep_expired() == 1  # only "a"
    assert sorted(b.kv_list("ns")) == ["b", "c"]


def test_log_global_monotonic_sequence(tmp_path):
    for b in backends(tmp_path, FakeClock()):
        s1 = b.log_append("schemas", "t1", b"v1")
        s2 = b.log_append("schemas", "t2", b"other-key")
        s3 = b.log_append("schemas", "t1", b"v2")
        # GLOBAL sequence: interleaved keys still strictly increase
        assert s1 < s2 < s3
        assert b.log_list("schemas", "t1") == [(s1, b"v1"), (s3, b"v2")]
        assert b.log_since("schemas", "t1", s1) == [(s3, b"v2")]
        assert b.log_latest("schemas", "t1") == (s3, b"v2")
        assert b.log_latest("schemas", "absent") is None


def test_slot_upsert_and_cas(tmp_path):
    for b in backends(tmp_path, FakeClock()):
        assert b.slot_get("cursors", "snap") is None
        assert b.slot_upsert("cursors", "snap", b"pos1") == 1
        assert b.slot_upsert("cursors", "snap", b"pos2") == 2
        assert b.slot_get("cursors", "snap") == (2, b"pos2")
        # CAS succeeds only on the expected version
        assert b.slot_cas("cursors", "snap", 1, b"stale") is False
        assert b.slot_get("cursors", "snap") == (2, b"pos2")
        assert b.slot_cas("cursors", "snap", 2, b"pos3") is True
        assert b.slot_get("cursors", "snap") == (3, b"pos3")
        assert b.slot_delete("cursors", "snap") is True
        assert b.slot_delete("cursors", "snap") is False


def test_queue_fifo_ack_drop(tmp_path):
    for b in backends(tmp_path, FakeClock()):
        ids = [b.queue_push("dlq", "p1", f"e{i}".encode()) for i in range(5)]
        assert ids == sorted(ids)
        assert b.queue_len("dlq", "p1") == 5
        peeked = b.queue_peek("dlq", "p1", 3)
        assert [v for _, v in peeked] == [b"e0", b"e1", b"e2"]
        assert b.queue_len("dlq", "p1") == 5  # peek does not consume
        # ack everything up to the second entry
        assert b.queue_ack("dlq", "p1", ids[1]) == 2
        assert [v for _, v in b.queue_peek("dlq", "p1", 10)] == [b"e2", b"e3", b"e4"]
        # drop_oldest bounded by queue length
        assert b.queue_drop_oldest("dlq", "p1", 2) == 2
        assert b.queue_drop_oldest("dlq", "p1", 99) == 1
        assert b.queue_len("dlq", "p1") == 0


def test_backend_checkpoint_adapter(tmp_path):
    b = SqliteStorageBackend(str(tmp_path / "a.db"))
    store = BackendCheckpointStore(b)
    assert not store.supports_versioning()
    store.put("src1", {"pos": 42})
    assert store.get("src1") == {"pos": 42}
    assert store.list() == ["src1"]
    # composes with OffsetStore and the per-sink key layout
    offsets = OffsetStore.on_store(store, "src1")
    offsets.commit("kafka", 7)
    assert offsets.committed("kafka") == 7
    assert store.list_with_prefix("src1::sink::") == [
        sink_checkpoint_key("src1", "kafka")
    ]
    assert store.delete("src1") is True
    # underlying state lives in the "checkpoints" namespace
    assert b.kv_list("checkpoints") == [sink_checkpoint_key("src1", "kafka")]
