"""Checkpoint store backends: mem/file/sqlite semantics, atomic
multi-put, versioning + rollback, per-sink MIN-resume proxy with a
source comparison function, and OffsetStore on a store backend.

Mirrors the reference's own test intents:
- file_store.rs tests: roundtrip, reopen survival, missing → None,
  list/delete idempotence
- sqlite_store.rs tests: CRUD, versioning + rollback, multi-put atomicity
- pipeline_manager.rs:25-82: MIN across per-sink keys via cmp_fn,
  legacy plain-key fallback
"""

import json

import pytest

from deltaforge_spark.checkpoints import (
    CheckpointError,
    FileCheckpointStore,
    MemCheckpointStore,
    PerSinkCheckpointView,
    SqliteCheckpointStore,
    sink_checkpoint_key,
)
from deltaforge_spark.sinks.foreach import OffsetStore


def all_stores(tmp_path):
    return [
        MemCheckpointStore(),
        FileCheckpointStore(str(tmp_path / "ckpt.json")),
        SqliteCheckpointStore(str(tmp_path / "ckpt.db")),
    ]


def test_roundtrip_and_missing(tmp_path):
    for store in all_stores(tmp_path):
        assert store.get_raw("absent") is None
        store.put_raw("src-1", b"pos-42")
        assert store.get_raw("src-1") == b"pos-42"
        # overwrite returns the latest
        store.put_raw("src-1", b"pos-43")
        assert store.get_raw("src-1") == b"pos-43"


def test_list_and_delete(tmp_path):
    for store in all_stores(tmp_path):
        store.put_raw("a", b"1")
        store.put_raw("b", b"2")
        assert sorted(store.list()) == ["a", "b"]
        assert store.delete("a") is True
        assert store.delete("a") is False  # second delete is a no-op
        assert store.list() == ["b"]


def test_list_with_prefix_escapes_like_wildcards(tmp_path):
    # sqlite_store.rs:188-215: % and _ in the prefix are literals
    for store in all_stores(tmp_path):
        store.put_raw("p1::sink::kafka", b"x")
        store.put_raw("p1::sink::lake", b"y")
        store.put_raw("p2::sink::kafka", b"z")
        store.put_raw("p_::sink::odd", b"w")
        assert store.list_with_prefix("p1::sink::") == [
            "p1::sink::kafka",
            "p1::sink::lake",
        ]
        # '_' must not act as a single-char wildcard
        assert store.list_with_prefix("p_") == ["p_::sink::odd"]


def test_file_store_survives_reopen(tmp_path):
    path = str(tmp_path / "c.json")
    FileCheckpointStore(path).put_raw("s", b"v1")
    assert FileCheckpointStore(path).get_raw("s") == b"v1"


def test_sqlite_survives_reopen(tmp_path):
    path = str(tmp_path / "c.db")
    SqliteCheckpointStore(path).put_raw("s", b"v1")
    assert SqliteCheckpointStore(path).get_raw("s") == b"v1"


def test_typed_json_helpers(tmp_path):
    for store in all_stores(tmp_path):
        store.put("src", {"file": "mysql-bin.000005", "pos": 12345})
        assert store.get("src") == {"file": "mysql-bin.000005", "pos": 12345}


def test_sqlite_versioning_and_rollback(tmp_path):
    store = SqliteCheckpointStore.in_memory()
    assert store.supports_versioning()
    v1 = store.put_raw_versioned("k", b"one")
    v2 = store.put_raw_versioned("k", b"two")
    assert (v1, v2) == (1, 2)
    assert store.get_raw("k") == b"two"
    assert store.get_version_raw("k", 1) == b"one"
    versions = store.list_versions("k")
    assert [v.version for v in versions] == [2, 1]  # newest first
    assert versions[0].size_bytes == 3
    # rollback copies v1 forward as a NEW latest version
    v3 = store.rollback("k", 1)
    assert v3 == 3
    assert store.get_raw("k") == b"one"
    assert store.get_version_raw("k", 2) == b"two"  # history intact


def test_rollback_requires_versioning():
    with pytest.raises(CheckpointError):
        MemCheckpointStore().rollback("k", 1)


def test_rollback_missing_version_is_none():
    store = SqliteCheckpointStore.in_memory()
    store.put_raw("k", b"x")
    assert store.rollback("k", 99) is None


def test_put_raw_multi_atomic_sqlite():
    # sqlite_store.rs:124-162: one transaction; a failure mid-write
    # leaves no partial state.
    store = SqliteCheckpointStore.in_memory()

    def gen():
        yield ("a", b"1")
        yield ("b", b"2")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        store.put_raw_multi(gen())
    assert store.list() == []  # nothing committed

    store.put_raw_multi([("a", b"1"), ("b", b"2")])
    assert store.get_raw("a") == b"1" and store.get_raw("b") == b"2"


def test_put_raw_multi_file_atomic_rename(tmp_path):
    store = FileCheckpointStore(str(tmp_path / "m.json"))
    store.put_raw_multi([("a", b"1"), ("b", b"2")])
    assert sorted(store.list()) == ["a", "b"]
    # one file write: the on-disk map holds both
    with open(store.path) as f:
        assert sorted(json.load(f)) == ["a", "b"]


def _mysql_cmp(a: bytes, b: bytes) -> int:
    """(file, pos) compare — NOT lexicographic on bytes."""
    da, db = json.loads(a), json.loads(b)
    ka = (da["file"], da["pos"])
    kb = (db["file"], db["pos"])
    return -1 if ka < kb else (1 if ka > kb else 0)


def test_per_sink_view_min_resume():
    inner = MemCheckpointStore()
    view = PerSinkCheckpointView(inner, "pipe1", _mysql_cmp)
    # pos 9 vs pos 1000: lexicographic bytes would pick "1000" as smaller
    inner.put(sink_checkpoint_key("pipe1", "kafka"), {"file": "bin.01", "pos": 1000})
    inner.put(sink_checkpoint_key("pipe1", "lake"), {"file": "bin.01", "pos": 9})
    got = json.loads(view.get_raw("pipe1"))
    assert got == {"file": "bin.01", "pos": 9}  # slowest sink wins


def test_per_sink_view_legacy_fallback():
    # pipeline_manager.rs:44-48: no per-sink keys → plain key
    inner = MemCheckpointStore()
    inner.put("pipe1", {"file": "bin.01", "pos": 5})
    view = PerSinkCheckpointView(inner, "pipe1", _mysql_cmp)
    assert json.loads(view.get_raw("pipe1")) == {"file": "bin.01", "pos": 5}
    # non-source keys pass through
    inner.put_raw("other", b"x")
    assert view.get_raw("other") == b"x"


def test_offset_store_on_checkpoint_backend(tmp_path):
    store = SqliteCheckpointStore(str(tmp_path / "o.db"))
    offsets = OffsetStore.on_store(store, "pipe1")
    assert offsets.committed("kafka") == -1
    offsets.commit("kafka", 3)
    offsets.commit("lake", 1)
    assert offsets.committed("kafka") == 3
    # monotonic: a replayed older batch id can't move offsets backward
    offsets.commit("kafka", 2)
    assert offsets.committed("kafka") == 3
    assert offsets.resume_point(["kafka", "lake"]) == 1
    # uncommitted sink forces full replay
    assert offsets.resume_point(["kafka", "lake", "http"]) == -1
    # keys follow the reference layout; history is versioned
    assert store.list_with_prefix("pipe1::sink::") == [
        "pipe1::sink::kafka",
        "pipe1::sink::lake",
    ]
    # two commits → two versions (the clamped replay re-wrote batch_id=3)
    assert [v.version for v in store.list_versions("pipe1::sink::kafka")] == [2, 1]
    assert store.get_version("pipe1::sink::kafka", 1) == {"batch_id": 3}


def test_offset_store_requires_exactly_one_backend(tmp_path):
    with pytest.raises(ValueError):
        OffsetStore()
    with pytest.raises(ValueError):
        OffsetStore(str(tmp_path / "x.json"), store=MemCheckpointStore())
