"""Checkpoint persistence backends with optional versioning.

Re-expresses the reference's checkpoints crate
(reference: crates/checkpoints/src/lib.rs:20-190 — ``CheckpointStore``
trait: get/put/delete/list, ``put_raw_multi`` atomic multi-key commit,
prefix listing, optional versioning with rollback;
file_store.rs:10-82 — single JSON map file with tmp+rename atomicity;
mem_store.rs — HashMap backend;
sqlite_store.rs:37-300 — WAL-mode SQLite with per-key version history)
plus the per-sink MIN-resume proxy from
crates/runner/src/pipeline_manager.rs:25-82.

Spark mapping: these stores live on the DRIVER (control plane). Spark's
own streaming checkpoint handles source offsets for the engine; this
layer carries what Spark does not — per-sink delivery positions, source
cursors for the changefeed stand-in, and rollback history. On a real
cluster the SQLite file sits on shared storage (or the same contract is
implemented over a JDBC table); the semantics below are the contract.

All operations are synchronous: the caller is the driver-side
foreachBatch hook or the control plane, never an executor.
"""

from __future__ import annotations

import base64
import datetime as _dt
import json
import os
import sqlite3
import threading
from dataclasses import dataclass
from typing import Callable, Iterable


class CheckpointError(RuntimeError):
    """Storage-layer failure (reference checkpoints/src/errors.rs)."""


@dataclass
class VersionInfo:
    """Version metadata (reference lib.rs:183-190)."""

    version: int
    created_at: str  # RFC 3339
    size_bytes: int


def sink_checkpoint_key(source_id: str, sink_id: str) -> str:
    """Per-sink checkpoint key ``{source}::sink::{sink}``
    (reference pipeline_manager.rs:41)."""
    return f"{source_id}::sink::{sink_id}"


class CheckpointStore:
    """Base store: raw byte checkpoints keyed by source id.

    Subclasses implement ``get_raw/put_raw/delete/list``; the rest has
    reference-matching defaults (lib.rs:43-104): non-atomic
    ``put_raw_multi`` fallback, filter-based ``list_with_prefix``,
    no-op versioning.
    """

    # -- required surface --------------------------------------------------
    def get_raw(self, source_id: str) -> bytes | None:
        raise NotImplementedError

    def put_raw(self, source_id: str, data: bytes) -> None:
        raise NotImplementedError

    def delete(self, source_id: str) -> bool:
        raise NotImplementedError

    def list(self) -> list[str]:
        raise NotImplementedError

    # -- defaults ----------------------------------------------------------
    def put_raw_multi(self, entries: Iterable[tuple[str, bytes]]) -> None:
        """Write several checkpoints together. Default is sequential
        (NOT atomic — lib.rs:44-53); transactional backends override."""
        for key, data in entries:
            self.put_raw(key, data)

    def list_with_prefix(self, prefix: str) -> list[str]:
        return [k for k in self.list() if k.startswith(prefix)]

    def supports_versioning(self) -> bool:
        return False

    def put_raw_versioned(self, source_id: str, data: bytes) -> int | None:
        self.put_raw(source_id, data)
        return None

    def get_version_raw(self, source_id: str, version: int) -> bytes | None:
        return None

    def list_versions(self, source_id: str) -> list[VersionInfo]:
        return []

    def rollback(self, source_id: str, version: int) -> int | None:
        """Copy an old version forward as the new latest
        (reference lib.rs:163-177)."""
        if not self.supports_versioning():
            raise CheckpointError("rollback requires versioning")
        data = self.get_version_raw(source_id, version)
        if data is None:
            return None
        return self.put_raw_versioned(source_id, data)

    # -- typed JSON helpers (reference CheckpointStoreExt) -----------------
    def get(self, source_id: str):
        raw = self.get_raw(source_id)
        return None if raw is None else json.loads(raw.decode("utf-8"))

    def put(self, source_id: str, checkpoint) -> None:
        self.put_raw(source_id, json.dumps(checkpoint).encode("utf-8"))

    def put_versioned(self, source_id: str, checkpoint) -> int | None:
        return self.put_raw_versioned(
            source_id, json.dumps(checkpoint).encode("utf-8")
        )

    def get_version(self, source_id: str, version: int):
        raw = self.get_version_raw(source_id, version)
        return None if raw is None else json.loads(raw.decode("utf-8"))


class MemCheckpointStore(CheckpointStore):
    """In-memory backend (reference mem_store.rs)."""

    def __init__(self) -> None:
        self._map: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def get_raw(self, source_id: str) -> bytes | None:
        with self._lock:
            return self._map.get(source_id)

    def put_raw(self, source_id: str, data: bytes) -> None:
        with self._lock:
            self._map[source_id] = bytes(data)

    def delete(self, source_id: str) -> bool:
        with self._lock:
            return self._map.pop(source_id, None) is not None

    def list(self) -> list[str]:
        with self._lock:
            return sorted(self._map)


class FileCheckpointStore(CheckpointStore):
    """Single-JSON-file backend with tmp+rename atomicity
    (reference file_store.rs:23-42: load map → mutate → write .tmp →
    rename). Values are base64 in the file (bytes aren't JSON).

    ``put_raw_multi`` here IS atomic — one load, one rename — closing
    the reference's own TODO (lib.rs:43: "FileCheckpointStore should
    override this with rename-based atomicity").
    """

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()

    def _load(self) -> dict[str, bytes]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path, encoding="utf-8") as f:
            enc = json.load(f)
        return {k: base64.b64decode(v) for k, v in enc.items()}

    def _save(self, data: dict[str, bytes]) -> None:
        enc = {k: base64.b64encode(v).decode("ascii") for k, v in data.items()}
        tmp = f"{self.path}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(enc, f, indent=2)
        os.replace(tmp, self.path)

    def get_raw(self, source_id: str) -> bytes | None:
        with self._lock:
            return self._load().get(source_id)

    def put_raw(self, source_id: str, data: bytes) -> None:
        with self._lock:
            m = self._load()
            m[source_id] = bytes(data)
            self._save(m)

    def put_raw_multi(self, entries: Iterable[tuple[str, bytes]]) -> None:
        with self._lock:
            m = self._load()
            for key, data in entries:
                m[key] = bytes(data)
            self._save(m)

    def delete(self, source_id: str) -> bool:
        with self._lock:
            m = self._load()
            existed = m.pop(source_id, None) is not None
            if existed:
                self._save(m)
            return existed

    def list(self) -> list[str]:
        with self._lock:
            return sorted(self._load())


_SQLITE_DDL = """
CREATE TABLE IF NOT EXISTS checkpoints (
    id          INTEGER PRIMARY KEY AUTOINCREMENT,
    key         TEXT    NOT NULL,
    version     INTEGER NOT NULL,
    payload     BLOB    NOT NULL,
    created_at  TEXT    NOT NULL,
    UNIQUE(key, version)
);
CREATE INDEX IF NOT EXISTS idx_ckpt_key_ver
    ON checkpoints(key, version DESC);
"""


class SqliteCheckpointStore(CheckpointStore):
    """SQLite backend with version history (reference
    sqlite_store.rs:37-300): same table DDL, WAL journal, latest =
    MAX(version), multi-key puts in one transaction, LIKE-escaped
    prefix listing. stdlib ``sqlite3``, one guarded connection."""

    def __init__(self, path: str = ":memory:") -> None:
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            cur = self._conn.cursor()
            cur.execute("PRAGMA journal_mode=WAL")
            cur.execute("PRAGMA synchronous=NORMAL")
            cur.execute("PRAGMA busy_timeout=5000")
            self._conn.executescript(_SQLITE_DDL)
            self._conn.commit()

    @classmethod
    def in_memory(cls) -> "SqliteCheckpointStore":
        return cls(":memory:")

    @staticmethod
    def _now() -> str:
        return _dt.datetime.now(_dt.timezone.utc).isoformat()

    def get_raw(self, source_id: str) -> bytes | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT payload FROM checkpoints WHERE key = ? "
                "ORDER BY version DESC LIMIT 1",
                (source_id,),
            ).fetchone()
        return None if row is None else bytes(row[0])

    def _next_version(self, key: str) -> int:
        row = self._conn.execute(
            "SELECT COALESCE(MAX(version), 0) + 1 FROM checkpoints WHERE key = ?",
            (key,),
        ).fetchone()
        return int(row[0])

    def put_raw(self, source_id: str, data: bytes) -> None:
        self.put_raw_versioned(source_id, data)

    def put_raw_versioned(self, source_id: str, data: bytes) -> int | None:
        with self._lock:
            v = self._next_version(source_id)
            self._conn.execute(
                "INSERT INTO checkpoints (key, version, payload, created_at) "
                "VALUES (?, ?, ?, ?)",
                (source_id, v, sqlite3.Binary(bytes(data)), self._now()),
            )
            self._conn.commit()
        return v

    def put_raw_multi(self, entries: Iterable[tuple[str, bytes]]) -> None:
        """All sink checkpoints from one batch commit atomically
        (reference sqlite_store.rs:124-162 — single transaction)."""
        with self._lock:
            try:
                for key, data in entries:
                    v = self._next_version(key)
                    self._conn.execute(
                        "INSERT INTO checkpoints (key, version, payload, created_at) "
                        "VALUES (?, ?, ?, ?)",
                        (key, v, sqlite3.Binary(bytes(data)), self._now()),
                    )
                self._conn.commit()
            except Exception:
                self._conn.rollback()
                raise

    def delete(self, source_id: str) -> bool:
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM checkpoints WHERE key = ?", (source_id,)
            )
            self._conn.commit()
        return cur.rowcount > 0

    def list(self) -> list[str]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT DISTINCT key FROM checkpoints ORDER BY key"
            ).fetchall()
        return [r[0] for r in rows]

    def list_with_prefix(self, prefix: str) -> list[str]:
        escaped = (
            prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        )
        with self._lock:
            rows = self._conn.execute(
                "SELECT DISTINCT key FROM checkpoints "
                "WHERE key LIKE ? ESCAPE '\\' ORDER BY key",
                (escaped + "%",),
            ).fetchall()
        return [r[0] for r in rows]

    def supports_versioning(self) -> bool:
        return True

    def get_version_raw(self, source_id: str, version: int) -> bytes | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT payload FROM checkpoints WHERE key = ? AND version = ?",
                (source_id, version),
            ).fetchone()
        return None if row is None else bytes(row[0])

    def list_versions(self, source_id: str) -> list[VersionInfo]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT version, created_at, LENGTH(payload) FROM checkpoints "
                "WHERE key = ? ORDER BY version DESC",
                (source_id,),
            ).fetchall()
        return [VersionInfo(int(v), ts, int(n)) for v, ts, n in rows]


CheckpointCmp = Callable[[bytes, bytes], int]


class PerSinkCheckpointView(CheckpointStore):
    """MIN-resume proxy over per-sink checkpoint keys (reference
    pipeline_manager.rs:25-82 ``PerSinkCheckpointProxy``).

    Reading the plain ``source_id`` key returns the SMALLEST checkpoint
    across ``{source}::sink::*`` keys per the source-provided comparison
    (MySQL file:pos and PG LSN don't compare lexicographically —
    pipeline_manager.rs:28-30), so the source replays from the position
    the slowest sink needs. Falls back to the legacy plain key when no
    per-sink keys exist (seamless migration, pipeline_manager.rs:44-48).
    Everything else passes through.
    """

    def __init__(
        self, inner: CheckpointStore, source_id: str, cmp: CheckpointCmp
    ) -> None:
        self.inner = inner
        self.source_id = source_id
        self.cmp = cmp

    def get_raw(self, key: str) -> bytes | None:
        if key != self.source_id:
            return self.inner.get_raw(key)
        per_sink = self.inner.list_with_prefix(f"{self.source_id}::sink::")
        if not per_sink:
            return self.inner.get_raw(key)
        smallest: bytes | None = None
        for k in per_sink:
            data = self.inner.get_raw(k)
            if data is None:
                continue
            if smallest is None or self.cmp(data, smallest) < 0:
                smallest = data
        return smallest

    def put_raw(self, key: str, data: bytes) -> None:
        self.inner.put_raw(key, data)

    def delete(self, key: str) -> bool:
        return self.inner.delete(key)

    def list(self) -> list[str]:
        return self.inner.list()
