"""Unified storage backend for operational runtime state.

Re-expresses the reference's storage crate
(reference: crates/storage/src/lib.rs:1-140 — four primitives over a
``(ns, key)`` address space: **KV** with optional TTL (checkpoints,
FSM, leases, dedup), **Log** append-only with a global monotonic
sequence (schema registry), **Slot** versioned mutable record with
compare-and-swap (snapshot cursors, leader election), **Queue**
ordered bounded FIFO (quarantine buffer, DLQ);
memory.rs — testing backend with an AtomicU64 global sequence;
sqlite.rs:40-82 — WAL-mode SQLite with the df_kv/df_log/df_slot/
df_queue tables, lazy TTL expiry on read + sweep;
adapters/checkpoint.rs — CheckpointStore over the KV primitive under
the "checkpoints" namespace).

Spark mapping: this is DRIVER/control-plane state — per-sink offsets,
snapshot cursors, DLQ entries, sensed-schema history. Executor-scale
data never flows through here. The schema registry's durable log
(adapters/schema_registry.rs) is covered separately by
``schema/registry.py``'s append-only parquet table — the Spark-native
expression of the same replayable-log contract.

Synchronous by design (the callers are driver-side hooks); the SQLite
backend is single-node production shape, the memory backend is for
tests — the same split the reference ships.
"""

from __future__ import annotations

import sqlite3
import threading
import time
from typing import Callable

from .checkpoints import CheckpointStore


class StorageBackend:
    """The four primitives (reference lib.rs:40-140). All methods
    operate within a ``(ns, key)`` address space."""

    # -- KV ---------------------------------------------------------------
    def kv_get(self, ns: str, key: str) -> bytes | None:
        raise NotImplementedError

    def kv_put(self, ns: str, key: str, value: bytes) -> None:
        raise NotImplementedError

    def kv_put_with_ttl(self, ns: str, key: str, value: bytes, ttl_secs: int) -> None:
        """Store with TTL; expiry is lazy on read + sweep."""
        raise NotImplementedError

    def kv_delete(self, ns: str, key: str) -> bool:
        raise NotImplementedError

    def kv_list(self, ns: str, prefix: str | None = None) -> list[str]:
        raise NotImplementedError

    # -- Log --------------------------------------------------------------
    def log_append(self, ns: str, key: str, value: bytes) -> int:
        """Append; returns the GLOBAL monotonic sequence number."""
        raise NotImplementedError

    def log_list(self, ns: str, key: str) -> list[tuple[int, bytes]]:
        raise NotImplementedError

    def log_since(self, ns: str, key: str, since_seq: int) -> list[tuple[int, bytes]]:
        """Entries with seq > since_seq."""
        raise NotImplementedError

    def log_latest(self, ns: str, key: str) -> tuple[int, bytes] | None:
        raise NotImplementedError

    # -- Slot -------------------------------------------------------------
    def slot_upsert(self, ns: str, key: str, state: bytes) -> int:
        """Upsert; returns the new version number (starts at 1)."""
        raise NotImplementedError

    def slot_get(self, ns: str, key: str) -> tuple[int, bytes] | None:
        raise NotImplementedError

    def slot_cas(self, ns: str, key: str, expected_version: int, state: bytes) -> bool:
        """Compare-and-swap; False on version mismatch (not an error)."""
        raise NotImplementedError

    def slot_delete(self, ns: str, key: str) -> bool:
        raise NotImplementedError

    # -- Queue ------------------------------------------------------------
    def queue_push(self, ns: str, key: str, value: bytes) -> int:
        """Push; returns the entry id."""
        raise NotImplementedError

    def queue_peek(self, ns: str, key: str, limit: int) -> list[tuple[int, bytes]]:
        """Up to ``limit`` oldest entries, not consumed."""
        raise NotImplementedError

    def queue_ack(self, ns: str, key: str, up_to_id: int) -> int:
        """Delete all entries with id <= up_to_id; returns count."""
        raise NotImplementedError

    def queue_len(self, ns: str, key: str) -> int:
        raise NotImplementedError

    def queue_drop_oldest(self, ns: str, key: str, count: int) -> int:
        """Drop the oldest ``count``; returns count actually dropped."""
        raise NotImplementedError


class MemoryStorageBackend(StorageBackend):
    """Testing backend (reference memory.rs): dict state, one global
    AtomicU64-style sequence shared by logs and queues."""

    def __init__(self, clock: Callable[[], float] = time.time) -> None:
        self._clock = clock
        self._lock = threading.Lock()
        self._seq = 0
        self._kv: dict[tuple[str, str], tuple[bytes, float | None]] = {}
        self._log: dict[tuple[str, str], list[tuple[int, bytes]]] = {}
        self._slot: dict[tuple[str, str], tuple[int, bytes]] = {}
        self._queue: dict[tuple[str, str], list[tuple[int, bytes]]] = {}

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    # KV
    def kv_get(self, ns, key):
        with self._lock:
            hit = self._kv.get((ns, key))
            if hit is None:
                return None
            value, expires_at = hit
            if expires_at is not None and expires_at <= self._clock():
                del self._kv[(ns, key)]  # lazy expiry on read
                return None
            return value

    def kv_put(self, ns, key, value):
        with self._lock:
            self._kv[(ns, key)] = (bytes(value), None)

    def kv_put_with_ttl(self, ns, key, value, ttl_secs):
        with self._lock:
            self._kv[(ns, key)] = (bytes(value), self._clock() + ttl_secs)

    def kv_delete(self, ns, key):
        with self._lock:
            return self._kv.pop((ns, key), None) is not None

    def kv_list(self, ns, prefix=None):
        with self._lock:
            now = self._clock()
            out = []
            for (n, k), (_, exp) in self._kv.items():
                if n != ns or (exp is not None and exp <= now):
                    continue
                if prefix is None or k.startswith(prefix):
                    out.append(k)
            return sorted(out)

    # Log
    def log_append(self, ns, key, value):
        with self._lock:
            seq = self._next_seq()
            self._log.setdefault((ns, key), []).append((seq, bytes(value)))
            return seq

    def log_list(self, ns, key):
        with self._lock:
            return list(self._log.get((ns, key), []))

    def log_since(self, ns, key, since_seq):
        with self._lock:
            return [e for e in self._log.get((ns, key), []) if e[0] > since_seq]

    def log_latest(self, ns, key):
        with self._lock:
            entries = self._log.get((ns, key))
            return entries[-1] if entries else None

    # Slot
    def slot_upsert(self, ns, key, state):
        with self._lock:
            prev = self._slot.get((ns, key))
            version = 1 if prev is None else prev[0] + 1
            self._slot[(ns, key)] = (version, bytes(state))
            return version

    def slot_get(self, ns, key):
        with self._lock:
            return self._slot.get((ns, key))

    def slot_cas(self, ns, key, expected_version, state):
        with self._lock:
            prev = self._slot.get((ns, key))
            if prev is None or prev[0] != expected_version:
                return False
            self._slot[(ns, key)] = (prev[0] + 1, bytes(state))
            return True

    def slot_delete(self, ns, key):
        with self._lock:
            return self._slot.pop((ns, key), None) is not None

    # Queue
    def queue_push(self, ns, key, value):
        with self._lock:
            qid = self._next_seq()
            self._queue.setdefault((ns, key), []).append((qid, bytes(value)))
            return qid

    def queue_peek(self, ns, key, limit):
        with self._lock:
            return list(self._queue.get((ns, key), [])[:limit])

    def queue_ack(self, ns, key, up_to_id):
        with self._lock:
            q = self._queue.get((ns, key), [])
            keep = [e for e in q if e[0] > up_to_id]
            dropped = len(q) - len(keep)
            self._queue[(ns, key)] = keep
            return dropped

    def queue_len(self, ns, key):
        with self._lock:
            return len(self._queue.get((ns, key), []))

    def queue_drop_oldest(self, ns, key, count):
        with self._lock:
            q = self._queue.get((ns, key), [])
            dropped = min(count, len(q))
            self._queue[(ns, key)] = q[dropped:]
            return dropped


_STORAGE_DDL = """
CREATE TABLE IF NOT EXISTS df_kv (
    ns          TEXT    NOT NULL,
    key         TEXT    NOT NULL,
    val         BLOB    NOT NULL,
    updated_at  INTEGER NOT NULL,
    expires_at  INTEGER,
    PRIMARY KEY (ns, key)
);
CREATE INDEX IF NOT EXISTS df_kv_expires ON df_kv(expires_at)
    WHERE expires_at IS NOT NULL;

CREATE TABLE IF NOT EXISTS df_log (
    seq  INTEGER PRIMARY KEY AUTOINCREMENT,
    ns   TEXT    NOT NULL,
    key  TEXT    NOT NULL,
    val  BLOB    NOT NULL,
    ts   INTEGER NOT NULL
);
CREATE INDEX IF NOT EXISTS df_log_ns_key_seq ON df_log(ns, key, seq);

CREATE TABLE IF NOT EXISTS df_slot (
    ns          TEXT    NOT NULL,
    key         TEXT    NOT NULL,
    version     INTEGER NOT NULL DEFAULT 1,
    state       BLOB    NOT NULL,
    updated_at  INTEGER NOT NULL,
    PRIMARY KEY (ns, key)
);

CREATE TABLE IF NOT EXISTS df_queue (
    id   INTEGER PRIMARY KEY AUTOINCREMENT,
    ns   TEXT    NOT NULL,
    key  TEXT    NOT NULL,
    val  BLOB    NOT NULL,
    ts   INTEGER NOT NULL
);
CREATE INDEX IF NOT EXISTS df_queue_ns_key_id ON df_queue(ns, key, id);
"""


class SqliteStorageBackend(StorageBackend):
    """Single-node production backend (reference sqlite.rs:40-470):
    identical table layout, WAL journal, AUTOINCREMENT global
    sequences, lazy TTL expiry on read plus an explicit sweep."""

    def __init__(
        self, path: str = ":memory:", clock: Callable[[], float] = time.time
    ) -> None:
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._clock = clock
        self._lock = threading.Lock()
        with self._lock:
            cur = self._conn.cursor()
            cur.execute("PRAGMA journal_mode=WAL")
            cur.execute("PRAGMA synchronous=NORMAL")
            cur.execute("PRAGMA busy_timeout=5000")
            self._conn.executescript(_STORAGE_DDL)
            self._conn.commit()

    def _now(self) -> int:
        return int(self._clock())

    def sweep_expired(self) -> int:
        """Periodic TTL sweep (reference sqlite.rs:110-118)."""
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM df_kv WHERE expires_at IS NOT NULL AND expires_at < ?",
                (self._now(),),
            )
            self._conn.commit()
            return cur.rowcount

    # KV
    def kv_get(self, ns, key):
        with self._lock:
            row = self._conn.execute(
                "SELECT val, expires_at FROM df_kv WHERE ns=? AND key=?", (ns, key)
            ).fetchone()
            if row is None:
                return None
            val, expires_at = row
            if expires_at is not None and expires_at <= self._now():
                self._conn.execute(
                    "DELETE FROM df_kv WHERE ns=? AND key=?", (ns, key)
                )
                self._conn.commit()
                return None
            return bytes(val)

    def _kv_upsert(self, ns, key, value, expires_at):
        self._conn.execute(
            "INSERT INTO df_kv(ns, key, val, updated_at, expires_at) "
            "VALUES (?, ?, ?, ?, ?) "
            "ON CONFLICT(ns, key) DO UPDATE SET "
            "val=excluded.val, updated_at=excluded.updated_at, "
            "expires_at=excluded.expires_at",
            (ns, key, sqlite3.Binary(bytes(value)), self._now(), expires_at),
        )
        self._conn.commit()

    def kv_put(self, ns, key, value):
        # plain put clears any TTL (reference sqlite.rs:176-179)
        with self._lock:
            self._kv_upsert(ns, key, value, None)

    def kv_put_with_ttl(self, ns, key, value, ttl_secs):
        with self._lock:
            self._kv_upsert(ns, key, value, self._now() + int(ttl_secs))

    def kv_delete(self, ns, key):
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM df_kv WHERE ns=? AND key=?", (ns, key)
            )
            self._conn.commit()
            return cur.rowcount > 0

    def kv_list(self, ns, prefix=None):
        now = self._now()
        esc = None
        if prefix is not None:
            esc = (
                prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
                + "%"
            )
        with self._lock:
            if esc is not None:
                rows = self._conn.execute(
                    "SELECT key FROM df_kv WHERE ns=? AND key LIKE ? ESCAPE '\\' "
                    "AND (expires_at IS NULL OR expires_at > ?) ORDER BY key",
                    (ns, esc, now),
                ).fetchall()
            else:
                rows = self._conn.execute(
                    "SELECT key FROM df_kv WHERE ns=? "
                    "AND (expires_at IS NULL OR expires_at > ?) ORDER BY key",
                    (ns, now),
                ).fetchall()
        return [r[0] for r in rows]

    # Log
    def log_append(self, ns, key, value):
        with self._lock:
            cur = self._conn.execute(
                "INSERT INTO df_log(ns, key, val, ts) VALUES (?, ?, ?, ?)",
                (ns, key, sqlite3.Binary(bytes(value)), self._now()),
            )
            self._conn.commit()
            return int(cur.lastrowid)

    def log_list(self, ns, key):
        with self._lock:
            rows = self._conn.execute(
                "SELECT seq, val FROM df_log WHERE ns=? AND key=? ORDER BY seq",
                (ns, key),
            ).fetchall()
        return [(int(s), bytes(v)) for s, v in rows]

    def log_since(self, ns, key, since_seq):
        with self._lock:
            rows = self._conn.execute(
                "SELECT seq, val FROM df_log WHERE ns=? AND key=? AND seq>? "
                "ORDER BY seq",
                (ns, key, since_seq),
            ).fetchall()
        return [(int(s), bytes(v)) for s, v in rows]

    def log_latest(self, ns, key):
        with self._lock:
            row = self._conn.execute(
                "SELECT seq, val FROM df_log WHERE ns=? AND key=? "
                "ORDER BY seq DESC LIMIT 1",
                (ns, key),
            ).fetchone()
        return None if row is None else (int(row[0]), bytes(row[1]))

    # Slot
    def slot_upsert(self, ns, key, state):
        with self._lock:
            self._conn.execute(
                "INSERT INTO df_slot(ns, key, version, state, updated_at) "
                "VALUES (?, ?, 1, ?, ?) "
                "ON CONFLICT(ns, key) DO UPDATE SET "
                "version=df_slot.version+1, state=excluded.state, "
                "updated_at=excluded.updated_at",
                (ns, key, sqlite3.Binary(bytes(state)), self._now()),
            )
            row = self._conn.execute(
                "SELECT version FROM df_slot WHERE ns=? AND key=?", (ns, key)
            ).fetchone()
            self._conn.commit()
            return int(row[0])

    def slot_get(self, ns, key):
        with self._lock:
            row = self._conn.execute(
                "SELECT version, state FROM df_slot WHERE ns=? AND key=?",
                (ns, key),
            ).fetchone()
        return None if row is None else (int(row[0]), bytes(row[1]))

    def slot_cas(self, ns, key, expected_version, state):
        with self._lock:
            cur = self._conn.execute(
                "UPDATE df_slot SET state=?, version=version+1, updated_at=? "
                "WHERE ns=? AND key=? AND version=?",
                (sqlite3.Binary(bytes(state)), self._now(), ns, key, expected_version),
            )
            self._conn.commit()
            return cur.rowcount > 0

    def slot_delete(self, ns, key):
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM df_slot WHERE ns=? AND key=?", (ns, key)
            )
            self._conn.commit()
            return cur.rowcount > 0

    # Queue
    def queue_push(self, ns, key, value):
        with self._lock:
            cur = self._conn.execute(
                "INSERT INTO df_queue(ns, key, val, ts) VALUES (?, ?, ?, ?)",
                (ns, key, sqlite3.Binary(bytes(value)), self._now()),
            )
            self._conn.commit()
            return int(cur.lastrowid)

    def queue_peek(self, ns, key, limit):
        with self._lock:
            rows = self._conn.execute(
                "SELECT id, val FROM df_queue WHERE ns=? AND key=? "
                "ORDER BY id LIMIT ?",
                (ns, key, limit),
            ).fetchall()
        return [(int(i), bytes(v)) for i, v in rows]

    def queue_ack(self, ns, key, up_to_id):
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM df_queue WHERE ns=? AND key=? AND id<=?",
                (ns, key, up_to_id),
            )
            self._conn.commit()
            return cur.rowcount

    def queue_len(self, ns, key):
        with self._lock:
            row = self._conn.execute(
                "SELECT COUNT(*) FROM df_queue WHERE ns=? AND key=?", (ns, key)
            ).fetchone()
        return int(row[0])

    def queue_drop_oldest(self, ns, key, count):
        with self._lock:
            cur = self._conn.execute(
                "DELETE FROM df_queue WHERE id IN ("
                "  SELECT id FROM df_queue WHERE ns=? AND key=? "
                "  ORDER BY id LIMIT ?)",
                (ns, key, count),
            )
            self._conn.commit()
            return cur.rowcount


class BackendCheckpointStore(CheckpointStore):
    """CheckpointStore over the KV primitive, "checkpoints" namespace
    (reference adapters/checkpoint.rs). Versioning stays at the schema
    log level, so ``supports_versioning`` is False."""

    NS = "checkpoints"

    def __init__(self, backend: StorageBackend) -> None:
        self.backend = backend

    def get_raw(self, source_id):
        return self.backend.kv_get(self.NS, source_id)

    def put_raw(self, source_id, data):
        self.backend.kv_put(self.NS, source_id, data)

    def delete(self, source_id):
        return self.backend.kv_delete(self.NS, source_id)

    def list(self):
        return self.backend.kv_list(self.NS)

    def list_with_prefix(self, prefix):
        return self.backend.kv_list(self.NS, prefix)
