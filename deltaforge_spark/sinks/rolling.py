"""Rolling lake writer pool: age/idle/bytes/events file rolling for the
streaming lake path.

Re-expresses the reference's S3 writer pool (reference:
crates/sinks/src/s3/rolling.rs:17-69 thresholds + trigger precedence,
writer_pool.rs append→sweep lifecycle, sink.rs:41-160 atomic
visibility). ``write_lake`` (files.py) covers the batch path natively
(partitionBy + maxRecordsPerFile); what Spark's file sinks lack is the
*time*-based rolling a long-running stream needs — a low-volume
partition would otherwise accumulate one straggler micro-batch file per
trigger forever. This pool closes that gap:

- Each ``process_batch`` call (a ``foreachBatch`` body) appends the
  batch's rows to per-partition STAGED files — one Spark write job per
  batch, partitioned by the routing columns, never a per-partition
  driver loop.
- A sweep then rolls any partition that crossed a threshold — any of
  ``max_bytes`` / ``max_events`` / ``max_age`` (since first event) /
  ``idle_age`` (since last event), same precedence order as the
  reference (rolling.rs:45-69) — by compacting its staged pieces into
  ONE data file made visible atomically (written to a temp dir, then
  renamed into place; readers never observe a partial file, the
  sink.rs:41-160 multipart-visibility contract).
- ``close()`` flushes every open partition with reason ``final`` (the
  shutdown flush; the reference rolls remaining writers on drop).

Clock: ``clock='wall'`` uses wall time (production). ``clock='event'``
drives age/idle from the batch's max event timestamp — the watermark
analog, which makes rolling *deterministic and replayable*: the oracle
query simulates the exact file boundaries in SQL.

State (per-partition opened_at / last_event_at / bytes / events /
staged paths) persists through a ``CheckpointStore`` so a restarted
stream resumes its open files instead of leaking staged data — the
writer-pool half of the reference's checkpoint contract.

Scale shape: staging is one partitionBy write per micro-batch (tasks
write only partitions they hold rows for); the sweep's bookkeeping is
O(active partitions) driver state, same as the reference pool's
HashMap. Compaction re-reads only the rolled partition's staged bytes —
bounded by max_bytes per roll — and is exactly the read the reference
avoids by buffering 256 MiB in executor memory; trading a bounded
re-read for not pinning a quarter-GiB per partition per executor is
the right call when one node can hold hundreds of open partitions.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoints import CheckpointStore, MemCheckpointStore

ROLL_BYTES = "bytes"
ROLL_EVENTS = "events"
ROLL_AGE = "age"
ROLL_IDLE = "idle"
ROLL_FINAL = "final"  # shutdown flush (extension; reference rolls on drop)


@dataclass(frozen=True)
class RollingConfig:
    """Thresholds, defaults matching rolling.rs:24-33: ~256 MiB / 1M
    events / 5 min per file, 10 min idle window for low-volume
    partitions."""

    max_bytes: int = 256 * 1024 * 1024
    max_events: int = 1_000_000
    max_age_ms: int = 300_000
    idle_age_ms: int = 600_000


def should_roll(
    cfg: RollingConfig,
    n_bytes: int,
    events: int,
    opened_at_ms: int,
    last_event_at_ms: int,
    now_ms: int,
) -> str | None:
    """Trigger check, same cases and precedence as rolling.rs:45-69:
    an empty writer never rolls; bytes > events > age > idle."""
    if events == 0:
        return None
    if n_bytes >= cfg.max_bytes:
        return ROLL_BYTES
    if events >= cfg.max_events:
        return ROLL_EVENTS
    if max(0, now_ms - opened_at_ms) >= cfg.max_age_ms:
        return ROLL_AGE
    if max(0, now_ms - last_event_at_ms) >= cfg.idle_age_ms:
        return ROLL_IDLE
    return None


class RollingLakeSink:
    """Multi-partition rolling writer pool over a (local or distributed)
    filesystem path. Layout::

        {path}/_staging/batch-<id>/<p>=<v>/...   open, invisible
        {path}/data/<p>=<v>/f<seq>-<ulid>.parquet  rolled, atomic
        {path}/_manifest.jsonl                    one line per roll

    Use as a ``foreachBatch`` body: ``sink.process_batch(df, batch_id)``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_cols: list[str],
        *,
        cfg: RollingConfig | None = None,
        clock: str = "wall",
        ts_col: str | None = None,
        store: CheckpointStore | None = None,
        sink_id: str = "lake",
        object_store=None,
    ) -> None:
        assert clock in ("wall", "event")
        if clock == "event" and not ts_col:
            raise ValueError("clock='event' requires ts_col")
        self.spark = spark
        self.path = path.rstrip("/")
        # object_store: optional backend with ``put_file(local, key)``
        # (e.g. s3client.S3LakeBackend). When set, the roll's
        # rename-into-place maps to multipart-upload→Complete — the
        # SAME atomic-visibility contract on a real object store
        # (reference s3/sink.rs:41-160): parts are invisible until
        # Complete, and the deterministic per-(pkey, seq) key makes a
        # replayed upload overwrite the same object, never add one.
        # Staging/compaction stay on the local path (executor scratch).
        self.object_store = object_store
        self.partition_cols = list(partition_cols)
        self.cfg = cfg or RollingConfig()
        self.clock = clock
        self.ts_col = ts_col
        self.store = store or MemCheckpointStore()
        self._key = f"lake-rolling:{sink_id}"
        self.manifest: list[dict[str, Any]] = []
        # resume: open-partition state and per-partition file sequence
        # numbers survive a restart
        raw = self.store.get_raw(self._key)
        saved = json.loads(raw) if raw else {}
        self._state: dict[str, dict[str, Any]] = saved.get("open", {})
        self._seqs: dict[str, int] = saved.get("seqs", {})
        # replay fence: foreachBatch ids are monotonic; a replayed batch
        # re-stages its (idempotent, overwrite-mode) files but must not
        # double-count arrivals
        self._last_batch: int | None = saved.get("last_batch")
        # orphan sweep: staged pieces whose partition is NOT open in the
        # persisted state were already consumed by a roll that crashed
        # after its commit point (persist) but before cleanup — letting
        # the next roll re-read them would duplicate already-visible
        # rows. Un-fenced batches (crash before any count) also land
        # here; their replay re-stages from scratch, so deleting is safe.
        if raw is not None:
            open_keys = set(self._state)
            depth = "/".join("*" for _ in self.partition_cols)
            for d in sorted(glob.glob(f"{self.path}/_staging/batch-*/{depth}")):
                rel = os.path.relpath(d, f"{self.path}/_staging")
                pkey = rel.split(os.sep, 1)[1]
                if pkey.replace(os.sep, "/") not in open_keys:
                    shutil.rmtree(d, ignore_errors=True)

    # ------------------------------------------------------------ state

    def _persist(self) -> None:
        self.store.put_raw(
            self._key,
            json.dumps(
                {"open": self._state, "seqs": self._seqs, "last_batch": self._last_batch}
            ).encode(),
        )

    @staticmethod
    def _pkey(parts: dict[str, str]) -> str:
        return "/".join(f"{k}={v}" for k, v in sorted(parts.items()))

    def _staged_glob(self, pkey: str) -> list[str]:
        return sorted(glob.glob(f"{self.path}/_staging/batch-*/{pkey}"))

    def _staged_arrivals(self, stage_dir: str) -> list[tuple[dict, int, int | None]]:
        """Per-partition (parts, n_rows, max_event_ts) for one batch,
        read from the staged parquet FOOTERS this batch just wrote —
        exact row counts plus exact int64 column statistics, so the
        values are identical to the groupBy/agg they replace, without a
        second Spark job per batch. Driver-side cost is O(active
        partitions) metadata reads of files the driver-local staging
        already owns (same locality class as ``_dir_bytes`` below).
        Partition values decode from the hive dir names (Spark's URL
        escaping reversed); a null partition value keeps the writer's
        ``__HIVE_DEFAULT_PARTITION__`` key (the dir name itself), so its
        staged pieces glob and roll consistently — no declared query
        routes on a nullable column."""
        from urllib.parse import unquote

        out: list[tuple[dict, int, int | None]] = []
        depth = "/".join("*" for _ in self.partition_cols)
        for d in sorted(glob.glob(f"{stage_dir}/{depth}")):
            rel = os.path.relpath(d, stage_dir)
            parts: dict[str, str] = {}
            for seg in rel.split(os.sep):
                k, _, v = seg.partition("=")
                parts[k] = unquote(v)
            n_rows = 0
            max_ts: int | None = None
            stats_ok = True
            files = sorted(glob.glob(f"{d}/*.parquet"))
            import pyarrow.parquet as pq

            for f in files:
                md = pq.read_metadata(f)
                n_rows += md.num_rows
                if self.clock == "event":
                    try:
                        idx = list(md.schema.names).index(self.ts_col)
                    except ValueError:
                        stats_ok = False
                        continue
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            stats_ok = False
                            break
                        mx = int(st.max)
                        max_ts = mx if max_ts is None else max(max_ts, mx)
            if self.clock == "event" and n_rows and (not stats_ok or max_ts is None):
                # defensive fallback (a writer configured without column
                # statistics): one bounded agg over this partition's
                # staged pieces only
                row = (
                    self.spark.read.parquet(d)
                    .agg(F.max(F.col(self.ts_col)).alias("_max_ts"))
                    .collect()[0]
                )
                max_ts = int(row["_max_ts"])
            if n_rows:
                out.append((parts, n_rows, max_ts))
        return out

    # ------------------------------------------------------------ batch

    def process_batch(self, df: DataFrame, batch_id: int, now_ms: int | None = None) -> None:
        """Append the batch to staged per-partition files, then sweep.
        Replay-safe: a re-delivered batch id overwrites its own staged
        files (idempotent) without re-counting arrivals, and a roll
        that fails mid-compaction leaves state untouched so the
        micro-batch retry re-attempts the same roll."""
        stage_dir = f"{self.path}/_staging/batch-{batch_id}"
        replay = self._last_batch is not None and batch_id <= self._last_batch
        # On replay, surviving staged dirs are exactly the not-yet-rolled
        # partitions; re-creating a batch dir a completed roll already
        # consumed would re-introduce (duplicate) its rows at the next
        # roll. Overwriting a dir that still exists is harmless (same
        # deterministic batch).
        if not (replay and os.path.isdir(stage_dir)):
            # repartition by the routing columns before the partitioned
            # write (r13 optimization, guide §6 small-files): without it
            # every scan task writes a piece of every partition —
            # tasks x partitions tiny staged files per batch, all
            # re-listed and re-read by every later compaction. One
            # shuffle of the batch buys one staged file per partition
            # per batch (the same per-partition writer layout the
            # reference pool keeps in memory).
            (
                df.repartition(*[F.col(c) for c in self.partition_cols])
                .write.mode("overwrite")
                .partitionBy(*self.partition_cols)
                .parquet(stage_dir)
            )

        # per-partition arrival accounting: O(active partitions) values
        # to the driver — the same control-plane state the reference
        # pool keeps in its HashMap. Counted AT MOST ONCE per batch id:
        # the fence advances in memory immediately, so a sweep failure +
        # foreachBatch retry re-attempts the roll without re-counting.
        # r13 optimization (guide §1.2 — don't recompute): counts and
        # the per-partition max event-ts come from the staged parquet
        # FOOTERS (exact int64 row counts + column statistics of the
        # files just written from this very batch), not from a second
        # Spark aggregation job over the batch — one job per batch
        # instead of two, identical values by construction.
        arrivals = [] if replay else self._staged_arrivals(stage_dir)
        self._last_batch = batch_id if self._last_batch is None else max(
            self._last_batch, batch_id
        )

        if now_ms is None:
            if self.clock == "event":
                now_ms = max((int(ts) for _, _, ts in arrivals if ts is not None), default=0)
                for st in self._state.values():
                    now_ms = max(now_ms, st["last_event_at"])
            else:
                now_ms = int(time.time() * 1000)

        for parts, n_rows, max_ts in arrivals:
            pkey = self._pkey(parts)
            ts = int(max_ts) if self.clock == "event" else now_ms
            st = self._state.get(pkey)
            if st is None:
                # a fresh writer opens at the first event after the
                # previous roll; the file sequence continues
                st = {
                    "parts": parts,
                    "opened_at": ts,
                    "last_event_at": ts,
                    "events": 0,
                    "bytes": 0,
                }
                self._state[pkey] = st
            st["events"] += int(n_rows)
            st["last_event_at"] = max(st["last_event_at"], ts)
            st["bytes"] += _dir_bytes(f"{stage_dir}/{pkey}")

        # sweep: writer_pool.rs steps 3-4 — roll every partition that
        # crossed a threshold, including idle partitions this batch
        # brought no rows for
        targets = []
        for pkey in list(self._state):
            st = self._state[pkey]
            reason = should_roll(
                self.cfg, st["bytes"], st["events"], st["opened_at"], st["last_event_at"], now_ms
            )
            if reason:
                targets.append((pkey, reason))
        self._roll_many(targets, batch_id)
        self._persist()

    def close(self) -> None:
        """Shutdown flush: every open partition rolls with ``final``."""
        self._roll_many(
            [
                (pkey, ROLL_FINAL)
                for pkey in list(self._state)
                if self._state[pkey]["events"] > 0
            ],
            batch_id=-1,
        )
        self._persist()

    def _roll_many(self, targets: list[tuple[str, str]], batch_id: int) -> None:
        """Roll several partitions: compactions run CONCURRENTLY (each
        is an independent Spark job over one partition's staged pieces
        — guide §2.6 overlapping independent jobs; a sweep's rolls
        previously serialized driver-side at one job each), commits
        apply sequentially in sweep order, so manifest order, state
        transitions and failure semantics are identical to the
        sequential loop: if a compaction failed, every roll ordered
        before it has committed, the failed one's counters and staged
        files are intact, and the micro-batch retry re-attempts it."""
        if not targets:
            return
        if len(targets) == 1:
            self._roll(*targets[0], batch_id)
            return
        from concurrent.futures import ThreadPoolExecutor

        staged_map = {pkey: self._staged_glob(pkey) for pkey, _ in targets}
        tmp_map = {
            pkey: f"{self.path}/_tmp/{uuid.uuid4().hex}"
            for pkey, _ in targets
            if staged_map[pkey]
        }
        with ThreadPoolExecutor(max_workers=min(8, len(tmp_map) or 1)) as pool:
            futs = [
                (pkey, reason, pool.submit(self._compact, staged_map[pkey], tmp_map[pkey]))
                for pkey, reason in targets
                if staged_map[pkey]
            ]
            err = None
            for pkey, reason, fut in futs:
                if err is None:
                    exc = fut.exception()
                    if exc is not None:
                        err = exc
                        continue
                    self._commit_roll(
                        pkey, reason, batch_id, staged_map[pkey], tmp_map[pkey]
                    )
                else:  # drain: uncommitted compactions are discarded
                    fut.exception()
                    shutil.rmtree(tmp_map[pkey], ignore_errors=True)
        for pkey, _reason in targets:
            if not staged_map[pkey]:
                self._state.pop(pkey, None)
        if err is not None:
            raise err

    # ------------------------------------------------------------- roll

    def _roll(self, pkey: str, reason: str, batch_id: int) -> None:
        staged = self._staged_glob(pkey)
        if not staged:
            self._state.pop(pkey)
            return
        tmp_dir = f"{self.path}/_tmp/{uuid.uuid4().hex}"

        # compact the staged pieces into ONE file: written complete to a
        # temp dir, then renamed into the visible tree — readers never
        # see a partial file (the atomic-visibility contract the
        # reference gets from S3 multipart complete, sink.rs:41-160).
        # State mutates only AFTER the rename: a compaction failure
        # (store outage) raises with counters and staged files intact,
        # so the replayed micro-batch re-attempts the same roll — the
        # reference's at-least-once-at-file-granularity stance
        self._compact(staged, tmp_dir)
        self._commit_roll(pkey, reason, batch_id, staged, tmp_dir)

    def _commit_roll(
        self, pkey: str, reason: str, batch_id: int, staged: list[str], tmp_dir: str
    ) -> None:
        """Publish one compacted roll: rename into place, then the
        commit point (manifest + state persist), then staged cleanup —
        the sequenced second half of the original ``_roll``."""
        seq = self._seqs.get(pkey, 0) + 1
        # DETERMINISTIC name per (pkey, seq): a replayed roll that crashed
        # after the rename re-renames onto the SAME target (os.replace
        # overwrites) — the file cannot appear twice under two names
        import hashlib

        suffix = hashlib.sha1(f"{pkey}:{seq}".encode()).hexdigest()[:12]
        fname = f"f{seq:05d}-{suffix}.parquet"
        final_dir = f"{self.path}/data/{pkey}"
        part = glob.glob(f"{tmp_dir}/part-*.parquet")
        assert len(part) == 1, part
        if self.object_store is not None:
            # object-store publish: multipart-upload→Complete IS the
            # rename (atomic visibility); deterministic key, so a
            # replayed roll overwrites the same object idempotently
            self.object_store.put_file(part[0], f"data/{pkey}/{fname}")
        else:
            os.makedirs(final_dir, exist_ok=True)
            os.replace(part[0], f"{final_dir}/{fname}")
        shutil.rmtree(tmp_dir, ignore_errors=True)

        # the commit point: manifest entry + state (fence, seqs, popped
        # partition) persist IMMEDIATELY after the rename, before staged
        # cleanup — a crash anywhere after this line replays into either
        # a no-op (state says rolled) or an idempotent same-name rename.
        # Persisting only at process_batch end left a window where the
        # file was visible but the replayed batch would re-stage and
        # re-roll it into a second file (ADVICE r4).
        st = self._state.pop(pkey)
        self._seqs[pkey] = seq
        entry = {
            **st["parts"],
            "file_seq": seq,
            "file": f"data/{pkey}/{fname}",
            "n_events": st["events"],
            "n_bytes": st["bytes"],
            "reason": reason,
            "batch_id": batch_id,
        }
        self.manifest.append(entry)
        with open(f"{self.path}/_manifest.jsonl", "a") as f:
            f.write(json.dumps(entry) + "\n")
        self._persist()

        # staged pieces are deleted LAST: if we crash before this, init's
        # orphan sweep (or the idempotent re-roll) disposes of them
        for d in staged:
            shutil.rmtree(d, ignore_errors=True)

    def _compact(self, staged: list[str], tmp_dir: str) -> None:
        """One-file compaction of the staged pieces (seam for outage
        injection in chaos tests).

        Size-adaptive (guide §1.2 per-task work): a roll's staged bytes
        are bounded by the roll thresholds themselves, so most
        compactions are a small-file merge — a single-process stream
        copy, which is how production lake writers compact (the
        reference pool writes each file from ONE writer). Below
        ``DELTAFORGE_COMPACT_LOCAL_MAX_BYTES`` (default 256 MB) the
        merge runs driver-local via pyarrow (no Spark job, no task
        scheduling); above it — or when the staging path is not
        driver-local — it stays a Spark job. Either path produces one
        parquet file with the same rows."""
        limit = int(os.environ.get("DELTAFORGE_COMPACT_LOCAL_MAX_BYTES", 256 << 20))
        total = sum(_dir_bytes(d) for d in staged)
        if 0 < total <= limit and all(os.path.isdir(d) for d in staged):
            try:
                import pyarrow as pa
                import pyarrow.parquet as pq

                tables = []
                for d in staged:
                    for f in sorted(glob.glob(f"{d}/*.parquet")):
                        tables.append(pq.read_table(f))
                merged = pa.concat_tables(tables)
                os.makedirs(tmp_dir, exist_ok=True)
                pq.write_table(merged, f"{tmp_dir}/part-00000.parquet")
                return
            except Exception:
                shutil.rmtree(tmp_dir, ignore_errors=True)  # fall through
        self.spark.read.parquet(*staged).coalesce(1).write.mode("overwrite").parquet(tmp_dir)

    def manifest_df(self, spark: SparkSession) -> DataFrame:
        """The roll manifest as a DataFrame (partition cols + file_seq,
        n_events, reason) — the oracle surface."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in self.partition_cols]
            + [
                T.StructField("file_seq", T.LongType()),
                T.StructField("n_events", T.LongType()),
                T.StructField("reason", T.StringType()),
            ]
        )
        rows = [
            tuple(m[c] for c in self.partition_cols)
            + (m["file_seq"], m["n_events"], m["reason"])
            for m in self.manifest
        ]
        return spark.createDataFrame(rows, schema)


def load_manifest(path: str) -> list[dict[str, Any]]:
    """Read ``_manifest.jsonl`` deduped by target file, last line wins.
    The append in ``_roll`` happens before the state persist, so a crash
    exactly between them replays the roll and appends the SAME entry a
    second time (same deterministic file name, same counters) — dedup by
    ``file`` restores exactly-once at the consumer, which is the
    reference's at-least-once-at-file-granularity contract
    (guarantees.md:205-214)."""
    entries: dict[str, dict[str, Any]] = {}
    try:
        with open(f"{path.rstrip('/')}/_manifest.jsonl") as f:
            for line in f:
                if line.strip():
                    e = json.loads(line)
                    entries[e["file"]] = e
    except FileNotFoundError:
        pass
    return list(entries.values())


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total
