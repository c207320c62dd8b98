"""GTID-set tracking, binlog position bookkeeping, failover identity +
checkpoint reachability, and schema reconciliation.

Re-expresses the reference's source-position layer (reference:
crates/sources/src/mysql/mysql_event.rs:447-523 — ``handle_gtid``
accumulates the full executed GTID set via ``merge_gtid`` range
extension (MySQL needs the whole set to resume, not just the last
transaction); ``handle_rotate`` tracks the current binlog file/pos;
``handle_xid`` marks transaction commit boundaries;
crates/sources/src/failover/identity.rs — server-identity persistence
with FirstSeen/Same/Changed comparison; mysql_health.rs:359-424 —
checkpoint reachability: GTID_SUBSET(saved, executed) first, binlog
file presence fallback; failover/reconciler.rs:159-262 — per-table
schema diff with PK-change → RequiresStop, else
added/dropped/type-changed deltas under the ``adapt`` policy).

Spark mapping: the wire decoding lives behind the Kafka/Debezium front
(SURVEY §7.2), but the *position algebra* is engine-agnostic control
plane and belongs here — the streaming checkpoint stores a
``BinlogPosition`` per source, restart validates it against live server
state (supplied by the caller's transport, same injection pattern as
the sinks), and the ``adapt|halt`` policy decides whether a failed
validation halts the pipeline or re-snapshots.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


# ------------------------------------------------------------- GTID algebra


def merge_gtid(existing: str, new_gtid: str) -> str:
    """Merge a single GTID (``uuid:N``) into an executed set
    (``uuid:1-20`` or multi-source ``u1:1-20,u2:1-9``) by extending the
    matching UUID's range end — byte-for-byte the reference's
    merge_gtid (mysql_event.rs:463-508)."""
    n_colon = new_gtid.rfind(":")
    if n_colon < 0:
        return f"{existing},{new_gtid}"
    n_uuid = new_gtid[:n_colon]
    try:
        n_seq = int(new_gtid[n_colon + 1 :])
    except ValueError:
        return f"{existing},{new_gtid}"
    if n_seq <= 0:
        return f"{existing},{new_gtid}"

    entries = existing.split(",")
    for i, entry in enumerate(entries):
        colon = entry.find(":")
        if colon >= 0 and entry[:colon] == n_uuid:
            rng = entry[colon + 1 :]
            dash = rng.find("-")
            try:
                start = int(rng[:dash]) if dash >= 0 else int(rng)
            except ValueError:
                start = 1
            entries[i] = f"{n_uuid}:{start}-{n_seq}"
            break
    else:
        entries.append(f"{n_uuid}:{n_seq}")
    return ",".join(entries)


class GtidSet:
    """Parsed executed-GTID set with interval algebra — the engine-side
    equivalent of MySQL's GTID_SUBSET, used for checkpoint
    reachability when no live server can answer (mysql_health.rs:382).

    Accepts full MySQL syntax: ``uuid:1-5:8-10,uuid2:3``.
    """

    def __init__(self, intervals: dict[str, list[tuple[int, int]]] | None = None):
        self.intervals = intervals or {}

    @classmethod
    def parse(cls, s: str | None) -> "GtidSet":
        out: dict[str, list[tuple[int, int]]] = {}
        if not s:
            return cls(out)
        for entry in s.replace("\n", "").split(","):
            entry = entry.strip()
            if not entry:
                continue
            parts = entry.split(":")
            uuid, ranges = parts[0], parts[1:]
            ivs = out.setdefault(uuid, [])
            for r in ranges:
                if "-" in r:
                    a, b = r.split("-", 1)
                    ivs.append((int(a), int(b)))
                else:
                    ivs.append((int(r), int(r)))
            out[uuid] = _normalize(ivs)
        return cls(out)

    def contains(self, uuid: str, seq: int) -> bool:
        return any(a <= seq <= b for a, b in self.intervals.get(uuid, []))

    def is_subset_of(self, other: "GtidSet") -> bool:
        """GTID_SUBSET(self, other): every transaction in self is in
        other — Reachable iff the saved set is a subset of the new
        primary's @@gtid_executed."""
        for uuid, ivs in self.intervals.items():
            theirs = other.intervals.get(uuid, [])
            for a, b in ivs:
                pos = a
                for ta, tb in theirs:
                    if ta <= pos <= tb:
                        pos = tb + 1
                        if pos > b:
                            break
                if pos <= b:
                    return False
        return True

    def add(self, uuid: str, seq: int) -> None:
        ivs = self.intervals.setdefault(uuid, [])
        ivs.append((seq, seq))
        self.intervals[uuid] = _normalize(ivs)

    def __str__(self) -> str:
        parts = []
        for uuid in sorted(self.intervals):
            rs = ":".join(
                f"{a}-{b}" if a != b else str(a) for a, b in self.intervals[uuid]
            )
            parts.append(f"{uuid}:{rs}")
        return ",".join(parts)


def _normalize(ivs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    ivs = sorted(ivs)
    out: list[tuple[int, int]] = []
    for a, b in ivs:
        if out and a <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


# --------------------------------------------------- position bookkeeping


@dataclass
class BinlogPosition:
    """The RunCtx position fields (mysql_event.rs RunCtx): current
    binlog file/pos from rotate events, accumulated GTID set, and the
    open-transaction flag XID events close."""

    file: str = ""
    pos: int = 0
    gtid_set: str = ""
    in_transaction: bool = False

    def handle_gtid(self, gtid: str) -> None:
        self.gtid_set = merge_gtid(self.gtid_set, gtid) if self.gtid_set else gtid
        self.in_transaction = True

    def handle_rotate(self, file: str, pos: int) -> None:
        self.file, self.pos = file, pos

    def handle_xid(self) -> bool:
        """Transaction commit boundary; returns the tx_end marker."""
        self.in_transaction = False
        return True

    def to_json(self) -> str:
        return json.dumps(
            {"file": self.file, "pos": self.pos, "gtid_set": self.gtid_set}
        )

    @classmethod
    def from_json(cls, s: str) -> "BinlogPosition":
        d = json.loads(s)
        return cls(file=d.get("file", ""), pos=int(d.get("pos", 0)), gtid_set=d.get("gtid_set", ""))


# ------------------------------------------------------------ reachability


def check_position_reachability(
    saved: BinlogPosition,
    *,
    executed_gtid: str | None = None,
    available_files: list[str] | None = None,
) -> tuple[str, str]:
    """(status, reason): Reachable | Lost | Unknown — the pure decision
    core of mysql_health.rs:364-424 over caller-supplied server state
    (the SQL round-trips are the transport's job). GTID path first:
    saved set ⊆ executed set; binlog-file presence fallback."""
    if saved.gtid_set and executed_gtid is not None:
        if GtidSet.parse(saved.gtid_set).is_subset_of(GtidSet.parse(executed_gtid)):
            return "reachable", ""
        return (
            "lost",
            f"GTID set '{saved.gtid_set}' is not a subset of the new "
            "primary's executed set — some transactions are absent",
        )
    if saved.file and available_files is not None:
        if saved.file in available_files:
            return "reachable", ""
        return "lost", f"binlog file '{saved.file}' purged on the server"
    return "unknown", "no GTID or binlog-file evidence available"


# -------------------------------------------------------- server identity


@dataclass(frozen=True)
class ServerIdentity:
    """Unified identity (identity.rs ServerIdentity): MySQL =
    (server_uuid, server_id); PG = (system_identifier, timeline)."""

    kind: str  # mysql | postgres
    primary_id: str  # server_uuid / system_identifier
    secondary_id: str = ""  # server_id / timeline


class IdentityStore:
    """File-KV identity persistence (identity.rs IdentityStore over the
    StorageBackend): compare() never writes — the caller persists after
    successful reconciliation, not before."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def compare(self, source_id: str, live: ServerIdentity) -> tuple[str, ServerIdentity | None]:
        """→ ("first_seen", None) | ("same", prev) | ("changed", prev)."""
        stored = self._load().get(source_id)
        if stored is None:
            return "first_seen", None
        prev = ServerIdentity(**stored)
        return ("same" if prev == live else "changed"), prev

    def persist(self, source_id: str, identity: ServerIdentity) -> None:
        state = self._load()
        state[source_id] = {
            "kind": identity.kind,
            "primary_id": identity.primary_id,
            "secondary_id": identity.secondary_id,
        }
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)


# ---------------------------------------------------------- reconciliation


@dataclass(frozen=True)
class ColumnSnapshot:
    name: str
    data_type: str
    is_nullable: bool = True
    is_primary_key: bool = False


def reconcile_table(
    stored: list[ColumnSnapshot] | None,
    live: list[ColumnSnapshot] | None,
) -> tuple[list[dict], str | None]:
    """Diff stored vs live columns for one table
    (reconciler.rs:159-224): → (deltas, stop_reason). PK change →
    RequiresStop (no delta list); table dropped → [table_dropped];
    otherwise column added/dropped/type-changed deltas (reconcilable
    under the ``adapt`` policy)."""
    if stored is None:
        return [], None
    if live is None:
        return [{"type": "table_dropped"}], None

    stored_pk = [c.name for c in stored if c.is_primary_key]
    live_pk = [c.name for c in live if c.is_primary_key]
    if stored_pk != live_pk:
        return [], (
            f"primary key changed: was [{', '.join(stored_pk)}], "
            f"now [{', '.join(live_pk)}]"
        )

    deltas: list[dict] = []
    live_by_name = {c.name: c for c in live}
    for sc in stored:
        lc = live_by_name.get(sc.name)
        if lc is None:
            deltas.append({"type": "column_dropped", "name": sc.name})
        elif lc.data_type != sc.data_type:
            deltas.append(
                {
                    "type": "column_type_changed",
                    "name": sc.name,
                    "old_type": sc.data_type,
                    "new_type": lc.data_type,
                }
            )
    stored_names = {c.name for c in stored}
    for lc in live:
        if lc.name not in stored_names:
            deltas.append({"type": "column_added", "name": lc.name, "data_type": lc.data_type})
    return deltas, None


def failover_decision(
    identity_cmp: str,
    reachability: str,
    *,
    policy: str = "halt",
) -> str:
    """The post-reconnect decision matrix (mysql/mod.rs:599-763):
    same identity + reachable → resume; changed identity or lost
    position → ``halt`` (operator intervention) or ``adapt``
    (reconcile schemas + re-snapshot from the new primary's tail)."""
    assert policy in ("halt", "adapt")
    if identity_cmp in ("same", "first_seen") and reachability == "reachable":
        return "resume"
    if identity_cmp == "first_seen" and reachability == "unknown":
        return "resume"  # clean first start: nothing to validate
    return "resnapshot" if policy == "adapt" else "halt"


# --------------------------------------------- distributed interval merge


def gtid_ranges_df(df, *, uuid_col: str = "server_uuid", txid_col: str = "txid"):
    """Distributed twin of ``merge_gtid``/``GtidSet``: collapse observed
    (server_uuid, transaction_id) pairs into the canonical MySQL GTID
    interval notation (``1-5:7:9-11``) per server — the executed-set a
    resuming reader needs (mysql_event.rs:463-508).

    Scale shape: the driver-side ``GtidSet`` accumulates sequentially in
    one reader; at fleet scale (many partitioned binlog readers, or
    offset reconciliation across a checkpoint store) the merge is a
    gaps-and-islands aggregation — one shuffle on server_uuid, partial
    aggregation map-side via the distinct, intervals built with window
    algebra, never collecting sequence lists to the driver.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(uuid_col).orderBy(txid_col)
    islands = (
        df.select(uuid_col, txid_col)
        .distinct()
        .withColumn("_grp", F.col(txid_col) - F.row_number().over(w))
    )
    ranges = islands.groupBy(uuid_col, "_grp").agg(
        F.min(txid_col).alias("lo"), F.max(txid_col).alias("hi")
    )
    interval = F.when(
        F.col("lo") == F.col("hi"), F.col("lo").cast("string")
    ).otherwise(F.concat_ws("-", F.col("lo").cast("string"), F.col("hi").cast("string")))
    return (
        ranges.select(F.col(uuid_col), F.struct("lo", interval.alias("s")).alias("_iv"))
        .groupBy(uuid_col)
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("_iv")), lambda x: x["s"]), ":"
            ).alias("gtid_set"),
            F.count("*").alias("n_intervals"),
        )
    )
