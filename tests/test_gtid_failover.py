"""GTID set algebra, binlog position bookkeeping, failover identity,
checkpoint reachability, schema reconciliation — mirrors
mysql_event.rs:447-523, mysql_health.rs:359-424, failover/identity.rs,
failover/reconciler.rs:159-262."""

import pytest

from deltaforge_spark.sources.gtid import (
    BinlogPosition,
    ColumnSnapshot,
    GtidSet,
    IdentityStore,
    ServerIdentity,
    check_position_reachability,
    failover_decision,
    merge_gtid,
    reconcile_table,
)

U1 = "3E11FA47-71CA-11E1-9E33-C80AA9429562"
U2 = "9A511FA4-82CA-11E1-9E33-C80AA9429111"


# --------------------------------------------------------------- merge_gtid


def test_merge_extends_existing_range():
    assert merge_gtid(f"{U1}:1-20", f"{U1}:21") == f"{U1}:1-21"


def test_merge_single_becomes_range():
    assert merge_gtid(f"{U1}:1", f"{U1}:2") == f"{U1}:1-2"


def test_merge_new_uuid_appends_entry():
    assert merge_gtid(f"{U1}:1-20", f"{U2}:5") == f"{U1}:1-20,{U2}:5"


def test_merge_multi_source_updates_matching_entry():
    got = merge_gtid(f"{U1}:1-20,{U2}:1-9", f"{U2}:10")
    assert got == f"{U1}:1-20,{U2}:1-10"


def test_merge_malformed_gtid_appended_verbatim():
    assert merge_gtid(f"{U1}:1-20", "garbage") == f"{U1}:1-20,garbage"


# ----------------------------------------------------------------- GtidSet


def test_gtid_set_parse_and_subset():
    saved = GtidSet.parse(f"{U1}:1-20")
    executed = GtidSet.parse(f"{U1}:1-100,{U2}:1-5")
    assert saved.is_subset_of(executed)
    assert not executed.is_subset_of(saved)


def test_gtid_set_multi_interval():
    s = GtidSet.parse(f"{U1}:1-5:8-10")
    assert s.contains(U1, 4) and s.contains(U1, 9)
    assert not s.contains(U1, 6)
    # subset across a hole: 1-10 is NOT covered by 1-5:8-10
    assert not GtidSet.parse(f"{U1}:1-10").is_subset_of(s)
    assert s.is_subset_of(GtidSet.parse(f"{U1}:1-10"))


def test_gtid_set_normalizes_adjacent_intervals():
    s = GtidSet.parse(f"{U1}:1-5")
    s.add(U1, 6)
    assert str(s) == f"{U1}:1-6"


# ----------------------------------------------------------- BinlogPosition


def test_position_bookkeeping_gtid_rotate_xid():
    pos = BinlogPosition()
    pos.handle_rotate("binlog.000007", 4)
    pos.handle_gtid(f"{U1}:1")
    assert pos.in_transaction
    assert pos.handle_xid() is True
    assert not pos.in_transaction
    pos.handle_gtid(f"{U1}:2")
    pos.handle_xid()
    assert pos.gtid_set == f"{U1}:1-2"
    assert (pos.file, pos.pos) == ("binlog.000007", 4)
    back = BinlogPosition.from_json(pos.to_json())
    assert back.gtid_set == pos.gtid_set and back.file == pos.file


# ------------------------------------------------------------- reachability


def test_reachability_gtid_subset_path():
    saved = BinlogPosition(gtid_set=f"{U1}:1-20")
    st, _ = check_position_reachability(saved, executed_gtid=f"{U1}:1-100")
    assert st == "reachable"
    st, reason = check_position_reachability(saved, executed_gtid=f"{U1}:1-10")
    assert st == "lost" and "not a subset" in reason


def test_reachability_file_fallback():
    saved = BinlogPosition(file="binlog.000003", pos=120)
    st, _ = check_position_reachability(
        saved, available_files=["binlog.000003", "binlog.000004"]
    )
    assert st == "reachable"
    st, reason = check_position_reachability(
        saved, available_files=["binlog.000005"]
    )
    assert st == "lost" and "purged" in reason


def test_reachability_unknown_without_evidence():
    assert check_position_reachability(BinlogPosition())[0] == "unknown"


# ----------------------------------------------------------------- identity


def test_identity_first_seen_same_changed(tmp_path):
    store = IdentityStore(str(tmp_path / "identity.json"))
    a = ServerIdentity("mysql", "uuid-a", "1")
    b = ServerIdentity("mysql", "uuid-b", "2")
    assert store.compare("src1", a) == ("first_seen", None)
    store.persist("src1", a)
    assert store.compare("src1", a) == ("same", a)
    cmp, prev = store.compare("src1", b)
    assert cmp == "changed" and prev == a
    # compare never writes: stored identity is still a
    assert store.compare("src1", a)[0] == "same"


# ----------------------------------------------------------- reconciliation


def _cols(*specs):
    return [ColumnSnapshot(*s) for s in specs]


def test_reconcile_pk_change_requires_stop():
    stored = _cols(("id", "bigint", False, True), ("v", "text", True, False))
    live = _cols(("id", "bigint", False, False), ("v", "text", True, True))
    deltas, stop = reconcile_table(stored, live)
    assert stop is not None and "primary key changed" in stop


def test_reconcile_column_deltas():
    stored = _cols(("id", "bigint", False, True), ("old", "text"), ("t", "int"))
    live = _cols(("id", "bigint", False, True), ("t", "bigint"), ("fresh", "text"))
    deltas, stop = reconcile_table(stored, live)
    assert stop is None
    kinds = {(d["type"], d.get("name")) for d in deltas}
    assert kinds == {
        ("column_dropped", "old"),
        ("column_type_changed", "t"),
        ("column_added", "fresh"),
    }


def test_reconcile_table_dropped_and_no_stored():
    assert reconcile_table(None, None) == ([], None)
    deltas, stop = reconcile_table(_cols(("id", "int")), None)
    assert deltas == [{"type": "table_dropped"}] and stop is None


# -------------------------------------------------------- decision matrix


def test_failover_decision_matrix():
    assert failover_decision("same", "reachable") == "resume"
    assert failover_decision("first_seen", "unknown") == "resume"
    assert failover_decision("changed", "reachable", policy="halt") == "halt"
    assert failover_decision("changed", "lost", policy="adapt") == "resnapshot"
    assert failover_decision("same", "lost", policy="halt") == "halt"
    assert failover_decision("same", "lost", policy="adapt") == "resnapshot"
