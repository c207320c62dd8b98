"""Incremental binlog tail — the connection-shaped seam (VERDICT r4
Next-round #5): one decode path must yield IDENTICAL events whether the
stream arrives as a whole segment (`parse_segment`) or as arbitrary
byte slices over time (`BinlogTailer.feed`), with a resumable
(file, committed-pos, gtid-set) checkpoint at every XID boundary —
reference mysql/mod.rs:386-423 semantics.
"""

import json

import pytest

import deltaforge_spark.sources.binlog as bl
from deltaforge_spark.sources.gtid import GtidSet


def _segment(rows=((1, "a"), (2, None)), gno=5, xid=900, server_id=11):
    w = bl.SegmentWriter(server_id=server_id)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    w.append(bl.GTID_LOG_EVENT, bl.gtid_payload(bytes(16), gno))
    w.append(bl.QUERY_EVENT, bl.query_payload("db1", "BEGIN"))
    types = [bl.MYSQL_TYPE_LONG, bl.MYSQL_TYPE_VARCHAR]
    metas = [0, 32]
    w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(42, "db1", "t1", types, metas, [False, True]))
    w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(42, 2, [list(r) for r in rows], types, metas))
    w.append(bl.XID_EVENT, bl.xid_payload(xid))
    return w.bytes()


def _strip_volatile(events):
    # identical decode = identical dicts; nothing is volatile, compare raw
    return events


@pytest.mark.parametrize("chunk_size", [1, 3, 7, 23, 64, 10_000])
def test_chunked_feed_equals_whole_segment(chunk_size):
    data = _segment()
    whole = bl.parse_segment(data, {("db1", "t1"): ["id", "name"]})
    t = bl.BinlogTailer({("db1", "t1"): ["id", "name"]})
    streamed = []
    for i in range(0, len(data), chunk_size):
        streamed.extend(t.feed(data[i : i + chunk_size]))
    assert _strip_volatile(streamed) == _strip_volatile(whole)


def test_mid_header_and_mid_crc_cuts():
    data = _segment()
    # cut INSIDE the first event header and INSIDE the last event's CRC
    cuts = [0, 4 + 7, len(data) - 2, len(data)]
    t = bl.BinlogTailer()
    out = []
    for a, b in zip(cuts, cuts[1:]):
        out.extend(t.feed(data[a:b]))
    assert [e["kind"] for e in out] == ["fde", "gtid", "query", "table_map", "rows", "xid"]


def test_xid_stamps_rows_across_chunk_boundary():
    data = _segment(xid=777)
    t = bl.BinlogTailer()
    # feed everything except the final XID event, then the XID alone
    import struct

    off = len(bl.MAGIC)
    events_bounds = []
    while off < len(data):
        size = struct.unpack_from("<IBIIIH", data, off)[3]
        events_bounds.append((off, off + size))
        off += size
    head = data[: events_bounds[-1][0]]
    first = t.feed(head)
    rows_ev = next(e for e in first if e["kind"] == "rows")
    assert "xid" not in rows_ev or rows_ev.get("xid") is None
    t.feed(data[events_bounds[-1][0] :])
    # the tx bracket stamps the SAME dict object delivered earlier
    assert rows_ev["xid"] == 777


def test_checkpoint_advances_only_on_commit():
    data = _segment(gno=9)
    t = bl.BinlogTailer(file="binlog.000001")
    # feed up to (but not including) the XID: position must not move
    import struct

    off = len(bl.MAGIC)
    bounds = []
    while off < len(data):
        size = struct.unpack_from("<IBIIIH", data, off)[3]
        bounds.append((off, off + size))
        off += size
    t.feed(data[: bounds[-1][0]])
    cp_before = json.loads(t.checkpoint())
    assert cp_before["pos"] == 0  # mid-transaction: not resumable here
    assert t.position.in_transaction
    t.feed(data[bounds[-1][0] :])
    cp = json.loads(t.checkpoint())
    assert cp["pos"] == len(data)  # XID log_pos == end of segment
    assert not t.position.in_transaction
    assert GtidSet.parse(cp["gtid_set"]).contains(bytes(16).hex(), 9)


def test_gtid_set_accumulates_across_transactions():
    t = bl.BinlogTailer()
    t.feed(_segment(gno=3))
    # second file: new magic (simulates a re-opened stream after rotate)
    t2_data = _segment(gno=4)
    t._need_magic = True  # direct arm: next bytes are a fresh file
    t._table_map = {}
    t.feed(t2_data)
    s = GtidSet.parse(json.loads(t.checkpoint())["gtid_set"])
    assert s.contains(bytes(16).hex(), 3) and s.contains(bytes(16).hex(), 4)


def test_rotate_arms_next_file_magic():
    w = bl.SegmentWriter(server_id=1)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    w.append(bl.ROTATE_EVENT, bl.rotate_payload(4, "binlog.000002"))
    file1 = w.bytes()
    file2 = _segment(gno=12)
    t = bl.BinlogTailer(file="binlog.000001")
    evs = t.feed(file1 + file2)
    kinds = [e["kind"] for e in evs]
    assert kinds[:2] == ["fde", "rotate"]
    assert "rows" in kinds  # second file decoded after re-arm
    cp = json.loads(t.checkpoint())
    assert cp["file"] == "binlog.000002"


def test_corrupt_crc_is_loud_in_stream():
    data = bytearray(_segment())
    data[40] ^= 0xFF
    t = bl.BinlogTailer()
    with pytest.raises(bl.BinlogError, match="crc|drift|truncat"):
        # feed byte-by-byte: the error must fire exactly when the
        # corrupt frame completes, not silently skip
        for i in range(len(data)):
            t.feed(bytes(data[i : i + 1]))


def test_tailer_matches_parse_segment_on_random_boundaries():
    import random

    rng = random.Random(1234)
    data = _segment(rows=tuple((i, f"v{i}") for i in range(50)), gno=77)
    whole = bl.parse_segment(data)
    for _trial in range(10):
        t = bl.BinlogTailer()
        out, i = [], 0
        while i < len(data):
            j = min(len(data), i + rng.randint(1, 37))
            out.extend(t.feed(data[i:j]))
            i = j
        assert out == whole
