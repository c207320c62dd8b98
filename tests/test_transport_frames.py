"""Transport-layer framing below the (absent) socket: the MySQL
client/server packet stream that carries binlog events after
COM_BINLOG_DUMP, and the PG streaming-replication CopyData layer
(XLogData / keepalive / standby-status feedback). These are the public
wire formats the reference gets from its client libraries
(mysql_async in mysql/mod.rs:113-382; tokio-postgres replication in
postgres/mod.rs:64-120) — implemented explicitly here so everything
between TCP bytes and decoded CDC rows is testable without a server.
"""

import struct

import pytest

import deltaforge_spark.sources.binlog as bl
import deltaforge_spark.sources.pgoutput as pg


# ------------------------------------------------------------- helpers


def _events_of(segment: bytes) -> list[bytes]:
    """Split a synthetic segment into raw event frames (drop magic)."""
    out, off = [], len(bl.MAGIC)
    while off < len(segment):
        size = struct.unpack_from("<IBIIIH", segment, off)[3]
        out.append(segment[off : off + size])
        off += size
    return out


def _packets(frames: list[bytes], start_seq: int = 1) -> bytes:
    """Wrap event frames as binlog-dump packets: 3-byte LE len +
    seq id + 0x00 OK marker + frame."""
    buf, seq = bytearray(), start_seq
    for f in frames:
        payload = b"\x00" + f
        buf += len(payload).to_bytes(3, "little") + bytes([seq]) + payload
        seq = (seq + 1) % 256
    return bytes(buf)


def _segment(gno=5):
    w = bl.SegmentWriter(server_id=11)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    w.append(bl.GTID_LOG_EVENT, bl.gtid_payload(bytes(16), gno))
    types, metas = [bl.MYSQL_TYPE_LONG, bl.MYSQL_TYPE_VARCHAR], [0, 32]
    w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(42, "db1", "t1", types, metas, [False, True]))
    w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(42, 2, [[1, "a"], [2, None]], types, metas))
    w.append(bl.XID_EVENT, bl.xid_payload(900))
    return w.bytes()


# ------------------------------------------------- MySQL packet stream


class TestMysqlPacketStream:
    def test_packet_stream_feeds_stream_mode_tailer(self):
        seg = _segment()
        wire = _packets(_events_of(seg))
        pkts = bl.MysqlPacketStream()
        tailer = bl.BinlogTailer({("db1", "t1"): ["id", "name"]}, mode="stream")
        events = []
        for frame in pkts.feed(wire):
            events.extend(tailer.feed(frame))
        # identical decode to the file-mode parse of the same segment
        assert events == bl.parse_segment(seg, {("db1", "t1"): ["id", "name"]})

    @pytest.mark.parametrize("chunk", [1, 3, 5, 100])
    def test_arbitrary_boundaries(self, chunk):
        seg = _segment()
        wire = _packets(_events_of(seg))
        pkts = bl.MysqlPacketStream()
        tailer = bl.BinlogTailer(mode="stream")
        events = []
        for i in range(0, len(wire), chunk):
            for frame in pkts.feed(wire[i : i + chunk]):
                events.extend(tailer.feed(frame))
        assert [e["kind"] for e in events] == ["fde", "gtid", "table_map", "rows", "xid"]

    def test_sequence_gap_is_loud(self):
        seg = _segment()
        frames = _events_of(seg)
        wire = _packets(frames[:1], start_seq=1) + _packets(frames[1:], start_seq=9)
        pkts = bl.MysqlPacketStream()
        with pytest.raises(bl.BinlogError, match="sequence gap"):
            pkts.feed(wire)

    def test_err_packet_raises_with_code_and_message(self):
        payload = b"\xff" + (1236).to_bytes(2, "little") + b"#HY000" + b"Could not find first log"
        wire = len(payload).to_bytes(3, "little") + b"\x01" + payload
        pkts = bl.MysqlPacketStream()
        with pytest.raises(bl.BinlogError, match=r"server error 1236 \[HY000\].*first log"):
            pkts.feed(wire)

    def test_eof_packet_halts_stream(self):
        payload = b"\xfe\x00\x00"
        wire = len(payload).to_bytes(3, "little") + b"\x01" + payload
        pkts = bl.MysqlPacketStream()
        assert pkts.feed(wire) == []
        assert pkts.eof
        with pytest.raises(bl.BinlogError, match="EOF"):
            pkts.feed(b"\x01\x00\x00\x02\x00")

    def test_16mb_payload_reassembles_across_packets(self):
        big = bytes(range(256)) * 65536  # 16 MiB of patterned bytes
        first = big[: bl.MAX_PACKET - 1]  # with the OK marker → 0xFFFFFF payload
        rest = big[bl.MAX_PACKET - 1 :]
        wire = (
            bl.MAX_PACKET.to_bytes(3, "little") + b"\x01" + b"\x00" + first
            + len(rest).to_bytes(3, "little") + b"\x02" + rest
        )
        pkts = bl.MysqlPacketStream()
        frames = pkts.feed(wire)
        assert frames == [big]

    def test_stream_mode_accepts_artificial_zero_log_pos(self):
        # network streams open with an artificial ROTATE whose log_pos
        # is 0 — file-mode continuity would reject it, stream mode must not
        w = bl.SegmentWriter(server_id=1)
        w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        seg = w.bytes()
        frames = _events_of(seg)
        # rewrite log_pos to 0 and re-CRC (artificial event)
        ts, tc, sid, size, pos, flags = struct.unpack_from("<IBIIIH", frames[0], 0)
        hdr = struct.pack("<IBIIIH", ts, tc, sid, size, 0, flags)
        body = hdr + frames[0][bl.HEADER_LEN : size - bl.CRC_LEN]
        import zlib

        art = body + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "little")
        tailer = bl.BinlogTailer(mode="stream")
        evs = tailer.feed(art)
        assert [e["kind"] for e in evs] == ["fde"]

    def test_stream_mode_rotate_continues_without_magic(self):
        # a dump stream carries NO magic between files: after ROTATE the
        # next file's FDE follows directly and must decode (file mode
        # would demand the 4-byte magic here)
        w1 = bl.SegmentWriter(server_id=1)
        w1.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        w1.append(bl.ROTATE_EVENT, bl.rotate_payload(4, "binlog.000002"))
        w2 = bl.SegmentWriter(server_id=1)
        w2.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        types, metas = [bl.MYSQL_TYPE_LONG], [0]
        w2.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(5, "d", "t", types, metas, [False]))
        w2.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(5, 1, [[9]], types, metas))
        stream_bytes = w1.bytes()[len(bl.MAGIC):] + w2.bytes()[len(bl.MAGIC):]
        t = bl.BinlogTailer(mode="stream")
        evs = t.feed(stream_bytes)
        kinds = [e["kind"] for e in evs]
        assert kinds == ["fde", "rotate", "fde", "table_map", "rows"]
        assert t.position.file == "binlog.000002"
        assert evs[-1]["rows"][0]["after"] == [9]

    def test_stream_mode_still_verifies_crc(self):
        seg = _segment()
        frames = _events_of(seg)
        bad = bytearray(frames[0])
        bad[25] ^= 0xFF
        tailer = bl.BinlogTailer(mode="stream")
        with pytest.raises(bl.BinlogError, match="crc"):
            tailer.feed(bytes(bad))


# --------------------------------------------- PG replication transport


class TestReplicationStream:
    def _tx_frames(self, lsn0=1000):
        begin = pg.encode_begin(lsn0 + 50, 777, 41)
        insert = pg.encode_insert(1, ["1", "x"])
        commit = pg.encode_commit(lsn0 + 50, lsn0 + 60, 777)
        return [
            pg.encode_xlogdata(lsn0, lsn0 + 10, 1, begin),
            pg.encode_xlogdata(lsn0 + 10, lsn0 + 40, 2, insert),
            pg.encode_xlogdata(lsn0 + 40, lsn0 + 60, 3, commit),
        ]

    def test_flush_advances_only_at_commit(self):
        rs = pg.ReplicationStream()
        frames = self._tx_frames()
        out0 = rs.feed_copydata(frames[0])
        assert out0["message"]["kind"] == "begin"
        assert rs.received_lsn == 1010 and rs.flushed_lsn == 0
        rs.feed_copydata(frames[1])
        assert rs.received_lsn == 1040 and rs.flushed_lsn == 0  # mid-tx: NOT acked
        out2 = rs.feed_copydata(frames[2])
        assert out2["message"]["kind"] == "commit"
        assert rs.flushed_lsn == 1060 and rs.applied_lsn == 1060

    def test_keepalive_tracks_received_and_requests_reply(self):
        rs = pg.ReplicationStream(flushed_lsn=500)
        out = rs.feed_copydata(pg.encode_keepalive(2000, 9, reply_requested=True))
        assert out == {
            "kind": "keepalive", "wal_end": 2000, "clock_us": 9, "reply_requested": True
        }
        assert rs.received_lsn == 2000 and rs.flushed_lsn == 500

    def test_status_update_bytes_pinned(self):
        rs = pg.ReplicationStream(flushed_lsn=0x10)
        rs.received_lsn = 0x20
        got = rs.status_update(clock_us=0x30, reply_requested=True)
        assert got == (
            b"r"
            + (0x20).to_bytes(8, "big")
            + (0x10).to_bytes(8, "big")
            + (0x10).to_bytes(8, "big")
            + (0x30).to_bytes(8, "big")
            + b"\x01"
        )

    def test_resume_from_flushed_lsn(self):
        # restart: a stream re-opened at the last flushed LSN re-reports
        # it immediately (the slot's confirmed_flush_lsn contract)
        rs = pg.ReplicationStream(flushed_lsn=1060)
        assert rs.status_update()[1:9] == (1060).to_bytes(8, "big")
        # replaying the already-acked tx is harmless: flush is monotonic
        for f in self._tx_frames():
            rs.feed_copydata(f)
        assert rs.flushed_lsn == 1060

    def test_truncated_and_unknown_frames_are_loud(self):
        rs = pg.ReplicationStream()
        with pytest.raises(pg.PgoutputError, match="truncated"):
            rs.feed_copydata(b"w" + b"\x00" * 10)
        with pytest.raises(pg.PgoutputError, match="truncated"):
            rs.feed_copydata(b"k" + b"\x00" * 5)
        with pytest.raises(pg.PgoutputError, match="unknown CopyData"):
            rs.feed_copydata(b"z123")

    def test_xlogdata_carries_real_pgoutput_grammar(self):
        rel = pg.encode_relation(7, "public", "t", [("id", 20, -1, 1), ("v", 25, -1, 0)])
        rs = pg.ReplicationStream()
        out = rs.feed_copydata(pg.encode_xlogdata(1, 2, 3, rel))
        assert out["message"]["kind"] == "relation"
        assert out["message"]["table"] == "t"
