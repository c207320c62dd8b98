"""Byte-level tests for the pgoutput and MySQL binlog wire codecs
(sources/pgoutput.py, sources/binlog.py).

The oracle queries (cdc_pgoutput_decode, cdc_binlog_decode) prove
encode∘decode == identity against DuckDB on real tables; these tests
pin the ENCODING itself to the public wire layouts with hand-computed
byte vectors, so the pair can't drift into a self-consistent-but-wrong
dialect. Reference grammar: postgres_event.rs:166-334,
postgres_object.rs:50-340; MySQL Internals binlog v4 event formats.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from deltaforge_spark.sources import binlog as bl
from deltaforge_spark.sources import pgoutput as pg


# ------------------------------------------------------------------ pgoutput
class TestPgoutputBytes:
    def test_begin_layout(self):
        msg = pg.encode_begin(0x0102030405060708, 1_234_567, 42)
        assert msg == b"B" + bytes.fromhex("0102030405060708") + (1_234_567).to_bytes(8, "big") + (42).to_bytes(4, "big")
        m = pg.parse_message(msg)
        assert m == {"kind": "begin", "final_lsn": 0x0102030405060708,
                     "commit_ts_us": 1_234_567, "xid": 42}

    def test_commit_layout(self):
        msg = pg.encode_commit(7, 8, 9)
        assert msg[:2] == b"C\x00"
        m = pg.parse_message(msg)
        assert (m["commit_lsn"], m["end_lsn"], m["commit_ts_us"]) == (7, 8, 9)

    def test_insert_bytes_pinned(self):
        # 'I', relation 5 (u32 BE), 'N', ncols=2 (u16 BE),
        # 't' + len 2 + "42", 'n'
        msg = pg.encode_insert(5, ["42", None])
        assert msg == b"I\x00\x00\x00\x05N\x00\x02t\x00\x00\x00\x0242n"
        m = pg.parse_message(msg)
        assert m == {"kind": "insert", "relation_id": 5, "new": ["42", None]}

    def test_tuple_unchanged_marker(self):
        msg = pg.encode_update(9, ["new", pg.UNCHANGED], ["old", pg.UNCHANGED])
        m = pg.parse_message(msg)
        assert m["old"] == ["old", pg.UNCHANGED]
        assert m["new"] == ["new", pg.UNCHANGED]
        obj = pg.build_object(
            [{"name": "a", "type_oid": pg.TEXT}, {"name": "b", "type_oid": pg.TEXT}],
            m["new"],
        )
        assert obj == {"a": "new", "b": {"_unchanged": True}}

    def test_delete_key_only(self):
        msg = pg.encode_delete(3, ["7"], key_only=True)
        assert msg[5:6] == b"K"
        m = pg.parse_message(msg)
        assert m["old_key_only"] is True and m["old"] == ["7"]

    def test_relation_roundtrip(self):
        cols = [("id", pg.INT8, -1, 1), ("name", pg.TEXT, -1, 0)]
        m = pg.parse_message(pg.encode_relation(99, "public", "t", cols))
        assert m["relation_id"] == 99
        assert m["schema"] == "public" and m["table"] == "t"
        assert m["replica_identity"] == "f"
        assert [(c["name"], c["type_oid"], c["flags"]) for c in m["columns"]] == [
            ("id", pg.INT8, 1), ("name", pg.TEXT, 0),
        ]

    @pytest.mark.parametrize(
        "mangle",
        [
            lambda b: b[:3],                        # truncated header
            lambda b: b[:-1],                       # truncated value
            lambda b: b[:5] + b"X" + b[6:],         # bad insert marker
        ],
    )
    def test_truncation_is_loud(self, mangle):
        msg = pg.encode_insert(5, ["hello"])
        with pytest.raises(pg.PgoutputError):
            pg.parse_message(mangle(msg))

    def test_convert_text_values(self):
        assert pg.convert_text_value("t", pg.BOOL) is True
        assert pg.convert_text_value("off", pg.BOOL) is False
        assert pg.convert_text_value("-7", pg.INT4) == -7
        assert pg.convert_text_value("2.5", pg.FLOAT8) == 2.5
        assert pg.convert_text_value("12.3400", pg.NUMERIC) == "12.3400"
        assert pg.convert_text_value('{"k":1}', pg.JSONB) == {"k": 1}
        assert pg.convert_text_value("\\x0001ff", pg.BYTEA) == {"_base64": "AAH/"}
        assert pg.convert_text_value("plain", pg.TEXT) == "plain"

    def test_unknown_message_skips(self):
        assert pg.parse_message(b"Zxyz")["kind"] == "other"


# ------------------------------------------------------------------ binlog
class TestBinlogPrimitives:
    @pytest.mark.parametrize("n,enc", [
        (0, b"\x00"), (250, b"\xfa"),
        (251, b"\xfc\xfb\x00"), (65535, b"\xfc\xff\xff"),
        (1 << 16, b"\xfd\x00\x00\x01"), (1 << 24, b"\xfe" + (1 << 24).to_bytes(8, "little")),
    ])
    def test_lenenc_vectors(self, n, enc):
        assert bl.encode_lenenc(n) == enc
        v, off = bl.read_lenenc(enc, 0)
        assert v == n and off == len(enc)

    def test_datetime2_pinned_vector(self):
        # 2023-06-15 12:34:56.789012 UTC
        import pandas as pd

        us = pd.Timestamp("2023-06-15 12:34:56.789012").value // 1000
        b = bl.encode_datetime2(us, fsp=6)
        assert len(b) == 8
        packed = int.from_bytes(b[:5], "big") - 0x8000000000
        assert packed & 0x3F == 56                        # second
        assert (packed >> 6) & 0x3F == 34                 # minute
        assert (packed >> 12) & 0x1F == 12                # hour
        assert (packed >> 17) & 0x1F == 15                # day
        assert (packed >> 22) == 2023 * 13 + 6            # year*13+month
        assert int.from_bytes(b[5:], "big") == 789012     # µs fraction
        out, off = bl.decode_datetime2(b, 0, fsp=6)
        assert out == us and off == 8

    @pytest.mark.parametrize("fsp,frac_len", [(0, 0), (2, 1), (4, 2), (6, 3)])
    def test_datetime2_fsp_widths(self, fsp, frac_len):
        import pandas as pd

        us = pd.Timestamp("1999-12-31 23:59:59").value // 1000
        assert len(bl.encode_datetime2(us, fsp=fsp)) == 5 + frac_len

    @pytest.mark.parametrize("t,meta,v", [
        (bl.MYSQL_TYPE_TINY, 0, -5),
        (bl.MYSQL_TYPE_SHORT, 0, -30000),
        (bl.MYSQL_TYPE_INT24, 0, -(1 << 22)),
        (bl.MYSQL_TYPE_LONG, 0, -(1 << 30)),
        (bl.MYSQL_TYPE_LONGLONG, 0, -(1 << 62)),
        (bl.MYSQL_TYPE_FLOAT, 4, 1.5),
        (bl.MYSQL_TYPE_DOUBLE, 8, -2.75),
        (bl.MYSQL_TYPE_VARCHAR, 64, "héllo"),
        (bl.MYSQL_TYPE_VARCHAR, 1024, "x" * 300),
        (bl.MYSQL_TYPE_BLOB, 2, "payload"),
    ])
    def test_value_roundtrip(self, t, meta, v):
        enc = bl.encode_value(t, meta, v)
        out, off = bl.decode_value(t, meta, enc, 0)
        assert out == v and off == len(enc)

    def test_varchar_length_width_follows_meta(self):
        assert bl.encode_value(bl.MYSQL_TYPE_VARCHAR, 64, "ab")[:1] == b"\x02"
        assert bl.encode_value(bl.MYSQL_TYPE_VARCHAR, 300, "ab")[:2] == b"\x02\x00"


def _segment(rows=((1, "a"), (2, None))):
    """Two-column (LONG, VARCHAR nullable) single-insert segment."""
    w = bl.SegmentWriter(server_id=11)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    w.append(bl.GTID_LOG_EVENT, bl.gtid_payload(bytes(16), 5))
    w.append(bl.QUERY_EVENT, bl.query_payload("db1", "BEGIN"))
    types = [bl.MYSQL_TYPE_LONG, bl.MYSQL_TYPE_VARCHAR]
    metas = [0, 32]
    w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(42, "db1", "t1", types, metas, [False, True]))
    w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(42, 2, [list(r) for r in rows], types, metas))
    w.append(bl.XID_EVENT, bl.xid_payload(900))
    return w.bytes()


class TestBinlogSegments:
    def test_header_fields_and_log_pos(self):
        data = _segment()
        events = bl.parse_segment(data)
        kinds = [e["kind"] for e in events]
        assert kinds == ["fde", "gtid", "query", "table_map", "rows", "xid"]
        assert all(e["server_id"] == 11 for e in events)
        # log_pos chain: each event's log_pos is the next event's offset
        assert events[-1]["log_pos"] == len(data)

    def test_rows_with_null_bitmap_and_names(self):
        events = bl.parse_segment(_segment(), {("db1", "t1"): ["id", "name"]})
        rows = next(e for e in events if e["kind"] == "rows")
        assert rows["op"] == "c"
        assert rows["xid"] == 900                      # stamped by XID
        assert rows["gtid"] == (bytes(16).hex(), 5)
        assert rows["rows"][0]["after"] == {"id": 1, "name": "a"}
        assert rows["rows"][1]["after"] == {"id": 2, "name": None}

    def test_update_images(self):
        w = bl.SegmentWriter(server_id=1)
        w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        types, metas = [bl.MYSQL_TYPE_LONG], [0]
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(7, "d", "t", types, metas, [False]))
        w.append(
            bl.UPDATE_ROWS_EVENT,
            bl.rows_payload(7, 1, [[10], [11], [20], [21]], types, metas, update=True),
        )
        rows = next(e for e in bl.parse_segment(w.bytes()) if e["kind"] == "rows")
        assert rows["op"] == "u"
        assert [(r["before"], r["after"]) for r in rows["rows"]] == [([10], [11]), ([20], [21])]

    def test_update_minimal_after_image_uses_present2(self):
        # binlog_row_image=MINIMAL: the after-image carries only changed
        # columns under its OWN present bitmap. Decoding it against
        # present1 used to drift the offset silently (ADVICE r4).
        w = bl.SegmentWriter(server_id=1)
        w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        types = [bl.MYSQL_TYPE_LONG, bl.MYSQL_TYPE_LONG, bl.MYSQL_TYPE_LONG]
        metas = [0, 0, 0]
        w.append(
            bl.TABLE_MAP_EVENT,
            bl.table_map_payload(7, "d", "t", types, metas, [False, False, False]),
        )
        # before: PK only (col 0); after: changed cols only (col 2)
        w.append(
            bl.UPDATE_ROWS_EVENT,
            bl.rows_payload(
                7, 3,
                [[10, None, None], [None, None, 33], [20, None, None], [None, None, 44]],
                types, metas, update=True,
                present_cols=[True, False, False],
                present_cols2=[False, False, True],
            ),
        )
        rows = next(e for e in bl.parse_segment(w.bytes()) if e["kind"] == "rows")
        assert [(r["before"], r["after"]) for r in rows["rows"]] == [
            ([10, None, None], [None, None, 33]),
            ([20, None, None], [None, None, 44]),
        ]

    def test_partial_image_null_bitmap_counts_present_cols(self):
        # a present-but-NULL column in a partial image: null bitmap bit
        # ordinals are over present columns (not table columns)
        w = bl.SegmentWriter(server_id=1)
        w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        types = [bl.MYSQL_TYPE_LONG] * 4
        metas = [0, 0, 0, 0]
        w.append(
            bl.TABLE_MAP_EVENT,
            bl.table_map_payload(9, "d", "t", types, metas, [False, True, True, True]),
        )
        # col1 ABSENT, col2 present-but-NULL (null bit ordinal 1, not 2 —
        # absolute-index lookup would misread it), col3 present=7
        w.append(
            bl.WRITE_ROWS_EVENT,
            bl.rows_payload(
                9, 4, [[1, None, None, 7]], types, metas,
                present_cols=[True, False, True, True],
            ),
        )
        rows = next(e for e in bl.parse_segment(w.bytes()) if e["kind"] == "rows")
        assert rows["rows"][0]["after"] == [1, None, None, 7]

    def test_bad_magic_is_loud(self):
        with pytest.raises(bl.BinlogError, match="magic"):
            bl.parse_segment(b"nope" + _segment()[4:])

    def test_crc_corruption_is_loud(self):
        data = bytearray(_segment())
        data[40] ^= 0xFF
        with pytest.raises(bl.BinlogError, match="crc|drift|truncat"):
            bl.parse_segment(bytes(data))

    def test_log_pos_drift_is_loud(self):
        # re-frame an event with a wrong log_pos but a valid CRC
        data = _segment()
        off = len(bl.MAGIC)
        ts, tc, sid, size, pos, flags = struct.unpack_from("<IBIIIH", data, off)
        payload = data[off + bl.HEADER_LEN : off + size - bl.CRC_LEN]
        bad_header = struct.pack("<IBIIIH", ts, tc, sid, size, pos + 4, flags)
        body = bad_header + payload
        ev = body + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "little")
        with pytest.raises(bl.BinlogError, match="log_pos drift"):
            bl.parse_segment(data[:off] + ev + data[off + size :])

    def test_rows_before_table_map_is_loud(self):
        w = bl.SegmentWriter(server_id=1)
        w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(99, 1, [[1]], [bl.MYSQL_TYPE_LONG], [0]))
        with pytest.raises(bl.BinlogError, match="unmapped"):
            bl.parse_segment(w.bytes())

    def test_schema_width_mismatch_is_loud(self):
        with pytest.raises(bl.BinlogError, match="columns"):
            bl.parse_segment(_segment(), {("db1", "t1"): ["only_one"]})

    def test_query_and_rotate_decode(self):
        w = bl.SegmentWriter(server_id=3)
        w.append(bl.QUERY_EVENT, bl.query_payload("mydb", "ALTER TABLE t ADD c INT"))
        w.append(bl.ROTATE_EVENT, bl.rotate_payload(4, "binlog.000042"))
        q, r = bl.parse_segment(w.bytes())
        assert (q["schema"], q["sql"]) == ("mydb", "ALTER TABLE t ADD c INT")
        assert (r["position"], r["next_file"]) == (4, "binlog.000042")


# ------------------------------------------------------------ mysql jsonb
from deltaforge_spark.functions import jsonb as jb  # noqa: E402


class TestMysqlJsonb:
    def test_small_object_bytes_pinned(self):
        # {"k": 87}: small object, one key, inlined int16 value.
        # payload: count=1, size, key entry (off=15, len=1), value entry
        # (0x05, 87 LE padded), key 'k'
        b = jb.jsonb_encode({"k": 87})
        assert b[0] == jb.TYPE_SMALL_OBJECT
        assert b == bytes(
            [0x00,               # type: small object
             0x01, 0x00,         # count = 1
             0x0C, 0x00,         # total size = 12 (4 hdr + 4 key entry + 3 val entry + 1 key)
             0x0B, 0x00,         # key offset = 11
             0x01, 0x00,         # key length = 1
             0x05, 0x57, 0x00,   # inlined int16 87
             0x6B]               # 'k'
        )
        assert jb.jsonb_decode(b) == {"k": 87}

    @pytest.mark.parametrize("v", [
        None, True, False, 0, -1, 87, 40000, -(1 << 20), 1 << 40, -2.5,
        "", "héllo", "x" * 200,
        [], [1, 2, 3], ["a", None, True],
        {}, {"k": 87}, {"a": {"b": [1, "two", 3.0]}, "c": None},
        {"big": 1 << 40, "neg32": -(1 << 20), "s": "x" * 130},
        [[1], [2, [3]]],
    ])
    def test_roundtrip(self, v):
        assert jb.jsonb_decode(jb.jsonb_encode(v)) == v

    def test_uint16_inline_decode(self):
        # encoder picks int32 for 40000 (doesn't fit int16) but a real
        # MySQL writer may emit uint16 — decode must handle it inline
        payload = bytes([0x01, 0x00, 0x0F, 0x00, 0x0C, 0x00, 0x01, 0x00,
                         0x06, 0x40, 0x9C, 0x6B])
        # count=1,size=15? build via parse of hand-written container is
        # fiddly; pin the scalar path instead:
        assert jb._decode_typed(jb.TYPE_UINT16, b"\x40\x9c", full=False) == 40000

    def test_large_container_fallback(self):
        # >64KiB of string content forces the large (u32-offset) format
        big = {f"key{i}": "v" * 3000 for i in range(30)}
        b = jb.jsonb_encode(big)
        assert b[0] == jb.TYPE_LARGE_OBJECT
        assert jb.jsonb_decode(b) == big

    @pytest.mark.parametrize("mangle", [
        lambda b: b"",
        lambda b: b[:1],
        lambda b: b[:6],
        lambda b: bytes([0x7F]) + b[1:],
    ])
    def test_malformed_is_loud(self, mangle):
        b = jb.jsonb_encode({"k": 87})
        with pytest.raises(jb.JsonbError):
            jb.jsonb_decode(mangle(b))

    def test_binlog_json_column_roundtrip(self):
        enc = bl.encode_value(bl.MYSQL_TYPE_JSON, 4, {"k": 87, "nested": [1, "two"]})
        out, off = bl.decode_value(bl.MYSQL_TYPE_JSON, 4, enc, 0)
        assert out == {"k": 87, "nested": [1, "two"]} and off == len(enc)


class TestNewDecimal:
    def test_mysql_documented_vector(self):
        # The classic documented example: DECIMAL(14,4) 1234567890.1234
        # → 81 0D FB 38 D2 04 D2
        b = bl.encode_newdecimal("1234567890.1234", 14, 4)
        assert b == bytes.fromhex("810DFB38D204D2")
        s, off = bl.decode_newdecimal(b, 0, 14, 4)
        assert s == "1234567890.1234" and off == 7

    def test_negative_is_complemented(self):
        pos = bl.encode_newdecimal("1234567890.1234", 14, 4)
        neg = bl.encode_newdecimal("-1234567890.1234", 14, 4)
        assert neg == bytes(b ^ 0xFF for b in pos)
        s, _ = bl.decode_newdecimal(neg, 0, 14, 4)
        assert s == "-1234567890.1234"

    @pytest.mark.parametrize("s,p,sc", [
        ("0.00", 18, 2), ("0.01", 18, 2), ("-0.01", 18, 2),
        ("99999999999999.99", 16, 2),
        ("123456789123456789", 18, 0),
        ("0.123456789123", 20, 12),
        ("-7.1", 4, 1), ("42", 9, 0), ("-42", 9, 0),
    ])
    def test_roundtrip(self, s, p, sc):
        b = bl.encode_newdecimal(s, p, sc)
        assert len(b) == bl.newdecimal_bin_size(p, sc)
        out, off = bl.decode_newdecimal(b, 0, p, sc)
        assert out == s and off == len(b)

    def test_binlog_column_roundtrip(self):
        meta = (18 << 8) | 2
        enc = bl.encode_value(bl.MYSQL_TYPE_NEWDECIMAL, meta, "-123.45")
        out, off = bl.decode_value(bl.MYSQL_TYPE_NEWDECIMAL, meta, enc, 0)
        assert out == "-123.45" and off == len(enc)

    def test_overflow_is_loud(self):
        with pytest.raises(bl.BinlogError, match="precision"):
            bl.encode_newdecimal("100.0", 4, 2)


class TestPgoutputTruncate:
    def test_truncate_layout_and_flags(self):
        msg = pg.encode_truncate([7, 9], cascade=True, restart_identity=False)
        assert msg == b"T" + (2).to_bytes(4, "big") + b"\x01" + (7).to_bytes(4, "big") + (9).to_bytes(4, "big")
        m = pg.parse_message(msg)
        assert m == {"kind": "truncate", "relation_ids": [7, 9],
                     "cascade": True, "restart_identity": False}

    def test_truncate_truncation_is_loud(self):
        msg = pg.encode_truncate([7, 9])
        with pytest.raises(pg.PgoutputError):
            pg.parse_message(msg[:-2])

    def test_spark_truncate_decode(self, spark):
        from deltaforge_spark.sources.pgoutput import (
            decode_pgoutput_truncates,
            encode_relation,
            pgoutput_relation_catalog,
        )

        rows = [
            (1, pg.encode_relation(7, "public", "t1", [("id", pg.INT8, -1, 1)])),
            (2, pg.encode_relation(9, "public", "t2", [("id", pg.INT8, -1, 1)])),
            (3, pg.encode_truncate([7, 9, 999], cascade=False, restart_identity=True)),
        ]
        df = spark.createDataFrame(rows, "seq long, data binary")
        rels = pgoutput_relation_catalog(df)
        out = decode_pgoutput_truncates(df, rels).orderBy("table").collect()
        # unknown relation 999 skipped (reference warn-and-skip)
        assert [(r.table, r.cascade, r.restart_identity) for r in out] == [
            ("t1", False, True), ("t2", False, True),
        ]

    def test_truncate_catalog_seq_zero_beats_no_seq(self, spark):
        """seq 0 is a REAL announcement position, not 'no seq': a
        relation announced at seq 0 must win over a no-seq (hand-built)
        entry regardless of list order. The old ``int(seq or -1)``
        coerced seq-0 to the no-seq sentinel, making the winner
        order-dependent (ADVICE-class bug, catalog sort key)."""
        from deltaforge_spark.sources.pgoutput import decode_pgoutput_truncates

        df = spark.createDataFrame(
            [(5, pg.encode_truncate([7], cascade=False, restart_identity=False))],
            "seq long, data binary",
        )
        for rels in (
            [{"relation_id": 7, "schema": "public", "table": "announced", "seq": 0},
             {"relation_id": 7, "schema": "public", "table": "handbuilt", "seq": None}],
            [{"relation_id": 7, "schema": "public", "table": "handbuilt", "seq": None},
             {"relation_id": 7, "schema": "public", "table": "announced", "seq": 0}],
        ):
            out = decode_pgoutput_truncates(df, rels).collect()
            assert [r.table for r in out] == ["announced"]


class TestPgoutputBinaryAndArrays:
    def test_binary_tuple_marker_roundtrip(self):
        msg = pg.encode_insert(5, ["text", b"\x00\x01\xff"])
        m = pg.parse_message(msg)
        assert m["new"] == ["text", b"\x00\x01\xff"]
        obj = pg.build_object(
            [{"name": "a", "type_oid": pg.TEXT}, {"name": "b", "type_oid": pg.BYTEA}],
            m["new"],
        )
        assert obj == {"a": "text", "b": {"_base64": "AAH/"}}

    @pytest.mark.parametrize("s,expected", [
        ("{}", []),
        ("{1,2,3}", [1, 2, 3]),
        ('{"hello","world"}', ["hello", "world"]),
        ("{1,NULL,3}", [1, None, 3]),
        ("{t,f,true,false}", [True, False, True, False]),
        ("{1.5,-2}", [1.5, -2]),
        (r'{"with\"quote","a\\b"}', ['with"quote', "a\\b"]),
        ("{a b, c}", ["a b", "c"]),
        ("not-an-array", "not-an-array"),
    ])
    def test_pg_array_text(self, s, expected):
        assert pg.parse_pg_array_text(s) == expected

    def test_array_oid_converts(self):
        assert pg.convert_text_value("{1,2}", 1007) == [1, 2]
        # 3802 is JSONB first (arm order parity with the reference)
        assert pg.convert_text_value("[1,2]", 3802) == [1, 2]


class TestTemporalTypes:
    @pytest.mark.parametrize("s", ["1995-01-02", "2024-12-31", "1000-01-01", "9999-12-31"])
    def test_date_roundtrip(self, s):
        b = bl.encode_date(s)
        assert len(b) == 3
        out, off = bl.decode_date(b, 0)
        assert out == s and off == 3

    def test_date_packing_pinned(self):
        # 2024-12-31: 31 | 12<<5 | 2024<<9 = 0xFD19F little-endian
        v = 31 | (12 << 5) | (2024 << 9)
        assert bl.encode_date("2024-12-31") == v.to_bytes(3, "little")

    @pytest.mark.parametrize("us,fsp", [
        (0, 0), (1_700_000_000_123_456, 6), (1_700_000_000_120_000, 2),
        (86400 * 1_000_000, 0),
    ])
    def test_timestamp2_roundtrip(self, us, fsp):
        if fsp == 2:
            us = us // 10000 * 10000
        b = bl.encode_timestamp2(us, fsp=fsp)
        out, off = bl.decode_timestamp2(b, 0, fsp=fsp)
        assert out == us and off == len(b)

    def test_timestamp2_is_big_endian_seconds(self):
        assert bl.encode_timestamp2(1_000_000, fsp=0) == (1).to_bytes(4, "big")

    @pytest.mark.parametrize("s,fsp", [
        ("00:00:00", 0), ("12:34:56", 0), ("838:59:59", 0),
        ("-12:34:56", 0), ("01:02:03.500000", 6), ("01:02:03.50", 2),
    ])
    def test_time2_roundtrip(self, s, fsp):
        b = bl.encode_time2(s, fsp=fsp)
        out, off = bl.decode_time2(b, 0, fsp=fsp)
        assert out == s and off == len(b)

    def test_time2_offset_binary(self):
        # 00:00:00 sits exactly at the 0x800000 midpoint
        assert bl.encode_time2("00:00:00", fsp=0) == b"\x80\x00\x00"

    def test_negative_fractional_time_is_loud(self):
        with pytest.raises(bl.BinlogError):
            bl.encode_time2("-01:00:00.5", fsp=2)

    @pytest.mark.parametrize("y", [1901, 2024, 2155])
    def test_year_roundtrip(self, y):
        enc = bl.encode_value(bl.MYSQL_TYPE_YEAR, 0, y)
        out, off = bl.decode_value(bl.MYSQL_TYPE_YEAR, 0, enc, 0)
        assert out == y and off == 1

    def test_all_temporals_in_a_row_event(self):
        types = [bl.MYSQL_TYPE_DATE, bl.MYSQL_TYPE_TIMESTAMP2, bl.MYSQL_TYPE_TIME2, bl.MYSQL_TYPE_YEAR]
        metas = [0, 6, 3, 0]
        row = ["2024-02-29", 1_700_000_000_123_456, "23:59:59.999", 1999]
        w = bl.SegmentWriter(1)
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(5, "d", "t", types, metas, [False] * 4))
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(5, 4, [row], types, metas))
        rows = next(e for e in bl.parse_segment(w.bytes()) if e["kind"] == "rows")
        assert rows["rows"][0]["after"] == row


class TestMultiTableSegment:
    def test_interleaved_table_maps(self):
        """Two tables alternating in one segment — the table_id →
        schema map must track both (reference relation_map behavior)."""
        w = bl.SegmentWriter(1)
        t1, m1 = [bl.MYSQL_TYPE_LONG], [0]
        t2, m2 = [bl.MYSQL_TYPE_VARCHAR], [32]
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(1, "d", "a", t1, m1, [False]))
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(1, 1, [[10]], t1, m1))
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(2, "d", "b", t2, m2, [False]))
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(2, 1, [["x"]], t2, m2))
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(1, 1, [[20]], t1, m1))
        rows = [e for e in bl.parse_segment(w.bytes(), {("d", "a"): ["n"], ("d", "b"): ["s"]})
                if e["kind"] == "rows"]
        assert [r["table"] for r in rows] == ["a", "b", "a"]
        assert rows[0]["rows"][0]["after"] == {"n": 10}
        assert rows[1]["rows"][0]["after"] == {"s": "x"}
        assert rows[2]["rows"][0]["after"] == {"n": 20}


class TestPgoutputLogicalMessage:
    def test_message_layout_pinned(self):
        msg = pg.encode_logical_message("orders.evt", b'{"a":1}', 0x10, transactional=True)
        assert msg[:1] == b"M" and msg[1] == 1
        assert int.from_bytes(msg[2:10], "big") == 0x10
        m = pg.parse_message(msg)
        assert m == {"kind": "message", "transactional": True, "lsn": 0x10,
                     "prefix": "orders.evt", "content": b'{"a":1}'}

    def test_non_transactional_flag(self):
        m = pg.parse_message(pg.encode_logical_message("p", b"{}", 1, transactional=False))
        assert m["transactional"] is False

    def test_truncated_is_loud(self):
        msg = pg.encode_logical_message("p", b'{"a":1}', 1)
        with pytest.raises(pg.PgoutputError):
            pg.parse_message(msg[:-3])

    def test_spark_decode_outbox_tagging(self, spark):
        from deltaforge_spark.sources.pgoutput import (
            OUTBOX_SCHEMA_SENTINEL,
            WAL_MESSAGE_SCHEMA,
            decode_pgoutput_messages,
        )

        rows = [
            (1, pg.encode_logical_message("outbox.orders", b'{"k": 1}', 11)),
            (2, pg.encode_logical_message("audit.log", b'{"k": 2}', 12)),
            (3, pg.encode_logical_message("outbox.users", b"not json", 13)),
            (4, pg.encode_insert(5, ["x"])),  # non-M messages ignored
        ]
        df = spark.createDataFrame(rows, "seq long, data binary")
        out = decode_pgoutput_messages(df, outbox_prefixes=["outbox%"]).orderBy("seq").collect()
        # non-JSON content skipped (reference warn-and-skip)
        assert [(r.seq, r.prefix, r.schema) for r in out] == [
            (1, "outbox.orders", OUTBOX_SCHEMA_SENTINEL),
            (2, "audit.log", WAL_MESSAGE_SCHEMA),
        ]
        assert out[0].after == '{"k": 1}'
        assert out[0].lsn == 11 and out[0].transactional is True


class TestStringFamilyMeta:
    def test_short_char_meta_roundtrip(self):
        meta = (bl.MYSQL_TYPE_STRING << 16) | 40
        packed = bl._meta_bytes(bl.MYSQL_TYPE_STRING, meta)
        assert packed == bytes([bl.MYSQL_TYPE_STRING, 40])
        rt, length = bl.unpack_string_meta(packed[0], packed[1])
        assert (rt, length) == (bl.MYSQL_TYPE_STRING, 40)

    def test_long_char_meta_hides_bits_in_type_byte(self):
        # CHAR(255) utf8mb4 → byte length up to 1020 > 255: the two
        # high length bits ride in ~(byte0 & 0x30)
        meta = (bl.MYSQL_TYPE_STRING << 16) | 780
        packed = bl._meta_bytes(bl.MYSQL_TYPE_STRING, meta)
        assert packed[0] != bl.MYSQL_TYPE_STRING  # bits really moved
        rt, length = bl.unpack_string_meta(packed[0], packed[1])
        assert (rt, length) == (bl.MYSQL_TYPE_STRING, 780)

    @pytest.mark.parametrize("storage,value", [(1, 3), (2, 300)])
    def test_enum_roundtrip(self, storage, value):
        meta = (bl.MYSQL_TYPE_ENUM << 16) | storage
        enc = bl.encode_value(bl.MYSQL_TYPE_STRING, meta, value)
        assert len(enc) == storage
        out, off = bl.decode_value(bl.MYSQL_TYPE_STRING, meta, enc, 0)
        assert out == value and off == storage

    def test_set_bitmask_roundtrip(self):
        meta = (bl.MYSQL_TYPE_SET << 16) | 2
        enc = bl.encode_value(bl.MYSQL_TYPE_STRING, meta, 0b1010_0000_0001)
        out, _ = bl.decode_value(bl.MYSQL_TYPE_STRING, meta, enc, 0)
        assert out == 0b1010_0000_0001

    @pytest.mark.parametrize("length,v", [(40, "char-val"), (780, "x" * 500)])
    def test_char_value_roundtrip(self, length, v):
        meta = (bl.MYSQL_TYPE_STRING << 16) | length
        enc = bl.encode_value(bl.MYSQL_TYPE_STRING, meta, v)
        out, off = bl.decode_value(bl.MYSQL_TYPE_STRING, meta, enc, 0)
        assert out == v and off == len(enc)

    def test_string_family_through_table_map(self):
        """Full segment: CHAR(780), ENUM, SET columns — the packed meta
        survives the TABLE_MAP round trip and values decode by the
        unpacked real types."""
        types = [bl.MYSQL_TYPE_STRING] * 3
        metas = [
            (bl.MYSQL_TYPE_STRING << 16) | 780,
            (bl.MYSQL_TYPE_ENUM << 16) | 1,
            (bl.MYSQL_TYPE_SET << 16) | 1,
        ]
        row = ["y" * 300, 2, 0b101]
        w = bl.SegmentWriter(1)
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(9, "d", "t", types, metas, [False] * 3))
        w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(9, 3, [row], types, metas))
        rows = next(e for e in bl.parse_segment(w.bytes()) if e["kind"] == "rows")
        assert rows["rows"][0]["after"] == row


class TestReviewFixes:
    """Regression pins for the round-4 code-review findings."""

    def test_value_truncation_inside_crc_valid_event_is_binlog_error(self):
        # a CRC-valid ROWS event whose value bytes are short must raise
        # BinlogError, not struct.error
        types, metas = [bl.MYSQL_TYPE_LONGLONG], [0]
        w = bl.SegmentWriter(1)
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(7, "d", "t", types, metas, [False]))
        # hand-build a rows payload with a truncated int64 value
        body = bytearray((7).to_bytes(6, "little"))
        body += struct.pack("<H", 0) + struct.pack("<H", 2)
        body += bl.encode_lenenc(1) + b"\x01"  # present bitmap
        body += b"\x00"                        # null bitmap: not null
        body += b"\x01\x02\x03"                # only 3 of 8 value bytes
        w.append(bl.WRITE_ROWS_EVENT, bytes(body))
        with pytest.raises(bl.BinlogError, match="malformed event"):
            bl.parse_segment(w.bytes())

    def test_rows_event_column_count_mismatch_is_loud(self):
        # n_cols disagreeing with TABLE_MAP must not silently decode to
        # zero rows
        types, metas = [bl.MYSQL_TYPE_LONG], [0]
        w = bl.SegmentWriter(1)
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(7, "d", "t", types, metas, [False]))
        body = bytearray((7).to_bytes(6, "little"))
        body += struct.pack("<H", 0) + struct.pack("<H", 2)
        body += bl.encode_lenenc(200)          # claims 200 columns
        body += b"\x00" * 25                   # oversized bitmap
        w.append(bl.WRITE_ROWS_EVENT, bytes(body))
        with pytest.raises(bl.BinlogError, match="claims 200 columns"):
            bl.parse_segment(w.bytes())

    def test_corrupt_jsonb_routes_not_crashes(self):
        types, metas = [bl.MYSQL_TYPE_JSON], [4]
        w = bl.SegmentWriter(1)
        w.append(bl.TABLE_MAP_EVENT, bl.table_map_payload(7, "d", "t", types, metas, [False]))
        bad_jsonb = b"\x7f\x01\x02"  # unknown jsonb type byte
        body = bytearray((7).to_bytes(6, "little"))
        body += struct.pack("<H", 0) + struct.pack("<H", 2)
        body += bl.encode_lenenc(1) + b"\x01" + b"\x00"
        body += len(bad_jsonb).to_bytes(4, "little") + bad_jsonb
        w.append(bl.WRITE_ROWS_EVENT, bytes(body))
        with pytest.raises(bl.BinlogError):
            bl.parse_segment(w.bytes())

    def test_quoted_null_and_numbers_stay_strings(self):
        assert pg.parse_pg_array_text('{"NULL","123","t"}') == ["NULL", "123", "t"]
        assert pg.parse_pg_array_text("{NULL,123,t}") == [None, 123, True]
        assert pg.parse_pg_array_text('{""}') == [""]

    def test_versioned_catalog_binds_dml_to_its_announcement(self, spark):
        """Schema drift mid-stream: DML before the re-announcement
        decodes with the old columns, DML after with the new."""
        import json as _json

        from deltaforge_spark.sources.pgoutput import (
            decode_pgoutput_dml,
            pgoutput_relation_catalog,
        )

        v1 = [("id", pg.INT8, -1, 1)]
        v2 = [("id", pg.INT8, -1, 1), ("extra", pg.TEXT, -1, 0)]
        rows = [
            (1, pg.encode_relation(7, "public", "t", v1)),
            (2, pg.encode_insert(7, ["10"])),
            (3, pg.encode_relation(7, "public", "t", v2)),
            (4, pg.encode_insert(7, ["11", "x"])),
        ]
        df = spark.createDataFrame(rows, "seq long, data binary")
        rels = pgoutput_relation_catalog(df)
        out = {r["seq"]: _json.loads(r["after"]) for r in decode_pgoutput_dml(df, rels).collect()}
        assert out[2] == {"id": 10}
        assert out[4] == {"id": 11, "extra": "x"}
