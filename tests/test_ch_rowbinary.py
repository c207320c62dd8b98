"""ClickHouse RowBinary encoder: byte-pinned vectors (mirroring the
reference's rowbinary.rs unit tests), encode/decode round-trips, and the
Spark sink writing FORMAT RowBinary to a loopback HTTP server that
decodes the body server-side and asserts parity with JSONEachRow."""

import json
import struct
import threading
from datetime import datetime, timezone
from decimal import Decimal

import pytest

from deltaforge_spark.sinks.ch_rowbinary import (
    ChEncodeError,
    decimal_str_to_unscaled,
    decode_rows,
    encode_rows,
    encode_value,
    layout_from_ddl_types,
    parse_ch_type,
    read_varuint,
    write_varuint,
)


def enc(ddl_type: str, v, nullable=None):
    spec, null_from_type = parse_ch_type(ddl_type)
    buf = bytearray()
    encode_value(buf, spec, null_from_type if nullable is None else nullable, v)
    return bytes(buf)


# ------------------------------------------------- byte-pinned vectors
# (each mirrors a reference rowbinary.rs test — same bytes, same rules)


class TestByteVectors:
    def test_int64_le(self):
        assert enc("Int64", 1) == struct.pack("<q", 1)

    def test_string_varuint_len(self):
        assert enc("String", "hi") == b"\x02hi"

    def test_nullable_null_is_single_one_byte(self):
        assert enc("Nullable(Int64)", None) == b"\x01"

    def test_nullable_present_prefixes_zero(self):
        assert enc("Nullable(Int64)", 5) == b"\x00" + struct.pack("<q", 5)

    def test_non_null_column_with_null_errors(self):
        with pytest.raises(ChEncodeError):
            enc("Int64", None)

    def test_decimal_encodes_unscaled_int64(self):
        assert enc("Decimal(12, 2)", "12.34") == struct.pack("<q", 1234)

    def test_decimal_negative_and_short_frac(self):
        assert decimal_str_to_unscaled("-1.2", 3) == -1200
        assert decimal_str_to_unscaled("5", 2) == 500

    def test_varuint_multibyte(self):
        buf = bytearray()
        write_varuint(buf, 300)
        assert bytes(buf) == b"\xac\x02"
        assert read_varuint(bytes(buf), 0) == (300, 2)

    def test_decimal_small_precision_is_int32(self):
        assert enc("Decimal(9, 2)", "1.50") == struct.pack("<i", 150)

    def test_decimal_wide_precision_is_int128(self):
        got = enc("Decimal(38, 9)", Decimal("-1.5"))
        assert got == (-1500000000).to_bytes(16, "little", signed=True)

    def test_decimal_extra_frac_digits_truncate_not_round(self):
        # rowbinary.rs truncates: "1.999" at scale 2 → 199, not 200
        assert decimal_str_to_unscaled("1.999", 2) == 199

    def test_uint8_and_bool_single_byte(self):
        assert enc("UInt8", 7) == b"\x07"
        assert enc("Bool", True) == b"\x01"

    def test_uint64_wraps_unsigned(self):
        assert enc("UInt64", 2**63) == struct.pack("<Q", 2**63)

    def test_int16_int32(self):
        assert enc("Int16", -2) == struct.pack("<h", -2)
        assert enc("Int32", 70000) == struct.pack("<i", 70000)

    def test_float64_le(self):
        assert enc("Float64", 1.5) == struct.pack("<d", 1.5)

    def test_datetime64_from_int_ms(self):
        assert enc("DateTime64(3)", 1700000000123) == struct.pack("<q", 1700000000123)

    def test_datetime64_from_naive_datetime_is_utc(self):
        dt = datetime(2023, 11, 14, 22, 13, 20, 123000)
        want = int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)
        assert enc("DateTime64(3)", dt) == struct.pack("<q", want)

    def test_datetime64_from_iso_string(self):
        ms = enc("DateTime64(3)", "2023-11-14T22:13:20.123Z")
        assert ms == struct.pack("<q", 1700000000123)

    def test_lowcardinality_string_is_plain_string(self):
        assert enc("LowCardinality(String)", "c") == b"\x01c"

    def test_string_non_string_values_become_json_text(self):
        # rowbinary.rs: numbers/bools/objects → JSON text
        assert enc("String", 42) == b"\x0242"
        assert enc("String", {"k": 1}) == b"\x07" + b'{"k":1}'

    def test_type_mismatch_errors(self):
        with pytest.raises(ChEncodeError):
            enc("Int64", "not a number")
        with pytest.raises(ChEncodeError):
            enc("Float64", "nope")
        with pytest.raises(ChEncodeError):
            enc("Decimal(12, 2)", [1, 2])

    def test_unsupported_type_rejected_at_parse(self):
        with pytest.raises(ValueError):
            parse_ch_type("Array(Int64)")


# ----------------------------------------------------- round-trip


class TestRoundTrip:
    LAYOUT = layout_from_ddl_types(
        [
            ("id", "Int64"),
            ("name", "Nullable(String)"),
            ("score", "Nullable(Float64)"),
            ("price", "Decimal(18, 4)"),
            ("flag", "UInt8"),
            ("at", "DateTime64(3)"),
            ("op", "LowCardinality(String)"),
        ]
    )

    def test_rows_round_trip(self):
        rows = [
            (1, "alice", 1.25, Decimal("99.5000"), 1, 1700000000000, "c"),
            (2, None, None, Decimal("-0.0001"), 0, 0, "d"),
            (3, "bé", 2.0, Decimal("12345678901234.5678"), 255, -1000, "u"),
        ]
        body = encode_rows(self.LAYOUT, rows)
        got = decode_rows(self.LAYOUT, body)
        assert [tuple(r.values()) for r in got] == [
            (1, "alice", 1.25, Decimal("99.5000"), 1, 1700000000000, "c"),
            (2, None, None, Decimal("-0.0001"), 0, 0, "d"),
            (3, "bé", 2.0, Decimal("12345678901234.5678"), 255, -1000, "u"),
        ]

    def test_encode_error_names_the_column(self):
        with pytest.raises(ChEncodeError, match="name"):
            encode_rows(
                layout_from_ddl_types([("name", "String")]), [(None,)]
            )


# ------------------------------------------- Spark sink over loopback HTTP


@pytest.fixture()
def feed(spark):
    rows = [
        ("c", 1000, None, (1, "a@x", 10.5)),
        ("u", 2000, (1, "a@x", 10.5), (1, "a2@x", 11.0)),
        ("c", 1500, None, (2, "b@x", None)),
        ("d", 3000, (2, "b@x", None), None),
    ]
    schema = (
        "op string, ts_ms long, before struct<id:long,email:string,bal:double>, "
        "after struct<id:long,email:string,bal:double>"
    )
    return spark.createDataFrame(rows, schema)


def _loopback_ch_server(layouts: dict):
    """Loopback ClickHouse HTTP endpoint that DECODES RowBinary bodies
    server-side (independent reading of the format spec) and parses
    JSONEachRow — so the client's bytes are verified, not trusted."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    state = {"ddl": [], "rb_rows": [], "json_rows": [], "tokens": set(), "deduped": 0}
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            qs = parse_qs(urlparse(self.path).query)
            with lock:
                if "query" not in qs:
                    state["ddl"].append(body.decode())
                else:
                    q = qs["query"][0]
                    token = qs["insert_deduplication_token"][0]
                    if token in state["tokens"]:
                        state["deduped"] += 1
                    else:
                        state["tokens"].add(token)
                        table = q.split("INTO ", 1)[1].split(" ")[0]
                        if q.endswith("FORMAT RowBinary"):
                            state["rb_rows"].extend(
                                decode_rows(layouts[table], body)
                            )
                        else:
                            state["json_rows"].extend(
                                json.loads(l)
                                for l in body.decode().splitlines()
                                if l.strip()
                            )
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state


class TestSparkRowBinarySink:
    def test_rowbinary_insert_decodes_server_side_with_jsoneachrow_parity(
        self, feed
    ):
        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            table_layout,
            write_clickhouse,
        )

        proj = clickhouse_rows(feed, ["id", "email", "bal"])
        layouts = {"dl.users": layout_from_ddl_types(table_layout(proj.schema))}
        srv, state = _loopback_ch_server(layouts)
        try:
            url = f"http://127.0.0.1:{srv.server_port}"
            ddl = write_clickhouse(
                proj.coalesce(1),
                http_ch_transport_factory(url),
                database="dl",
                table="users",
                mode="upsert",
                pk=["id"],
                batch_id=1,
                wire_format="rowbinary",
            )
            assert "CREATE TABLE IF NOT EXISTS `dl`.`users`" in ddl
            assert len(state["rb_rows"]) == 4

            # JSONEachRow parity: same projection through the other wire
            # format must describe the same rows
            write_clickhouse(
                proj.coalesce(1),
                http_ch_transport_factory(url),
                database="dl",
                table="users",
                mode="upsert",
                pk=["id"],
                batch_id=2,  # different token namespace, lands fully
                auto_create=False,
            )
            assert len(state["json_rows"]) == 4

            def norm_rb(r):
                return (
                    r["id"], r["email"], r["bal"], r["_op"],
                    r["_version"], r["_deleted"], r["_source_ts"],
                )

            def norm_json(r):
                # JSONEachRow carries _source_ts as an ISO string; the
                # RowBinary side as epoch-ms — normalize to epoch-ms
                ts = datetime.fromisoformat(r["_source_ts"]).replace(
                    tzinfo=timezone.utc
                )
                # to_json drops null fields, so absent keys = null
                return (
                    r.get("id"), r.get("email"), r.get("bal"), r["_op"],
                    r["_version"], r["_deleted"],
                    int(ts.timestamp() * 1000),
                )

            assert sorted(map(norm_rb, state["rb_rows"])) == sorted(
                map(norm_json, state["json_rows"])
            )
        finally:
            srv.shutdown()

    def test_rowbinary_replay_dedups_on_token(self, feed):
        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            table_layout,
            write_clickhouse,
        )

        proj = clickhouse_rows(feed, ["id", "email", "bal"])
        layouts = {"dl.users": layout_from_ddl_types(table_layout(proj.schema))}
        srv, state = _loopback_ch_server(layouts)
        try:
            url = f"http://127.0.0.1:{srv.server_port}"
            for _ in range(2):  # identical batch_id → identical tokens
                write_clickhouse(
                    proj.coalesce(1),
                    http_ch_transport_factory(url),
                    database="dl",
                    table="users",
                    mode="upsert",
                    pk=["id"],
                    batch_id=7,
                    auto_create=False,
                    wire_format="rowbinary",
                )
            assert len(state["rb_rows"]) == 4
            assert state["deduped"] >= 1
        finally:
            srv.shutdown()

    def _poison_proj(self, spark):
        """Projected-shape frame whose middle row cannot RowBinary-encode:
        _version is pinned non-Nullable UInt64 by table_layout, so a
        null there is a genuine encode-time failure (not a projection
        null that clickhouse_rows_with_dlq would have pre-cleaned)."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("email", T.StringType()),
                T.StructField("_op", T.StringType()),
                T.StructField("_version", T.LongType()),
                T.StructField("_deleted", T.IntegerType()),
                T.StructField("_source_ts", T.TimestampType()),
            ]
        )
        ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
        rows = [
            (1, "a@x", "c", 1000, 0, ts),
            (2, "b@x", "c", None, 0, ts),  # poison: null _version
            (3, "c@x", "c", 3000, 0, ts),
        ]
        return spark.createDataFrame(rows, schema)

    def test_encode_error_dlq_isolates_row_and_inserts_the_rest(self, spark):
        """reference sink.rs contract: a per-row encode failure goes to
        the DLQ; the good rows of the same chunk still insert."""
        from deltaforge_spark.sinks.clickhouse import (
            http_ch_transport_factory,
            table_layout,
            write_clickhouse,
        )

        proj = self._poison_proj(spark)
        layouts = {"dl.users": layout_from_ddl_types(table_layout(proj.schema))}
        srv, state = _loopback_ch_server(layouts)
        try:
            url = f"http://127.0.0.1:{srv.server_port}"
            write_clickhouse(
                proj.coalesce(1),
                http_ch_transport_factory(url),
                database="dl",
                table="users",
                mode="upsert",
                pk=["id"],
                batch_id=3,
                wire_format="rowbinary",
                encode_errors="dlq",
            )
            assert sorted(r["id"] for r in state["rb_rows"]) == [1, 3]
            assert len(state["json_rows"]) == 1
            dlq = state["json_rows"][0]
            assert "uint64" in dlq["error"].lower()
            assert '"id": 2' in dlq["payload"]
            assert any("__encode_dlq" in d for d in state["ddl"])
        finally:
            srv.shutdown()

    def test_encode_error_default_still_raises(self, spark):
        from deltaforge_spark.sinks.clickhouse import (
            http_ch_transport_factory,
            table_layout,
            write_clickhouse,
        )

        proj = self._poison_proj(spark)
        layouts = {"dl.users": layout_from_ddl_types(table_layout(proj.schema))}
        srv, state = _loopback_ch_server(layouts)
        try:
            url = f"http://127.0.0.1:{srv.server_port}"
            with pytest.raises(Exception, match="(?i)uint64"):
                write_clickhouse(
                    proj.coalesce(1),
                    http_ch_transport_factory(url),
                    database="dl",
                    table="users",
                    mode="upsert",
                    pk=["id"],
                    batch_id=4,
                    wire_format="rowbinary",
                )
        finally:
            srv.shutdown()

    def test_nullable_meta_alignment_matches_ddl(self, feed):
        """table_layout must mirror create_table_ddl exactly — a drifted
        Nullable flag silently corrupts every later column in the row."""
        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            create_table_ddl,
            table_layout,
        )
        from pyspark.sql import types as T

        proj = clickhouse_rows(feed, ["id", "email", "bal"])
        meta = {"_op", "_version", "_deleted", "_source_ts"}
        user_schema = T.StructType(
            [f for f in proj.schema.fields if f.name not in meta]
        )
        ddl = create_table_ddl("dl", "users", user_schema, ["id"], "upsert")
        for name, ddl_type in table_layout(proj.schema):
            assert f"`{name}` {ddl_type}" in ddl, (name, ddl_type, ddl)
