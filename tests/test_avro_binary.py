"""Avro binary codec: spec-fixture bytes, type-matrix round-trip, and
the Spark mapInPandas framing path (reference avro.rs:3-270)."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

import pytest

from deltaforge_spark.sinks.avro_binary import (
    AvroBinaryCodec,
    avro_frame_rows,
    decode_confluent_frame,
    zigzag,
)
from deltaforge_spark.sinks.avro_schema import (
    InMemoryRegistry,
    SchemaRegistryClient,
    envelope_schema_for_struct,
    plan_avro_encoding,
)


# ----------------------------------------------------------- pure codec


def test_zigzag_spec_values():
    # Avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, 64->80 01
    assert zigzag(0) == b"\x00"
    assert zigzag(-1) == b"\x01"
    assert zigzag(1) == b"\x02"
    assert zigzag(-2) == b"\x03"
    assert zigzag(2) == b"\x04"
    assert zigzag(64) == b"\x80\x01"
    assert zigzag(-64) == b"\x7f"


def test_spec_record_fixture():
    """The worked example from the Avro specification: record
    {"a": 27, "b": "foo"} encodes to 36 06 66 6f 6f."""
    schema = {
        "type": "record",
        "name": "test",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    codec = AvroBinaryCodec(schema)
    assert codec.encode({"a": 27, "b": "foo"}) == b"\x36\x06foo"
    assert codec.decode(b"\x36\x06foo") == {"a": 27, "b": "foo"}


def test_union_branch_bytes():
    codec = AvroBinaryCodec(["null", "string"])
    assert codec.encode(None) == b"\x00"
    assert codec.encode("x") == b"\x02\x02x"
    assert codec.decode(b"\x00") is None
    assert codec.decode(b"\x02\x02x") == "x"


def test_array_map_encoding():
    codec = AvroBinaryCodec({"type": "array", "items": "long"})
    # count 3, items 1 2 3, terminator 0
    assert codec.encode([1, 2, 3]) == b"\x06\x02\x04\x06\x00"
    assert codec.decode(b"\x06\x02\x04\x06\x00") == [1, 2, 3]
    assert codec.encode([]) == b"\x00"

    mcodec = AvroBinaryCodec({"type": "map", "values": "int"})
    assert mcodec.decode(mcodec.encode({"k": 7, "z": -1})) == {"k": 7, "z": -1}


def test_type_matrix_roundtrip():
    """Every type the envelope generator can emit survives a round-trip."""
    schema = {
        "type": "record",
        "name": "Matrix",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "dec_str", "type": "string"},
            {"name": "dte", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "mp", "type": {"type": "map", "values": "long"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [{"name": "x", "type": ["null", "double"], "default": None}],
                },
            },
            {"name": "en", "type": {"type": "enum", "name": "Op", "symbols": ["c", "u", "d"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 2}},
        ],
    }
    codec = AvroBinaryCodec(json.dumps(schema))
    row = {
        "b": True,
        "i": -123,
        "l": 2**40,
        "f": 1.5,
        "d": -2.25,
        "s": "héllo",
        "by": b"\x00\xff",
        "dec_str": Decimal("12.3400"),
        "dte": dt.date(2024, 3, 1),
        "ts": dt.datetime(2024, 3, 1, 12, 0, 0),
        "opt": None,
        "arr": ["a", "b"],
        "mp": {"n": 9},
        "nested": {"x": 3.5},
        "en": "u",
        "fx": b"ok",
    }
    out = codec.decode(codec.encode(row))
    assert out["b"] is True and out["i"] == -123 and out["l"] == 2**40
    assert out["f"] == 1.5 and out["d"] == -2.25
    assert out["s"] == "héllo" and out["by"] == b"\x00\xff"
    assert out["dec_str"] == "12.3400"
    assert out["dte"] == (dt.date(2024, 3, 1) - dt.date(1970, 1, 1)).days
    assert out["ts"] == int(dt.datetime(2024, 3, 1, 12).timestamp() * 1000) or out[
        "ts"
    ] == 1709294400000  # naive-UTC interpretation
    assert out["opt"] is None
    assert out["arr"] == ["a", "b"] and out["mp"] == {"n": 9}
    assert out["nested"] == {"x": 3.5}
    assert out["en"] == "u" and out["fx"] == b"ok"


def test_named_type_reference_resolution():
    """A record referenced by name (legal Avro even though the generator
    inlines) resolves through the named-type registry."""
    schema = {
        "type": "record",
        "name": "Outer",
        "namespace": "t",
        "fields": [
            {
                "name": "one",
                "type": {
                    "type": "record",
                    "name": "P",
                    "fields": [{"name": "v", "type": "long"}],
                },
            },
            {"name": "two", "type": "P"},
        ],
    }
    codec = AvroBinaryCodec(schema)
    row = {"one": {"v": 1}, "two": {"v": 2}}
    assert codec.decode(codec.encode(row)) == row


# ------------------------------------------------------ Spark end-to-end


@pytest.fixture(scope="module")
def spark():
    from deltaforge_spark.session import get_spark

    return get_spark(app_name="avro-binary-test")


def test_envelope_frame_end_to_end(spark):
    """change-feed-shaped rows → generated envelope schema → registered
    subject → mapInPandas Avro frames → decode matches input."""
    from pyspark.sql import functions as F

    rows = [
        (
            {"id": 1, "name": "a", "amount": "10.50"},
            None,
            "c",
            1700000000000,
            "e-1",
        ),
        (
            {"id": 2, "name": None, "amount": "3.00"},
            {"id": 2, "name": "old", "amount": "2.00"},
            "u",
            1700000001000,
            "e-2",
        ),
    ]
    df = spark.createDataFrame(
        rows, "after struct<id:long,name:string,amount:string>, "
        "before struct<id:long,name:string,amount:string>, "
        "op string, ts_ms long, event_id string",
    )
    after_t = df.schema["after"].dataType

    reg = InMemoryRegistry()
    client = SchemaRegistryClient(reg.post)
    subject, schema_id, env = plan_avro_encoding(
        after_t, client, connector="mysql", db="testdb", table="orders",
        topic="cdc.orders",
    )
    assert subject == "cdc.orders-value" and schema_id == 1

    # envelope requires source/transaction/schema_version columns
    full = df.select(
        "before", "after",
        F.named_struct(
            F.lit("version"), F.lit("1.0"),
            F.lit("connector"), F.lit("mysql"),
            F.lit("name"), F.lit("df-pipeline"),
            F.lit("ts_ms"), F.lit(1700000000000).cast("long"),
            F.lit("db"), F.lit("testdb"),
            F.lit("schema"), F.lit(None).cast("string"),
            F.lit("table"), F.lit("orders"),
            F.lit("snapshot"), F.lit(None).cast("string"),
            F.lit("position"), F.named_struct(
                F.lit("server_id"), F.lit(1),
                F.lit("file"), F.lit("binlog.000001"),
                F.lit("pos"), F.lit(4).cast("long"),
                F.lit("gtid"), F.lit("uuid:1-5"),
                F.lit("row"), F.lit(0),
            ),
        ).alias("source"),
        "op", "ts_ms", "event_id",
        F.lit(None).cast("string").alias("schema_version"),
        F.lit(None).cast(
            "struct<id:string,total_order:long,data_collection_order:long>"
        ).alias("transaction"),
    )
    framed = avro_frame_rows(full, env, schema_id=schema_id, key_col="event_id")
    out = {r["key"]: bytes(r["value"]) for r in framed.collect()}
    assert set(out) == {"e-1", "e-2"}

    sid, rec = decode_confluent_frame(out["e-2"], env)
    assert sid == schema_id
    assert rec["op"] == "u" and rec["ts_ms"] == 1700000001000
    assert rec["after"] == {"id": 2, "name": None, "amount": "3.00"}
    assert rec["before"] == {"id": 2, "name": "old", "amount": "2.00"}
    assert rec["source"]["position"]["gtid"] == "uuid:1-5"
    assert rec["transaction"] is None

    sid1, rec1 = decode_confluent_frame(out["e-1"], env)
    assert rec1["before"] is None and rec1["after"]["id"] == 1


def test_frame_header_layout(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    framed = avro_frame_rows(df, schema, schema_id=0x01020304)
    val = bytes(framed.collect()[0]["value"])
    assert val[0] == 0 and val[1:5] == b"\x01\x02\x03\x04"
    assert val[5:] == b"\x02\x02x"


def test_declarative_avro_eos_end_to_end(spark, tmp_path):
    """Spec-driven exactly-once delivery with Avro value encoding: the
    kafka_eos sink registers the envelope schema with the (injected) SR,
    frames every value as Confluent Avro binary, and delivers inside
    committed transactions; frames decode back to the source events."""
    import pyspark.sql.functions as F

    from deltaforge_spark.control import PipelineManager
    from deltaforge_spark.sinks.kafka_eos import FileTransactionalBroker
    from deltaforge_spark.sources import snapshot_events

    base = spark.createDataFrame([(i, f"n{i}") for i in range(8)], ["id", "name"])
    ev = snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"),
        ts_ms=F.lit(1704067200000),
    )
    feed = str(tmp_path / "feed")
    ev.coalesce(1).write.parquet(feed)
    broker_dir = str(tmp_path / "broker")
    reg = InMemoryRegistry()
    spec = {
        "metadata": {"name": "avro-eos"},
        "spec": {
            "source": {"type": "stream_parquet", "path": feed},
            "processors": [
                {"type": "route", "topic": "t-avro", "key": "${event_id}"},
            ],
            "sinks": [
                {
                    "name": "k",
                    "type": "kafka_eos",
                    "spool_dir": broker_dir,
                    "topic": "t-avro",
                    "encoding": "avro",
                    "registry": reg,
                }
            ],
        },
    }
    mgr = PipelineManager(spark, str(tmp_path / "state"))
    mgr.create(spec)
    mgr.await_drained("avro-eos")

    # schema registered once under the topic_name subject
    assert "t-avro-value" in reg.subjects and reg.next_id == 2
    schema_str = next(iter(reg.ids))

    broker = FileTransactionalBroker(broker_dir)
    msgs = broker.read_committed()
    assert len(msgs) == 8
    assert {m["topic"] for m in msgs} == {"t-avro"}
    decoded = {}
    for m in msgs:
        sid, rec = decode_confluent_frame(m["value"], schema_str)
        assert sid == 1
        decoded[rec["after"]["id"]] = rec
    assert set(decoded) == set(range(8))
    assert decoded[3]["after"]["name"] == "n3" and decoded[3]["op"] in ("c", "r")
