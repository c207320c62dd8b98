"""Avro schema generation: type-rule matrix over the FIXTURES.md
soak_customer all-types table, envelope record structure, SR client
caching — mirrors reference avro_types.rs / avro_schema.rs tests."""

import json

from pyspark.sql import types as T

from deltaforge_spark.sinks.avro import confluent_frame, subject_name
from deltaforge_spark.sinks.avro_schema import (
    ColumnDesc,
    InMemoryRegistry,
    SchemaRegistryClient,
    TypeConversionOpts,
    build_envelope_schema,
    build_value_schema,
    envelope_schema_for_struct,
    mysql_column_to_avro,
    postgres_column_to_avro,
    spark_type_to_avro,
)


def _t(field):
    """Unwrap the non-null branch of a field's type."""
    t = field["type"]
    if isinstance(t, list):
        assert t[0] == "null" and field["default"] is None
        return t[1]
    return t


# ------------------------------------------------------- MySQL type matrix


def test_mysql_soak_customer_type_matrix():
    """FIXTURES.md §3 all-types table through the MySQL rules."""
    cases = [
        (ColumnDesc("id", "int", nullable=False), "int"),
        (ColumnDesc("status", "tinyint"), "int"),
        (ColumnDesc("value", "decimal", precision=10, scale=4), "string"),
        (ColumnDesc("credit_score", "float"), "float"),
        (ColumnDesc("active", "boolean"), "boolean"),
        (ColumnDesc("preferences", "json"), "string"),
        (ColumnDesc("dob", "date"), {"type": "int", "logicalType": "date"}),
        (ColumnDesc("last_login", "datetime"), "string"),  # naive ts → string (safe)
        (
            ColumnDesc("created_at", "timestamp"),
            {"type": "long", "logicalType": "timestamp-millis"},
        ),
        (ColumnDesc("name", "varchar", column_type="varchar(255)"), "string"),
        (ColumnDesc("data", "text"), "string"),
    ]
    for col, want in cases:
        assert _t(mysql_column_to_avro(col)) == want, col.name


def test_mysql_unsigned_bigint_modes():
    col = ColumnDesc("big", "bigint", unsigned=True)
    assert _t(mysql_column_to_avro(col)) == "string"  # safe default
    long_mode = TypeConversionOpts(unsigned_bigint_mode="long")
    assert _t(mysql_column_to_avro(col, long_mode)) == "long"
    assert _t(mysql_column_to_avro(ColumnDesc("b", "bigint"))) == "long"
    assert _t(mysql_column_to_avro(ColumnDesc("i", "int", unsigned=True))) == "long"


def test_mysql_enum_modes():
    col = ColumnDesc("state", "enum", column_type="enum('a','b','c')")
    assert _t(mysql_column_to_avro(col)) == "string"
    strict = TypeConversionOpts(enum_mode="enum")
    assert _t(mysql_column_to_avro(col, strict)) == {
        "type": "enum",
        "name": "state_enum",
        "symbols": ["a", "b", "c"],
    }


# ---------------------------------------------------------- PG type matrix


def test_postgres_type_matrix():
    cases = [
        (ColumnDesc("a", "integer"), "int"),
        (ColumnDesc("b", "bigint"), "long"),
        (ColumnDesc("c", "double precision"), "double"),
        (ColumnDesc("d", "numeric", precision=10, scale=2), "string"),
        (ColumnDesc("e", "uuid"), {"type": "string", "logicalType": "uuid"}),
        (ColumnDesc("f", "jsonb"), "string"),
        (
            ColumnDesc("g", "timestamptz"),
            {"type": "long", "logicalType": "timestamp-micros"},
        ),
        (ColumnDesc("h", "timestamp without time zone"), "string"),
        (ColumnDesc("i", "bytea"), "bytes"),
        (ColumnDesc("j", "hstore"), {"type": "map", "values": "string"}),
        (ColumnDesc("k", "int8range"), "string"),
        (ColumnDesc("l", "character varying(64)"), "string"),
        (ColumnDesc("m", "inet"), "string"),
    ]
    for col, want in cases:
        assert _t(postgres_column_to_avro(col)) == want, col.name


def test_postgres_array_becomes_avro_array():
    col = ColumnDesc("tags", "text[]", is_array=True, element_type="text")
    assert _t(postgres_column_to_avro(col)) == {"type": "array", "items": "string"}
    col2 = ColumnDesc("nums", "integer[]", is_array=True, element_type="integer")
    assert _t(postgres_column_to_avro(col2)) == {"type": "array", "items": "int"}


# ------------------------------------------------------- envelope assembly


def test_build_mysql_envelope_schema_structure():
    """Mirrors avro_schema.rs build_mysql_envelope_schema_parses."""
    value = build_value_schema(
        "mysql",
        "shop",
        "orders",
        [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"], "default": None},
        ],
    )
    env = build_envelope_schema("mysql", "shop", "orders", value)
    assert env["name"] == "Envelope"
    assert env["namespace"] == "deltaforge.cdc.mysql.shop.orders"
    names = [f["name"] for f in env["fields"]]
    assert names == [
        "before", "after", "source", "op", "ts_ms",
        "event_id", "schema_version", "transaction",
    ]
    before, after = env["fields"][0], env["fields"][1]
    # Before/After inlined as independent records — no Ref nodes
    assert _t(before)["name"] == "BeforeValue"
    assert _t(after)["name"] == "AfterValue"
    assert _t(before)["namespace"] == "deltaforge.mysql.shop.orders"
    assert _t(before)["fields"] == _t(after)["fields"]
    # connector-specific position inside source
    src = env["fields"][2]["type"]
    pos = next(f for f in src["fields"] if f["name"] == "position")
    assert _t(pos)["namespace"] == "deltaforge.cdc.mysql"
    pos_fields = {f["name"] for f in _t(pos)["fields"]}
    assert pos_fields == {"server_id", "file", "pos", "gtid", "row"}
    # whole thing serializes
    json.dumps(env)


def test_postgres_position_schema():
    env = build_envelope_schema("postgresql", "db", "t", build_value_schema("postgresql", "db", "t", []))
    src = env["fields"][2]["type"]
    pos = next(f for f in src["fields"] if f["name"] == "position")
    assert {f["name"] for f in _t(pos)["fields"]} == {"lsn", "tx_id", "xmin"}
    assert _t(pos)["namespace"] == "deltaforge.cdc.postgres"


def test_generic_connector_position_fallback():
    env = build_envelope_schema("changefeed", "db", "t", build_value_schema("changefeed", "db", "t", []))
    src = env["fields"][2]["type"]
    pos = next(f for f in src["fields"] if f["name"] == "position")
    assert {f["name"] for f in _t(pos)["fields"]} == {"sequence"}


def test_envelope_from_spark_struct():
    """Path B: the envelope's Spark row schema drives the Value record."""
    row = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("balance", T.DecimalType(10, 2), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField("meta", T.StructType([T.StructField("k", T.StringType())]), True),
        ]
    )
    env = envelope_schema_for_struct("mysql", "shop", "orders", row)
    val = _t(env["fields"][1])  # after
    by_name = {f["name"]: f for f in val["fields"]}
    assert by_name["id"]["type"] == "long"
    assert _t(by_name["balance"]) == "string"  # decimal-as-string policy
    assert _t(by_name["tags"]) == {"type": "array", "items": "string"}
    assert _t(by_name["meta"])["type"] == "record"


def test_spark_map_type():
    assert spark_type_to_avro(T.MapType(T.StringType(), T.LongType())) == {
        "type": "map",
        "values": "long",
    }


# --------------------------------------------- SR client + frame end-to-end


def test_sr_client_caches_subject(spark):
    reg = InMemoryRegistry()
    client = SchemaRegistryClient(reg.post)
    env = envelope_schema_for_struct(
        "mysql", "shop", "orders", T.StructType([T.StructField("id", T.LongType())])
    )
    subject = subject_name("topic_name", topic="shop.orders")
    sid = client.register(subject, env)
    assert sid == 1
    # cache hit: no second POST
    assert client.register(subject, env) == 1
    assert reg.posts == 1
    # Confluent ids are global per schema text: identical text under a
    # new subject returns the same id (and adds a subject-version row)
    assert client.register("other-value", env) == 1
    assert reg.subjects.keys() == {subject, "other-value"}


def test_plan_avro_encoding_end_to_end():
    from deltaforge_spark.sinks.avro_schema import plan_avro_encoding

    reg = InMemoryRegistry()
    client = SchemaRegistryClient(reg.post)
    row = T.StructType([T.StructField("id", T.LongType(), False)])
    subject, sid, env = plan_avro_encoding(
        row, client, connector="mysql", db="shop", table="orders",
        topic="shop.orders", strategy="topic_record",
    )
    assert subject == "shop.orders-deltaforge.cdc.mysql.shop.orders.Envelope"
    assert sid == 1
    assert env["name"] == "Envelope"
    # a second pipeline start reuses the cache — no new POST
    plan_avro_encoding(
        row, client, connector="mysql", db="shop", table="orders",
        topic="shop.orders", strategy="topic_record",
    )
    assert reg.posts == 1


def test_confluent_frame_wire_format(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(b"avrobytes",)], ["payload"])
    out = df.select(confluent_frame(F.col("payload"), 42).alias("framed")).collect()
    framed = bytes(out[0]["framed"])
    assert framed[0] == 0
    assert int.from_bytes(framed[1:5], "big") == 42
    assert framed[5:] == b"avrobytes"
