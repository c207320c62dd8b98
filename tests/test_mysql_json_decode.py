"""MySQL JSON-column decode fallback chain — mirrors
mysql_object.rs:54-72 handle_json + the _base64 blob wrap tests."""

import base64
import json

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.functions.typerules import (
    is_valid_json,
    mysql_json_decode,
    mysql_json_decode_binary,
)


def _decode(spark, values, fn=mysql_json_decode, typ="string"):
    df = spark.createDataFrame([(v,) for v in values], f"c {typ}")
    return [r["d"] for r in df.select(fn(F.col("c")).alias("d")).collect()]


def test_valid_json_documents_pass_through(spark):
    vals = ['{"a":1,"b":[1,2]}', "[1,2,3]", "42", "true", '"quoted"', "null"]
    assert _decode(spark, vals) == vals


def test_plain_text_becomes_json_string_value(spark):
    got = _decode(spark, ["not json", 'say "hi"\nplease', ""])
    assert got[0] == '"not json"'
    # full JSON escaping of quotes and newlines
    assert json.loads(got[1]) == 'say "hi"\nplease'
    assert got[2] == '""'
    # every output is valid JSON text
    df = spark.createDataFrame([(v,) for v in got], "c string")
    assert all(
        r["ok"] for r in df.select(is_valid_json(F.col("c")).alias("ok")).collect()
    )


def test_null_stays_null(spark):
    assert _decode(spark, [None]) == [None]


def test_binary_utf8_json_parses(spark):
    got = _decode(
        spark, [bytearray(b'{"k":1}')], fn=mysql_json_decode_binary, typ="binary"
    )
    assert got == ['{"k":1}']


def test_binary_non_utf8_base64_wrapped(spark):
    raw = bytes([0xFF, 0xFE, 0x00, 0x81])
    got = _decode(spark, [bytearray(raw)], fn=mysql_json_decode_binary, typ="binary")
    doc = json.loads(got[0])
    assert base64.b64decode(doc["_base64_json"]) == raw


def test_binary_utf8_non_json_becomes_string_value(spark):
    got = _decode(
        spark, [bytearray("héllo".encode())], fn=mysql_json_decode_binary, typ="binary"
    )
    assert json.loads(got[0]) == "héllo"
