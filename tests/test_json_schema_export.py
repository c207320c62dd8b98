"""JSON Schema export (reference json_schema.rs:82-196): inferred
payload schema → draft-2020-12 subset with required/items/format and a
depth limit."""

import json

from pyspark.sql import types as T

from deltaforge_spark.schema import infer_json_schema, to_json_schema, to_json_schema_string


def test_scalar_and_struct_mapping():
    dt = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType(), nullable=True),
            T.StructField("score", T.DoubleType(), nullable=True),
            T.StructField("active", T.BooleanType(), nullable=True),
            T.StructField("blob", T.BinaryType(), nullable=True),
            T.StructField("tags", T.ArrayType(T.StringType()), nullable=True),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.IntegerType(), nullable=False)]),
                nullable=True,
            ),
        ]
    )
    js = to_json_schema(dt)
    assert js["$schema"].endswith("2020-12/schema")
    assert js["type"] == "object"
    p = js["properties"]
    assert p["id"] == {"type": "integer"}
    assert p["name"] == {"type": "string"}
    assert p["score"] == {"type": "number"}
    assert p["active"] == {"type": "boolean"}
    assert p["blob"]["format"] == "byte" and p["blob"]["type"] == "string"
    assert p["tags"] == {"type": "array", "items": {"type": "string"}}
    assert p["nested"]["required"] == ["x"]
    assert js["required"] == ["id"]


def test_depth_limit_degrades_to_description():
    dt = T.StructType([T.StructField("leaf", T.StringType())])
    for _ in range(12):
        dt = T.StructType([T.StructField("wrap", dt)])
    js = to_json_schema(dt)
    s = json.dumps(js)
    assert "(depth limit reached)" in s


def test_map_is_open_object():
    js = to_json_schema(T.MapType(T.StringType(), T.StringType()))
    assert js["type"] == "object" and js["additionalProperties"] is True


def test_export_composes_with_inference(spark):
    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": {"c": "x"}, "arr": [1.5]}',),
            ('{"a": 2, "b": {"c": "y"}, "arr": []}',),
        ],
        "payload string",
    )
    inferred = infer_json_schema(spark, df, "payload")
    js = to_json_schema(inferred)
    assert js["type"] == "object"
    assert js["properties"]["a"] == {"type": "integer"}
    assert js["properties"]["b"]["properties"]["c"] == {"type": "string"}
    assert js["properties"]["arr"] == {"type": "array", "items": {"type": "number"}}
    # stable string form for registry storage
    assert json.loads(to_json_schema_string(inferred)) == js
