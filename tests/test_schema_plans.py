"""Schema registry / sensing / drift + the YAML pipeline compiler."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Row

from deltaforge_spark.plans import compile_pipeline, load_spec
from deltaforge_spark.schema import (
    SchemaRegistry,
    classify_map_vs_struct,
    detect_drift,
    infer_json_schema,
    observe_shapes,
)
from deltaforge_spark.sinks import fan_out_batch


def test_registry_versioning(spark, tmp_path):
    reg = SchemaRegistry(spark, str(tmp_path / "registry"))
    s1 = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    e1 = reg.register("db1", "t1", s1)
    assert (e1["version"], e1["sequence"]) == (1, 1)
    # same fingerprint -> idempotent
    assert reg.register("db1", "t1", s1)["version"] == 1
    # field order must not change the fingerprint
    s1b = T.StructType([T.StructField("b", T.StringType()), T.StructField("a", T.LongType())])
    assert reg.register("db1", "t1", s1b)["version"] == 1
    # new column -> version 2, fresh global sequence
    s2 = T.StructType(s1.fields + [T.StructField("c", T.DoubleType())])
    e2 = reg.register("db1", "t1", s2)
    assert (e2["version"], e2["sequence"]) == (2, 2)
    # other table gets the next global sequence
    assert reg.register("db1", "t2", s1)["sequence"] == 3
    cur = reg.current("db1", "t1")
    assert cur["version"] == 2


def test_registry_stamp(spark, tmp_path):
    reg = SchemaRegistry(spark, str(tmp_path / "registry"))
    s1 = T.StructType([T.StructField("a", T.LongType())])
    e = reg.register("db1", "t1", s1)
    df = spark.createDataFrame([Row(x=1)])
    out = reg.stamp(df, "db1", "t1").collect()[0]
    assert out["schema_version"] == e["fingerprint"]
    assert out["schema_sequence"] == e["sequence"]


def test_observe_shapes_and_infer(spark):
    df = spark.createDataFrame(
        [Row(p='{"a": 1, "b": "x"}'), Row(p='{"b": "y", "a": 2}'), Row(p='{"a": 1}')]
    )
    shapes = observe_shapes(df, "p")
    assert shapes.count() == 2  # {a,b} and {a} (key order normalized)
    schema = infer_json_schema(spark, df, "p")
    assert set(schema.fieldNames()) == {"a", "b"}


def test_map_vs_struct(spark):
    fixed = spark.createDataFrame([Row(p='{"a":1,"b":2}')] * 10)
    assert classify_map_vs_struct(fixed, "p", key_cardinality_threshold=5).collect()[0]["is_map"] is False
    dynamic = spark.createDataFrame([Row(p=f'{{"user_{i}": 1}}') for i in range(50)])
    assert classify_map_vs_struct(dynamic, "p", key_cardinality_threshold=5).collect()[0]["is_map"] is True


def test_drift_report(spark):
    declared = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType()),
            T.StructField("gone", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [Row(payload=Row(id=1, name="a", extra=True)), Row(payload=Row(id=None, name="b", extra=False))]
    )
    report = {(r["column"], r["issue"]) for r in detect_drift(df, "payload", declared).collect()}
    assert ("extra", "undeclared_column") in report
    assert ("gone", "missing_column") in report
    assert ("id", "unexpected_nulls") in report


SPEC_YAML = """
metadata: {name: orders-cdc}
spec:
  source: {type: snapshot, table: orders, db: testdb, event_id_col: o_orderkey}
  processors:
    - type: filter
      ops: [r]
      fields: [{field: o_totalprice, op: gte, value: 1000}]
    - type: route
      topic: "df-${source.table}-${op}"
      key: "${after.o_orderkey}"
    - {type: envelope, kind: native}
  sinks:
    - {name: out, type: parquet, path: "${ENV:TEST_OUT_DIR}/lake"}
  commit_policy: {kind: required}
"""


def test_yaml_pipeline_end_to_end(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("TEST_OUT_DIR", str(tmp_path))
    spec = load_spec(SPEC_YAML)
    program, sinks, policy = compile_pipeline(spec)
    df = program(spark, sf_dir)
    fan_out_batch(df, 0, sinks, policy=policy)
    back = spark.read.parquet(f"{tmp_path}/lake")
    assert back.count() == df.count() > 0
    row = back.select("routing.topic", "value").collect()[0]
    assert row["topic"] == "df-orders-r"
    assert '"op":"r"' in row["value"]


def test_compiler_quality_and_pii_processors(spark, sf_dir, tmp_path):
    """The YAML spec surface accepts the round-3 training-data
    processors: a per-row quality gate and a PII redaction step."""
    import json as _json

    spec = load_spec(
        """
metadata: {name: qp}
spec:
  source: {type: parquet, table: documents}
  processors:
    - {type: quality_filter, column: text, gates: [ok_word_count, ok_stopwords]}
    - {type: pii_redact, column: text}
  sinks:
    - {name: out, type: noop}
"""
    )
    program, sinks, policy = compile_pipeline(spec)
    df = program(spark, sf_dir)
    n = df.count()
    assert 0 < n  # gate keeps the quality docs
    from deltaforge_spark.sources import read_table

    assert n < read_table(spark, sf_dir, "documents").count()
