"""Routing template + outbox transform semantics — mirrors
common/src/routing.rs:340-527 and processors/src/outbox.rs tests."""

import pyspark.sql.functions as F
from pyspark.sql import Row

from deltaforge_spark.envelope import finish_envelope, source_col
from deltaforge_spark.operators import (
    OutboxSpec,
    compile_template,
    outbox_transform,
    with_routing,
)


def test_static_template_constant_folds(spark):
    df = spark.range(1).select(compile_template("static-topic").alias("t"))
    assert df.collect()[0]["t"] == "static-topic"


def test_strict_null_propagates(spark):
    df = spark.createDataFrame([Row(x=None), Row(x="v")])
    out = df.select(compile_template("p-${x}", strict=True).alias("t")).collect()
    assert [r["t"] for r in out] == [None, "p-v"]


def test_lenient_empty_string(spark):
    df = spark.createDataFrame([Row(x=None), Row(x="v")])
    out = df.select(compile_template("p-${x}", strict=False).alias("t")).collect()
    assert [r["t"] for r in out] == ["p-", "p-v"]


def test_number_stringification(spark):
    df = spark.createDataFrame([Row(n=42)])
    assert df.select(compile_template("k-${n}").alias("t")).collect()[0]["t"] == "k-42"


def _outbox_events(spark, rows):
    df = spark.createDataFrame(rows)
    ev = df.select(
        F.lit("c").alias("op"),
        F.lit(1000).cast("long").alias("ts_ms"),
        F.lit(None).cast("string").alias("before"),
        F.struct(*df.columns).alias("after"),
        source_col("test", "p", "appdb", "outbox").alias("source"),
        F.col("aggregate_id").cast("string").alias("event_id"),
    )
    return finish_envelope(ev)


def test_outbox_topic_cascade_and_headers(spark):
    rows = [
        Row(aggregate_type="order", aggregate_id="1", event_type="created",
            payload='{"a":1}', topic=None),
        Row(aggregate_type="user", aggregate_id="2", event_type="updated",
            payload='{"b":2}', topic="explicit-topic"),
    ]
    ev = _outbox_events(spark, rows)
    # template wins over topic column
    out = outbox_transform(ev, OutboxSpec(topic_template="t-${after.aggregate_type}"))
    got = {r["event_id"]: r for r in out.collect()}
    assert got["1"]["routing"]["topic"] == "t-order"
    assert got["2"]["routing"]["topic"] == "t-user"
    assert got["1"]["routing"]["key"] == "1"
    assert got["1"]["routing"]["headers"]["df-event-type"] == "created"
    assert got["1"]["after"] == '{"a":1}'
    # no template: topic column, then default
    out2 = outbox_transform(ev, OutboxSpec(default_topic="fallback"))
    got2 = {r["event_id"]: r for r in out2.collect()}
    assert got2["1"]["routing"]["topic"] == "fallback"
    assert got2["2"]["routing"]["topic"] == "explicit-topic"


def test_outbox_strict_flags_missing(spark):
    rows = [
        Row(aggregate_type="order", aggregate_id=None, event_type="created",
            payload='{"a":1}', topic="t"),
        Row(aggregate_type="order", aggregate_id="2", event_type="c",
            payload='{"b":2}', topic="t"),
    ]
    out = outbox_transform(_outbox_events(spark, rows), OutboxSpec(strict=True))
    errs = {r["aggregate_id"]: r["_outbox_error"] for r in out.collect()}
    assert errs[None] is True
    assert errs["2"] is False


def test_with_routing_headers(spark):
    from deltaforge_spark.sources import snapshot_events

    base = spark.createDataFrame([Row(id=7, name="x")])
    ev = snapshot_events(base, table="t1", event_id=F.col("id").cast("string"))
    out = with_routing(
        ev,
        topic_template="${source.db}.${source.table}",
        key_template="${after.id}",
        headers={"h1": "v-${after.name}"},
    ).collect()[0]
    assert out["routing"]["topic"] == "testdb.t1"
    assert out["routing"]["key"] == "7"
    assert out["routing"]["headers"]["h1"] == "v-x"
