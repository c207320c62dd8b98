"""Avro layer: Confluent framing + subject strategies (testable without
the spark-avro jar), and graceful gating when the jar is absent."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from deltaforge_spark.sinks.avro import (
    avro_available,
    confluent_frame,
    envelope_avro,
    subject_name,
)


def test_subject_strategies():
    assert subject_name("topic_name", topic="orders") == "orders-value"
    assert subject_name("topic_record", topic="orders", record_name="Order") == "orders-Order"
    assert subject_name("record", record_name="Order") == "Order"
    with pytest.raises(ValueError):
        subject_name("bogus")


def test_confluent_frame_header(spark):
    df = spark.createDataFrame([Row(payload=b"\x10\x20")])
    out = df.select(confluent_frame(F.col("payload"), 1234).alias("framed")).collect()[0]
    framed = bytes(out["framed"])
    assert framed[0] == 0  # magic byte
    assert int.from_bytes(framed[1:5], "big") == 1234  # schema id BE
    assert framed[5:] == b"\x10\x20"  # avro payload untouched


def test_envelope_avro_gated(spark):
    from deltaforge_spark.sources import snapshot_events

    ev = snapshot_events(
        spark.createDataFrame([(1, "a")], ["id", "name"]),
        table="t1",
        event_id=F.col("id").cast("string"),
    )
    if avro_available(spark):
        out = envelope_avro(ev, schema_id=7).select("value").collect()
        assert bytes(out[0]["value"])[0] == 0
    else:
        with pytest.raises(Exception):
            envelope_avro(ev, schema_id=7).collect()
