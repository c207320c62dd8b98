"""Delivery semantics: fan-out, commit policy, per-sink offsets,
DLQ split, lake partitioning — mirrors coordinator.rs unit tests."""

import os

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.sinks import (
    CommitPolicy,
    OffsetStore,
    SinkSpec,
    fan_out_batch,
    split_dlq,
    write_lake,
)
from deltaforge_spark.sinks.kafka import kafka_payload
from deltaforge_spark.operators import envelope_native, with_routing
from deltaforge_spark.sources import snapshot_events


@pytest.fixture()
def events(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "name"])
    return snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )


def test_fan_out_all_success(events, tmp_path):
    seen = {}

    def mk(name):
        def w(df):
            seen[name] = df.count()

        return w

    offsets = OffsetStore(str(tmp_path / "offsets.json"))
    out = fan_out_batch(
        events, 7, [SinkSpec("s1", mk("s1")), SinkSpec("s2", mk("s2"))], offsets=offsets
    )
    assert out == {"s1": True, "s2": True}
    assert seen == {"s1": 3, "s2": 3}
    assert offsets.committed("s1") == 7
    assert offsets.resume_point(["s1", "s2"]) == 7


def test_commit_policy_required_fails_batch(events, tmp_path):
    def boom(df):
        raise IOError("sink down")

    def ok(df):
        df.count()

    offsets = OffsetStore(str(tmp_path / "offsets.json"))
    with pytest.raises(RuntimeError, match="commit policy required unmet"):
        fan_out_batch(
            events,
            3,
            [SinkSpec("good", ok), SinkSpec("bad", boom, required=True)],
            offsets=offsets,
        )
    # successful sink still committed its offset; resume = MIN = -1 replays for bad
    assert offsets.committed("good") == 3
    assert offsets.resume_point(["good", "bad"]) == -1


def test_commit_policy_optional_sink_tolerated(events):
    def boom(df):
        raise IOError("optional sink down")

    out = fan_out_batch(
        events,
        1,
        [SinkSpec("main", lambda df: df.count()), SinkSpec("side", boom, required=False)],
    )
    assert out == {"main": True, "side": False}


def test_commit_policy_quorum(events):
    def boom(df):
        raise IOError("x")

    sinks = [
        SinkSpec("a", lambda df: df.count(), required=False),
        SinkSpec("b", boom, required=False),
        SinkSpec("c", lambda df: df.count(), required=False),
    ]
    out = fan_out_batch(events, 1, sinks, policy=CommitPolicy("quorum", quorum=2))
    assert sum(out.values()) == 2
    with pytest.raises(RuntimeError):
        fan_out_batch(events, 2, sinks, policy=CommitPolicy("quorum", quorum=3))


def test_per_sink_filter(events):
    seen = {}
    sinks = [
        SinkSpec(
            "only_id_gt_1",
            lambda df: seen.__setitem__("n", df.count()),
            filter=lambda df: df.filter(F.col("after.id") > 1),
        )
    ]
    fan_out_batch(events, 1, sinks)
    assert seen["n"] == 2


def test_dlq_split(events):
    flagged = events.withColumn("_err", F.col("after.id") == 2)
    ok, bad = split_dlq(flagged, "_err")
    assert ok.count() == 2
    assert bad.count() == 1


def test_lake_partitioning(events, tmp_path):
    path = str(tmp_path / "lake")
    write_lake(events, path)
    # hive layout table=t1/year=2024/month=1/day=1
    assert os.path.isdir(f"{path}/table=t1/year=2024/month=1/day=1")
    back = events.sparkSession.read.parquet(path)
    assert back.count() == 3
    assert {"table", "year", "month", "day"} <= set(back.columns)


def test_kafka_payload_shape(events):
    routed = with_routing(
        envelope_native(events),
        topic_template="t-${source.table}",
        key_template="${after.id}",
        headers={"h": "v"},
    )
    out = kafka_payload(routed)
    assert out.columns == ["key", "value", "topic", "headers"]
    row = out.filter(F.col("key") == "1").collect()[0]
    assert row["topic"] == "t-t1"
    assert '"op":"r"' in row["value"]
    assert row["headers"][0]["key"] == "h"
    assert bytes(row["headers"][0]["value"]) == b"v"


def test_ordered_for_delivery_per_key_source_order(spark):
    """Per-PK ordering guarantee (guarantees.md:47-51): after an
    arbitrary shuffle, each key's rows reach the partition-local writer
    in source order, and one key never spans two partitions."""
    import random

    from deltaforge_spark.sinks.foreach import ordered_for_delivery

    rows = [(f"k{i % 7}", i, f"v{i}") for i in range(500)]
    random.Random(13).shuffle(rows)
    df = spark.createDataFrame(rows, ["key", "seq", "v"]).repartition(16)
    out = ordered_for_delivery(df, key_cols=["key"], order_col="seq")

    def check(rows_iter):
        last = {}
        keys_here = set()
        for r in rows_iter:
            assert last.get(r.key, -1) < r.seq, f"out of order for {r.key}"
            last[r.key] = r.seq
            keys_here.add(r.key)
        yield (tuple(sorted(keys_here)),)

    per_part = out.rdd.mapPartitions(check).collect()
    seen = [ks for (ks,) in per_part if ks]
    flat = [k for ks in seen for k in ks]
    assert len(flat) == len(set(flat)), "a key spans multiple partitions"
    assert set(flat) == {f"k{i}" for i in range(7)}
