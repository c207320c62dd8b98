"""Rolling lake writer pool (sinks/rolling.py): the should_roll trigger
matrix mirrors reference rolling.rs:71-161; sink-level tests pin the
append→sweep lifecycle, atomic visibility, final flush, and restart
resume (writer_pool.rs semantics)."""

import glob
import json
import os

import pyspark.sql.functions as F

from deltaforge_spark.checkpoints import MemCheckpointStore
from deltaforge_spark.sinks.rolling import RollingConfig, RollingLakeSink, should_roll

CFG = RollingConfig(max_bytes=1_000, max_events=100, max_age_ms=60_000, idle_age_ms=30_000)


# ---------------------------------------------------- trigger matrix


def test_does_not_roll_empty_writer():
    # rolling.rs:84-98 — even past every threshold, 0 events never rolls
    assert should_roll(CFG, 999, 0, 0, 0, 120_000) is None


def test_rolls_on_bytes():
    # rolling.rs:100-111
    assert should_roll(CFG, 1_000, 1, 0, 0, 0) == "bytes"
    assert should_roll(CFG, 9_999, 1, 0, 0, 0) == "bytes"


def test_rolls_on_event_count():
    # rolling.rs:113-120
    assert should_roll(CFG, 0, 100, 0, 0, 0) == "events"


def test_rolls_on_age():
    # rolling.rs:122-130 — 60s since the file opened
    assert should_roll(CFG, 0, 1, 0, 60_000, 60_000) == "age"


def test_rolls_on_idle():
    # rolling.rs:132-141 — 30s+ since the last event
    assert should_roll(CFG, 0, 5, 1_000, 1_000, 32_000) == "idle"


def test_idle_does_not_trigger_before_threshold():
    # rolling.rs:143-149
    assert should_roll(CFG, 0, 5, 1_000, 1_000, 16_000) is None


def test_bytes_takes_precedence_over_age():
    # rolling.rs:151-160 — both bytes and age trigger; bytes wins
    assert should_roll(CFG, 5_000, 50, 0, 120_000, 120_000) == "bytes"


# ---------------------------------------------------- sink lifecycle


def _docs(spark, ids, tbl="a", ts0=0):
    return spark.createDataFrame(
        [(i, tbl if i % 2 == 0 else "b", ts0 + i) for i in ids], ["id", "tbl", "ts"]
    )


def test_events_rolling_and_final_flush(spark, tmp_path):
    """Cumulative event counts roll at the threshold; close() flushes
    the remainder with reason 'final'; every input row lands in exactly
    one visible file."""
    sink = RollingLakeSink(
        spark,
        str(tmp_path / "lake"),
        ["tbl"],
        cfg=RollingConfig(max_events=6, max_bytes=1 << 40, max_age_ms=1 << 40, idle_age_ms=1 << 40),
        clock="event",
        ts_col="ts",
    )
    # 3 batches x 4 rows = 12 rows, 2 per table per batch
    for b in range(3):
        sink.process_batch(_docs(spark, range(b * 4, b * 4 + 4)), b)
    sink.close()

    reasons = [(m["tbl"], m["reason"], m["n_events"]) for m in sink.manifest]
    # each table accumulates 2/batch: hits 6 at batch 2 -> 'events' roll
    assert ("a", "events", 6) in reasons and ("b", "events", 6) in reasons
    assert all(r != "final" for _, r, _ in reasons)  # nothing left over

    visible = spark.read.parquet(str(tmp_path / "lake" / "data"))
    assert visible.count() == 12
    # no partial/staged data visible, staging fully drained
    assert glob.glob(str(tmp_path / "lake" / "_staging" / "batch-*" / "tbl=*")) == []


def test_idle_partition_rolls_without_new_rows(spark, tmp_path):
    """A low-volume partition with no rows in later batches still rolls
    once event-time advances past idle_age (writer_pool.rs step 4)."""
    sink = RollingLakeSink(
        spark,
        str(tmp_path / "lake"),
        ["tbl"],
        cfg=RollingConfig(max_events=1 << 40, max_bytes=1 << 40, max_age_ms=1 << 40, idle_age_ms=1_000),
        clock="event",
        ts_col="ts",
    )
    only_a = spark.createDataFrame([(1, "a", 100)], ["id", "tbl", "ts"])
    sink.process_batch(only_a, 0)
    assert sink.manifest == []  # age 0 < idle threshold
    only_b = spark.createDataFrame([(2, "b", 5_000)], ["id", "tbl", "ts"])
    sink.process_batch(only_b, 1)  # event time advances to 5000
    idle_rolls = [m for m in sink.manifest if m["reason"] == "idle"]
    assert [(m["tbl"], m["n_events"]) for m in idle_rolls] == [("a", 1)]


def test_file_seq_continues_after_roll_and_restart(spark, tmp_path):
    """The per-partition file sequence survives both a roll and a sink
    restart from the same checkpoint store (resume contract)."""
    store = MemCheckpointStore()
    cfg = RollingConfig(max_events=2, max_bytes=1 << 40, max_age_ms=1 << 40, idle_age_ms=1 << 40)
    path = str(tmp_path / "lake")
    sink = RollingLakeSink(spark, path, ["tbl"], cfg=cfg, clock="event", ts_col="ts", store=store)
    two = spark.createDataFrame([(1, "a", 1), (2, "a", 2)], ["id", "tbl", "ts"])
    sink.process_batch(two, 0)
    assert [m["file_seq"] for m in sink.manifest] == [1]

    # restart: a NEW sink over the same store and path
    sink2 = RollingLakeSink(spark, path, ["tbl"], cfg=cfg, clock="event", ts_col="ts", store=store)
    sink2.process_batch(two.withColumn("id", F.col("id") + 10), 1)
    assert [m["file_seq"] for m in sink2.manifest] == [2]
    files = sorted(os.path.basename(p) for p in glob.glob(f"{path}/data/tbl=a/*.parquet"))
    assert files[0].startswith("f00001-") and files[1].startswith("f00002-")


def test_manifest_jsonl_matches_memory(spark, tmp_path):
    sink = RollingLakeSink(
        spark,
        str(tmp_path / "lake"),
        ["tbl"],
        cfg=RollingConfig(max_events=1, max_bytes=1 << 40, max_age_ms=1 << 40, idle_age_ms=1 << 40),
        clock="event",
        ts_col="ts",
    )
    sink.process_batch(spark.createDataFrame([(1, "a", 1)], ["id", "tbl", "ts"]), 0)
    with open(tmp_path / "lake" / "_manifest.jsonl") as f:
        on_disk = [json.loads(line) for line in f]
    assert on_disk == sink.manifest


def test_rolling_sink_behind_real_streaming_query(spark, tmp_path):
    """End-to-end through an ACTUAL Structured Streaming query: file
    stream → writeStream.foreachBatch(rolling pool) — the production
    wiring, not a hand-driven batch loop. Every streamed row lands
    exactly once in the visible tree, staging drains, the manifest
    accounts for all rows."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from deltaforge_spark.checkpoints import MemCheckpointStore
    from deltaforge_spark.sinks.rolling import RollingConfig, RollingLakeSink

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tbl", T.StringType()),
            T.StructField("ts", T.LongType()),
        ]
    )
    in_dir = str(tmp_path / "in")
    rows = [(i, "a" if i % 2 == 0 else "b", i) for i in range(40)]
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(in_dir)

    lake = str(tmp_path / "lake")
    sink = RollingLakeSink(
        spark,
        lake,
        ["tbl"],
        cfg=RollingConfig(
            max_events=8, max_bytes=1 << 40, max_age_ms=1 << 40, idle_age_ms=1 << 40
        ),
        clock="event",
        ts_col="ts",
        store=MemCheckpointStore(),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, bid: sink.process_batch(df, bid))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink.close()

    visible = spark.read.parquet(f"{lake}/data")
    assert visible.count() == 40
    assert sorted(r["id"] for r in visible.collect()) == list(range(40))
    assert sum(m["n_events"] for m in sink.manifest) == 40
    assert {m["reason"] for m in sink.manifest} <= {"events", "final"}
    import glob as _g

    assert _g.glob(f"{lake}/_staging/batch-*/tbl=*") == []


def test_replayed_micro_batch_does_not_duplicate_through_fan_out(spark, tmp_path):
    """The compiled rolling SinkSpec keys replay skip on the REAL
    micro-batch id delivered by fan_out_batch (SinkSpec.write_batch) —
    a replayed batch N must hit the pool's `batch_id <= last_batch`
    skip, never restage its rows under a locally re-counted id."""
    from deltaforge_spark.plans.refspec import RefSink, _lower_sink
    from deltaforge_spark.sinks.foreach import fan_out_batch

    rs = RefSink(
        kind="s3",
        id="lake",
        required=True,
        envelope="native",
        type_prefix=None,
        encoding="json",
        topic_template=None,
        key_template=None,
        exactly_once=False,
        config={
            "prefix": str(tmp_path / "lake"),
            "rolling": {"max_bytes": 10**9, "max_events": 10**9,
                        "max_age_ms": 10**9, "idle_age_ms": 10**9,
                        "partition_by": ["table"]},
        },
    )
    spec = _lower_sink(rs, "p", {})
    assert spec.write_batch is not None

    df = spark.createDataFrame(
        [("r", 1, "{}", "{\"v\": 1}", "e1")],
        "op string, ts_ms long, before string, after string, event_id string",
    ).withColumn(
        "source",
        F.struct(F.lit("db").alias("db"), F.lit("t1").alias("table")),
    )
    fan_out_batch(df, 7, [spec])
    fan_out_batch(df, 7, [spec])  # Spark replays the SAME batch id
    spec.close()

    files = glob.glob(str(tmp_path / "lake" / "**" / "*.parquet"), recursive=True)
    total = sum(spark.read.parquet(f).count() for f in files)
    assert total == 1, f"replayed batch duplicated rows: {total}"
    # a NEW batch id still appends
    fan_out_batch(df, 8, [spec])
    spec.close()
    files = glob.glob(str(tmp_path / "lake" / "**" / "*.parquet"), recursive=True)
    total = sum(spark.read.parquet(f).count() for f in files)
    assert total == 2
