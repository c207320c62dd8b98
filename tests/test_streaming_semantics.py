"""Streaming semantics: watermark dedup (at-least-once → effectively
once), event-time tumbling windows, session windows — the §2.6 surface
the reference lacks and pushes to consumers (guarantees.md:380)."""

import pyspark.sql.functions as F
import pytest
import pyspark.sql.types as T

from deltaforge_spark.streaming import dedup_events

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ROWS = [
    ("e1", "2024-01-01 00:00:01", 1, 10.0),
    ("e2", "2024-01-01 00:00:05", 1, 20.0),
    ("e1", "2024-01-01 00:00:06", 1, 10.0),  # duplicate replay of e1
    ("e3", "2024-01-01 00:40:00", 1, 30.0),  # later window
    ("e4", "2024-01-01 00:40:30", 2, 40.0),
]


def _write_stream_input(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, spark.sql(f"SELECT TIMESTAMP '{t}'").collect()[0][0], u, v) for i, t, u, v in ROWS],
        SCHEMA,
    )
    path = str(tmp_path / "in")
    df.coalesce(1).write.parquet(path)
    return path


def _run_stream(spark, src_path, tmp_path, transform):
    stream = spark.readStream.schema(SCHEMA).parquet(src_path)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(f"t_{abs(hash(src_path)) % 10**8}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM t_{abs(hash(src_path)) % 10**8}")


def test_watermark_dedup(spark, tmp_path):
    src = _write_stream_input(spark, tmp_path)
    got = _run_stream(
        spark, src, tmp_path, lambda df: dedup_events(df, watermark_col="event_time", delay="10 minutes")
    ).collect()
    ids = sorted(r["event_id"] for r in got)
    assert ids == ["e1", "e2", "e3", "e4"]  # replayed e1 suppressed


def test_event_time_tumbling_window(spark, tmp_path):
    src = _write_stream_input(spark, tmp_path)

    def agg(df):
        return (
            df.withWatermark("event_time", "5 minutes")
            .groupBy(F.window("event_time", "10 minutes"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select(F.col("window.start").cast("string").alias("ws"), "n", "total")
        )

    # availableNow + append emits only closed windows; with watermark 5m the
    # 00:00 window closes once the 00:40 data arrives
    got = {r["ws"]: (r["n"], r["total"]) for r in _run_stream(spark, src, tmp_path, agg).collect()}
    assert got["2024-01-01 00:00:00"] == (3, 40.0)  # dup e1 counted (no dedup here)


def test_session_window_streaming(spark, tmp_path):
    src = _write_stream_input(spark, tmp_path)

    def sess(df):
        return (
            df.withWatermark("event_time", "5 minutes")
            .groupBy(F.session_window("event_time", "30 minutes"), F.col("user_id"))
            .agg(F.count("*").alias("n"))
            .select("user_id", "n")
        )

    got = sorted(
        (r["user_id"], r["n"]) for r in _run_stream(spark, src, tmp_path, sess).collect()
    )
    # user 1: one session of 3 events (00:00:01-00:00:06) closed by the 00:40 arrivals
    assert (1, 3) in got


@pytest.mark.spark
def test_windowed_stream_query_matches_batch_and_reruns(spark):
    """The declared streaming query must (a) equal the batch twin
    exactly and (b) be re-invocable in one session (unique memory-sink
    names, fresh checkpoints)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    batch = {
        (r.hour_bucket, r.event_type): (r.n, r.sum_value)
        for r in entry.q_events_windowed(spark, sf).collect()
    }
    for _ in range(2):  # re-run: no query-name or checkpoint collision
        stream = {
            (r.hour_bucket, r.event_type): (r.n, r.sum_value)
            for r in entry.q_events_windowed_stream(spark, sf).collect()
        }
        assert stream == batch


@pytest.mark.spark
def test_tx_assemble_stream_query_matches_batch_and_reruns(spark):
    """The declared stateful-streaming query equals the batch twin and
    re-invokes cleanly (fresh memory-sink name + checkpoint; the staged
    feed is reused across calls)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    batch = {r.tx_id: r.asDict() for r in entry.q_tx_assemble(spark, sf).collect()}
    for _ in range(2):
        stream = {
            r.tx_id: r.asDict()
            for r in entry.q_cdc_tx_assemble_stream(spark, sf).collect()
        }
        assert stream == batch


@pytest.mark.spark
def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join — the capability SURVEY §2.2 notes
    the reference explicitly lacks (guarantees.md:380 pushes joins to
    Flink/ksqlDB) and this engine provides natively: clicks joined to
    purchases of the same user within [-10 min, 0] event time, state
    bounded by the watermark horizon."""
    import pyspark.sql.types as T

    click_dir, buy_dir = tmp_path / "clicks", tmp_path / "buys"
    schema = T.StructType(
        [
            T.StructField("user", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("val", T.LongType()),
        ]
    )
    from datetime import datetime as dt

    def rows(*specs):
        return [(u, dt(2026, 1, 1, 10, m), v) for u, m, v in specs]

    spark.createDataFrame(
        rows(("u1", 5, 1), ("u1", 30, 2), ("u2", 10, 3)), schema
    ).coalesce(1).write.parquet(str(click_dir))
    spark.createDataFrame(
        # u1 purchase at 10:08 — within 10 min of the 10:05 click only;
        # u2 purchase at 10:40 — no click within the window
        rows(("u1", 8, 100), ("u2", 40, 200)), schema
    ).coalesce(1).write.parquet(str(buy_dir))

    clicks = (
        spark.readStream.schema(schema).parquet(str(click_dir))
        .withWatermark("ts", "1 hour")
        .selectExpr("user", "ts AS click_ts", "val AS click_val")
    )
    buys = (
        spark.readStream.schema(schema).parquet(str(buy_dir))
        .withWatermark("ts", "1 hour")
        .selectExpr("user AS buser", "ts AS buy_ts", "val AS buy_val")
    )
    joined = clicks.join(
        buys,
        F.expr(
            "user = buser AND buy_ts >= click_ts "
            "AND buy_ts <= click_ts + INTERVAL 10 MINUTES"
        ),
    )
    from deltaforge_spark.streaming.pipeline import run_stream_to_memory

    out = run_stream_to_memory(
        joined, name="ss_join_test", output_mode="append"
    ).collect()
    assert [(r.user, r.click_val, r.buy_val) for r in out] == [("u1", 1, 100)]
