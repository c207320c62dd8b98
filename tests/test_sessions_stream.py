"""Streaming sessionization (streaming/sessions_stream.py): session
state carries across micro-batch boundaries AND across a
checkpoint-restart; the bounded drain equals the batch operator on the
same rows (the parity the shared DuckDB oracle enforces at query
level, pinned here at operator level with multi-batch file feeds)."""

import os
import shutil

from pyspark.sql import Row

from deltaforge_spark.operators.sessions import sessionize
from deltaforge_spark.streaming.sessions_stream import streaming_sessionize

S = 1_000_000_000
GAP = 30 * 60 * S


def _write_batch(spark, src, rows, mtime):
    df = spark.createDataFrame(
        [Row(user_id=u, event_id=e, ts=t) for u, e, t in rows]
    )
    tmp = f"{src}/_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = f"{src}/batch_{mtime}.parquet"
    shutil.move(f"{tmp}/{part}", dst)
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))


def _run(spark, src, ckpt, out):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    tagged = streaming_sessionize(stream)
    q = (
        tagged.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in spark.read.parquet(out).collect()
    }


def test_state_spans_micro_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # batch 1: user 1 opens session 1; user 2 opens session 1
    _write_batch(
        spark, src, [(1, 1, 0), (1, 2, 10 * S), (2, 3, 5 * S)], 1_700_000_000
    )
    # batch 2: user 1's next event is INSIDE the gap from batch 1's last
    # event (same session — requires carried state), then one beyond it
    _write_batch(
        spark,
        src,
        [(1, 4, 10 * S + GAP), (1, 5, 10 * S + GAP + GAP + S)],
        1_700_000_100,
    )
    got = _run(spark, src, ckpt, out)
    assert got == {
        (1, 0): 1,
        (1, 10 * S): 1,
        (2, 5 * S): 1,
        (1, 10 * S + GAP): 1,  # carried state: still session 1
        (1, 10 * S + GAP + GAP + S): 2,
    }

    # batch 3 after a RESTART from checkpoint: user 1 continues session
    # 2 within the gap; user 2's long-idle stream opens session 2
    _write_batch(
        spark,
        src,
        [(1, 6, 10 * S + 2 * GAP + 2 * S), (2, 7, 5 * S + GAP + S)],
        1_700_000_200,
    )
    got2 = _run(spark, src, ckpt, out)
    assert got2[(1, 10 * S + 2 * GAP + 2 * S)] == 2
    assert got2[(2, 5 * S + GAP + S)] == 2


def test_bounded_drain_equals_batch_operator(spark, tmp_path):
    rows = []
    for u in range(5):
        t = u * S
        for e in range(40):
            t += (e % 7) * 600 * S  # mixed gaps, some > 30 min
            rows.append((u, u * 1000 + e, t))
    src = str(tmp_path / "feed")
    os.makedirs(src)
    _write_batch(spark, src, rows[:100], 1_700_000_000)
    _write_batch(spark, src, rows[100:], 1_700_000_100)

    out = str(tmp_path / "out")
    got = _run(spark, src, str(tmp_path / "ckpt"), out)

    batch_df = spark.createDataFrame(
        [Row(user_id=u, event_id=e, ts=t) for u, e, t in rows]
    )
    expected = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(batch_df).collect()
    }
    assert got == expected
