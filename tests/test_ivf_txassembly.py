"""IVF ANN, embedding near-dup, and the stateful tx-assembly operator."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from deltaforge_spark.operators.dedup import (
    embedding_neardup_lsh,
    embedding_neardup_pairs,
)
from deltaforge_spark.operators.similarity import brute_force_topk, ivf_topk
from deltaforge_spark.sources import change_feed
from deltaforge_spark.streaming import (
    assemble_transactions,
    assembled_transactions_batch,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_topk_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = ivf_topk(emb, q, k=5, n_cells=16, nprobe=6).collect()
    exact_pairs = {(r.query_id, r.match_id) for r in exact}
    approx_pairs = {(r.query_id, r.match_id) for r in approx}
    # every returned neighbour must carry its exact cosine; recall >= 40%
    # at nprobe=6/16 (approximation is the point — the oracle checks
    # determinism, this checks usefulness)
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    assert all(r.rank >= 1 and r.cosine_sim <= 1.0 for r in approx)


def test_ivf_per_query_k(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=5, n_cells=16, nprobe=4)
    per_q = {r.query_id: r.n for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_q) == {0, 1, 2} and all(n == 5 for n in per_q.values())


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    exact = {
        (r.a_id, r.b_id)
        for r in embedding_neardup_pairs(emb, threshold=0.40).collect()
    }
    lsh = {
        (r.a_id, r.b_id)
        for r in embedding_neardup_lsh(
            emb, threshold=0.40, num_planes=4, num_tables=8, dims=64
        ).collect()
    }
    assert lsh <= exact  # candidates are exactly verified: no false positives
    # expected recall at cosine 0.40 with 4 planes x 8 tables ≈ 0.75
    assert len(lsh & exact) / len(exact) >= 0.5


def test_tx_assembly_stream_matches_batch(spark, sf_dir, tmp_path):
    """Split the change feed across many small files so transactions
    straddle micro-batches; the stateful operator must still emit one
    complete row per transaction, equal to the batch groupBy."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    feed = change_feed(spark, sf_dir)
    flat = feed.select(
        F.col("transaction.id").alias("tx_id"), "op", "ts_ms", "tx_end",
        F.col("event_id").cast("long").alias("eid"),
    )
    # split the feed into 8 source-ordered chunks with increasing mtimes:
    # the file source processes oldest-first, so arrival order == log
    # order (the per-key ordering a CDC log / keyed Kafka topic provides,
    # which the operator assumes) while transactions still straddle
    # micro-batches (maxFilesPerTrigger=1)
    pdf = flat.orderBy("eid").drop("eid").toPandas()
    src = str(tmp_path / "txin")
    os.makedirs(src)
    n_chunks, base = 4, _time.time() - 1000
    step = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        p = f"{src}/chunk_{i}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf.iloc[i * step : (i + 1) * step]), p)
        os.utime(p, (base + i * 10, base + i * 10))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select(F.struct(F.col("tx_id").alias("id")).alias("transaction"),
                "op", "ts_ms", "tx_end")
    )
    import shutil

    out = assemble_transactions(stream, timeout_ms=0)  # bounded replay feed
    ckpt = f"/dev/shm/deltaforge-test-ckpt-b-{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName("tx_asm")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    shutil.rmtree(ckpt, ignore_errors=True)
    got = {
        r.tx_id: (r.n_events, r.n_creates, r.n_updates, r.n_deletes,
                  r.first_ts_ms, r.last_ts_ms)
        for r in spark.sql("SELECT * FROM tx_asm").collect()
    }
    expected_df = assembled_transactions_batch(feed).filter(F.col("complete"))
    expected = {
        r.tx_id: (r.n_events, r.n_creates, r.n_updates, r.n_deletes,
                  r.first_ts_ms, r.last_ts_ms)
        for r in expected_df.collect()
    }
    assert got == expected
    # every emitted row is complete (no timeout evictions in this run)
    assert all(
        r.complete for r in spark.sql("SELECT * FROM tx_asm").collect()
    )


def test_tx_assembly_state_survives_restart(spark, sf_dir, tmp_path):
    """Recovery semantics (reference chaos crash_recovery analog): stop
    the stream mid-feed, deliver the rest, restart from the same
    checkpoint — open-transaction state must be restored so txs that
    straddle the outage still emit exactly once, with full counts."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    feed = change_feed(spark, sf_dir)
    flat = feed.select(
        F.col("transaction.id").alias("tx_id"), "op", "ts_ms", "tx_end",
        F.col("event_id").cast("long").alias("eid"),
    )
    pdf = flat.orderBy("eid").drop("eid").toPandas()
    src, out = (str(tmp_path / d) for d in ("in", "out"))
    # checkpoint + state store on tmpfs: the shared container disk makes
    # per-batch state commits pathologically slow; a real deployment puts
    # checkpoints on fast durable storage
    ckpt = f"/dev/shm/deltaforge-test-ckpt-{os.getpid()}"
    os.makedirs(src)
    half = len(pdf) // 2
    base = _time.time() - 1000

    def write_chunk(i, lo, hi):
        p = f"{src}/chunk_{i}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf.iloc[lo:hi]), p)
        os.utime(p, (base + i * 10, base + i * 10))

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(F.struct(F.col("tx_id").alias("id")).alias("transaction"),
                    "op", "ts_ms", "tx_end")
        )
        q = (
            assemble_transactions(stream, timeout_ms=0)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_chunk(0, 0, half)
    run_once()          # first half; open txs parked in the state store
    write_chunk(1, half, len(pdf))
    run_once()          # restart: state restored, rest of the feed lands

    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)

    got_df = spark.read.parquet(out)
    got = {
        r.tx_id: (r.n_events, r.n_creates, r.n_updates, r.n_deletes)
        for r in got_df.collect()
    }
    assert len(got) == got_df.count(), "a transaction emitted twice"
    expected = {
        r.tx_id: (r.n_events, r.n_creates, r.n_updates, r.n_deletes)
        for r in assembled_transactions_batch(feed).filter(F.col("complete")).collect()
    }
    assert got == expected


def test_tx_assembly_timeout_evicts_abandoned(spark, tmp_path):
    """An abandoned transaction (source died before tx_end) must not
    leak state forever: the processing-time timeout evicts it with
    complete=false."""
    import os
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = pd.DataFrame(
        [
            {"tx_id": "t1", "op": "c", "ts_ms": 1000, "tx_end": False},
            {"tx_id": "t1", "op": "u", "ts_ms": 2000, "tx_end": True},
            {"tx_id": "t2", "op": "c", "ts_ms": 1500, "tx_end": False},  # abandoned
        ]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    pq.write_table(pa.Table.from_pandas(rows), f"{src}/chunk.parquet")
    ckpt = f"/dev/shm/deltaforge-test-ckpt-t-{os.getpid()}"

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select(F.struct(F.col("tx_id").alias("id")).alias("transaction"),
                "op", "ts_ms", "tx_end")
    )
    q = (
        assemble_transactions(stream, timeout_ms=2000)
        .writeStream.format("memory")
        .queryName("tx_evict")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    shutil.rmtree(ckpt, ignore_errors=True)
    got = {r.tx_id: r for r in spark.sql("SELECT * FROM tx_evict").collect()}
    assert got["t1"].complete and got["t1"].n_events == 2
    assert not got["t2"].complete and got["t2"].n_events == 1
