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
    out = assemble_transactions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tx_asm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
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
