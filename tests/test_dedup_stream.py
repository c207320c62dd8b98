"""Streaming near-dup gate (streaming/dedup_stream.py): documents
admitted once across micro-batch boundaries — exact replicas and LSH
near-duplicates of previously admitted docs are suppressed, including
after a checkpointed restart."""

import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deltaforge_spark.streaming.dedup_stream import admitted_docs, streaming_near_dedup

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE.replace("today", "tonight")  # near-dup: most shingles shared
OTHER = "completely different content with its own distinct vocabulary set here now"


def _write_batch(spark, src, rows, mtime):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    tmp = f"{src}/_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = f"{src}/batch_{mtime}.parquet"
    shutil.move(f"{tmp}/{part}", dst)
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))


def _run(spark, src, ckpt, out):
    """File sink (not memory): the restart leg needs a sink that
    supports checkpoint recovery."""
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    verdicts = streaming_near_dedup(stream, num_hashes=8, bands=4)
    q = (
        verdicts.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        r["doc_id"]: r["admitted"]
        for r in admitted_docs(spark.read.parquet(out)).collect()
    }


def test_cross_batch_suppression_and_restart(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    # batch 1: base doc + an unrelated doc — both admitted; a same-batch
    # near-dup of base — suppressed by the first occupant of its buckets
    _write_batch(spark, src, [(1, BASE), (2, OTHER), (3, NEAR)], 1_700_000_000)
    out = str(tmp_path / "out")
    got = _run(spark, src, ckpt, out)
    assert got[1] is True and got[2] is True
    assert got[3] is False  # near-dup collides within the batch

    # batch 2 (restart from checkpoint): exact replica of doc 1 and a
    # fresh doc — state survived the restart, replica suppressed
    _write_batch(spark, src, [(10, BASE), (11, "yet another brand new unique document body")], 1_700_000_100)
    got2 = _run(spark, src, ckpt, out)
    assert got2[10] is False  # duplicate of batch-1 state
    assert got2[11] is True


def test_admitted_docs_any_band_rule(spark, tmp_path):
    """A doc is a duplicate if ANY band collides (the minhash LSH
    candidate rule) — one colliding band outvotes three clean ones."""
    src = str(tmp_path / "feed2")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt2")
    _write_batch(spark, src, [(1, BASE), (2, NEAR)], 1_700_000_000)
    got = _run(spark, src, ckpt, str(tmp_path / "out2"))
    assert got == {1: True, 2: False}


def test_rowwise_signatures_match_groupby_form(spark, sf_dir):
    from deltaforge_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_rowwise,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    a = {tuple(r) for r in minhash_signatures(docs, text_col="text", id_col="doc_id").collect()}
    b = {
        tuple(r)
        for r in minhash_signatures_rowwise(docs, text_col="text", id_col="doc_id")
        .filter("mh0 IS NOT NULL")
        .collect()
    }
    assert a == b and len(a) > 0


class _FakeState:
    def __init__(self, value=None, timed_out=False, now=0):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None
        self.now = now

    def getCurrentProcessingTimeMs(self):
        return self.now

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_bucket_gate_ttl_eviction_unit():
    """TTL semantics of the gate function itself (bucketed state: one
    group holds many (band, bucket) entries as parallel arrays): an
    idle entry expires on the group timeout (bounded state), entries
    touched by a batch re-arm, and a busy group lazily evicts its own
    stale entries."""
    import pandas as pd

    from deltaforge_spark.streaming.dedup_stream import _make_bucket_gate

    gate = _make_bucket_gate(ttl_ms=5000)

    # timed-out invocation: every entry idle >= ttl is dropped, nothing
    # emitted; the still-fresh entry survives
    st = _FakeState(
        value=(["0:old", "0:fresh"], [1, 2], [0, 9_000]), timed_out=True, now=10_000
    )
    out = list(gate((7,), iter([]), st))
    assert sum(len(p) for p in out) == 0
    assert st._v == (["0:fresh"], [2], [9_000])

    # normal batch: founder admitted per (band, bucket), dup flagged,
    # timeout re-armed, state holds the composite keys
    st2 = _FakeState(now=1_000)
    batch = pd.DataFrame({"doc_id": [5, 7], "band": [0, 0], "bucket": ["k", "k"]})
    out2 = pd.concat(list(gate((7,), iter([batch]), st2)))
    assert list(out2["dup_of_state"]) == [False, True]
    assert st2._v == (["0:k"], [5], [1_000]) and st2.timeout_set == 5000

    # an occupied bucket flags a later arrival even across invocations
    st2.hasTimedOut = False
    st2.now = 2_000
    out2b = pd.concat(
        list(gate((7,), iter([pd.DataFrame({"doc_id": [9], "band": [0], "bucket": ["k"]})]), st2))
    )
    assert list(out2b["dup_of_state"]) == [True]
    assert st2._v == (["0:k"], [5], [2_000])  # founder kept, activity re-armed

    # lazy sweep on a DATA invocation: a stale entry in a busy group
    # evicts without waiting for the whole group to go idle
    st4 = _FakeState(value=(["0:stale"], [3], [0]), now=60_000)
    out4 = pd.concat(
        list(gate((7,), iter([pd.DataFrame({"doc_id": [8], "band": [1], "bucket": ["z"]})]), st4))
    )
    assert list(out4["dup_of_state"]) == [False]
    assert st4._v == (["1:z"], [8], [60_000])  # stale gone, new founder kept

    # post-eviction: a former duplicate is re-admitted (the documented
    # bounded-state trade)
    st3 = _FakeState(now=70_000)  # state gone after eviction
    out3 = pd.concat(
        list(gate((7,), iter([pd.DataFrame({"doc_id": [5], "band": [0], "bucket": ["k"]})]), st3))
    )
    assert list(out3["dup_of_state"]) == [False]
