"""Round-3 advice fixes: line_dedup order-key overflow, PQ dims
inference, outbox-gate NULL routing, bucket-gate founder state."""

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from deltaforge_spark.operators.pq import deterministic_codebook, pq_encode
from deltaforge_spark.operators.spans import line_dedup
from deltaforge_spark.patterns import AllowList
from deltaforge_spark.plans.refspec import _outbox_gate


def test_line_dedup_survives_hash_scale_doc_ids(spark):
    """doc_id >= 2^43 (64-bit-hash id regime) overflowed the old
    packed order key doc_id*2^20+pos: Spark wrapped silently and could
    pick a WRONG 'globally first' occurrence. The struct-min key must
    keep the true lexicographic (doc_id, pos) minimum."""
    big = 1 << 50
    rows = [
        (big + 1, ["dup line", "unique a"]),  # later doc
        (big, ["unique b", "dup line"]),  # first doc: dup at pos 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "_lines"])
    out = {r["doc_id"]: r for r in line_dedup(df, lines_col="_lines").collect()}
    # first occurrence of "dup line" is (big, 1) — the lower doc wins
    assert out[big]["n_kept"] == 2 and out[big]["n_removed"] == 0
    assert out[big + 1]["n_kept"] == 1 and out[big + 1]["n_removed"] == 1
    assert out[big + 1]["kept_text"] == "unique a"


def test_line_dedup_deep_docs(spark):
    """Position beyond 2^20 would have corrupted neighbor keys under
    arithmetic packing; with struct-min only ordering semantics matter.
    (Simulated with a modest line count but explicit pos collision
    shape: two docs sharing every line — lower doc_id keeps all.)"""
    lines = [f"line {i}" for i in range(200)]
    df = spark.createDataFrame([(2, lines), (1, lines)], ["doc_id", "_lines"])
    out = {r["doc_id"]: r for r in line_dedup(df, lines_col="_lines").collect()}
    assert out[1]["n_kept"] == 200 and out[2]["n_kept"] == 0


def test_pq_encode_infers_actual_dims(spark):
    """Default codebook must follow the data's true vector width, not a
    hardcoded 64: 16-dim embeddings encode fine with an inferred
    16-dim codebook."""
    rows = [(i, [float((i * 7 + j) % 5) for j in range(16)]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    enc = pq_encode(df).collect()
    assert len(enc) == 8 and all(len(r["codes"]) == 8 for r in enc)


def test_pq_encode_width_mismatch_raises(spark):
    """An explicitly wrong codebook (64-dim) on 16-dim vectors must
    raise, not silently slice past the vector end."""
    rows = [(i, [float(j) for j in range(16)]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = deterministic_codebook(dims=64)
    with pytest.raises(Exception, match="codebook width"):
        pq_encode(df, codebook=cb).collect()


def _cdc_outbox_frame(spark):
    after_t = T.StructType(
        [
            T.StructField("aggregate_type", T.StringType()),
            T.StructField("aggregate_id", T.StringType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.StringType()),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("db", T.StringType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
            T.StructField("after", after_t),
            T.StructField("before", after_t),
        ]
    )
    rows = [
        ("e1", ("app", "outbox"), ("Order", "1", "created", "{}"), None),
        ("e2", ("app", "orders"), ("x", "2", "y", "{}"), None),
        ("e3", (None, None), ("x", "3", "y", "{}"), None),  # NULL source
    ]
    return spark.createDataFrame(rows, schema)


def test_outbox_gate_null_source_rows_not_dropped(spark):
    """Rows with NULL source.db/source.table made the allow predicate
    NULL, failing BOTH filter branches — silently dropped from mixed
    CDC+outbox pipelines. They must route to the CDC pass-through."""
    df = _cdc_outbox_frame(spark)
    gated = _outbox_gate(lambda d: d, AllowList(["app.outbox"]))(df)
    out = {r["event_id"]: r for r in gated.collect()}
    assert set(out) == {"e1", "e2", "e3"}
    # e1 is outbox: payload promoted to raw_value, row images nulled
    assert out["e1"]["raw_value"] is not None and out["e1"]["after"] is None
    # e3 (NULL source) passes through as CDC with its row image intact
    assert out["e3"]["raw_value"] is None and out["e3"]["after"] is not None
