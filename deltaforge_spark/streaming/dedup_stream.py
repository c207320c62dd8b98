"""Streaming corpus dedup: a continuously-ingesting document stream
that admits each document once — exact duplicates and MinHash-LSH
near-duplicates of anything previously admitted are suppressed, across
micro-batch boundaries.

Beyond-reference streaming operator (the reference has no stateful
operators at all — guarantees.md:380); this is the ingestion-time
shape of the batch dedup family (operators/dedup.py): a training-data
pipeline that receives documents continuously cannot re-run corpus
dedup per batch, it needs standing state.

Dataflow (all state partitioned by small keys, Spark-managed):

1. **exact gate** — ``dropDuplicates`` on the 16-byte content hash:
   Spark's streaming dedup state admits the first occurrence only.
2. **near-dup gate** — documents explode into their LSH band buckets;
   ``applyInPandasWithState`` KEYED ON (band, bucket) keeps the FIRST
   occupant of each bucket. The bucket key already IS the band
   signature (md5 of the band's minhash slice), so any later arrival
   under the same key is a candidate pair by the minhash_lsh_pairs
   rule — no member list or signature comparison is needed, occupancy
   alone decides. The per-doc verdict is a groupBy over its band
   votes: admitted = no bucket flagged it.

State size: exact gate = one 16-byte hash per admitted doc (bounded by
watermark eviction in production); near-dup gate = exactly one founder
doc_id per non-empty bucket — a hot boilerplate cluster costs ONE
state row no matter how many duplicates hit it.

Determinism caveat (documented, inherent to streaming dedup): WITHIN
one micro-batch the admission order follows doc_id ascending, so a
replayed batch admits the same documents.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("dup_of_state", T.BooleanType()),
    ]
)

_BUCKET_STATE = T.StructType(
    [
        T.StructField("founder", T.LongType()),  # first admitted doc id
    ]
)


def _make_bucket_gate(ttl_ms: int = 0):
    def gate(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms > 0 and state.hasTimedOut:
            # TTL eviction: an idle bucket's founder expires — the
            # bounded-state trade every streaming dedup makes (a
            # duplicate arriving after the horizon is re-admitted);
            # same eviction contract as the tx assembler's timeout
            state.remove()
            yield pd.DataFrame(columns=["doc_id", "band", "dup_of_state"])
            return
        occupied = state.exists
        founder = state.get[0] if occupied else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic admission order within the batch; same (band,
        # bucket) key ⇒ candidate pair: the key already encodes
        # band-signature equality, so occupancy decides — an occupied
        # bucket flags every arrival, an empty one admits exactly the
        # lowest doc_id and flags the rest (vectorized, no row loop)
        batch = batch.sort_values("doc_id")
        dup = pd.Series(True, index=batch.index, dtype=bool)
        if not occupied:
            dup.iloc[0] = False
            founder = int(batch["doc_id"].iloc[0])
        state.update((founder,))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "band": batch["band"].astype("int32"),
                "dup_of_state": dup,
            }
        )

    return gate


def streaming_near_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    state_ttl_ms: int = 0,
) -> DataFrame:
    """doc stream → per-(doc, band) verdicts ``(doc_id, band,
    dup_of_state)``. Downstream admission = groupBy(doc_id) with
    ``admitted = NOT bool_or(dup_of_state)`` (streaming-aggregable);
    apply after the exact gate (``stream.dropDuplicates([hash])``).

    Works identically on a batch frame (applyInPandasWithState's batch
    execution) — the replay test drives micro-batches through
    ``foreachBatch`` to pin cross-batch suppression.
    """
    from ..operators.dedup import minhash_signatures_rowwise

    # row-wise signatures: map-only, so the only stateful operator in
    # the stream is the bucket gate itself (an aggregation here would
    # drag watermark/append-mode constraints into the signature step)
    sig = minhash_signatures_rowwise(
        docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes
    ).filter(F.col("mh0").isNotNull())
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        members = [
            F.col(f"mh{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(":", *members)).alias("bucket"),
            )
        )
    keyed = sig.select(
        F.col("doc_id"), F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    return keyed.groupBy("band", "bucket").applyInPandasWithState(
        _make_bucket_gate(state_ttl_ms),
        outputStructType=VERDICT_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if state_ttl_ms > 0 else "NoTimeout",
    )


def admitted_docs(verdicts: DataFrame) -> DataFrame:
    """Collapse band verdicts to per-doc admission."""
    return (
        verdicts.groupBy("doc_id")
        .agg((~F.coalesce(F.bool_or("dup_of_state"), F.lit(False))).alias("admitted"))
    )
