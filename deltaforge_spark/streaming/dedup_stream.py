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
   ``applyInPandasWithState`` keyed on a HASH of (band, bucket) keeps
   the FIRST occupant of each bucket. The bucket key already IS the
   band signature (md5 of the band's minhash slice), so any later
   arrival under the same key is a candidate pair by the
   minhash_lsh_pairs rule — no member list or signature comparison is
   needed, occupancy alone decides. The per-doc verdict is a groupBy
   over its band votes: admitted = no bucket flagged it.

r13 optimization (guide §4 — the Python boundary): the gate used to
key its state on (band, bucket) itself, making every LSH bucket its
own ``applyInPandasWithState`` group — and bucket cardinality is
~bands × corpus size, so a drain paid the per-group harness cost
(Arrow slice + pandas conversion + GroupState round-trip, ~1-2 ms
regardless of group size) hundreds of thousands of times. The state
now keys on ``pmod(xxhash64(band, bucket), state_buckets)`` and each
group's state holds ALL its occupied buckets as parallel arrays
(occupancy set + founder ids); the per-group body decides the whole
batch vectorized. Decisions are identical: same first-occupant rule,
same doc_id admission order, same TTL eviction horizon (see
``_sweep_expired`` in streaming/transactions.py for the same pattern).

State size: exact gate = one 16-byte hash per admitted doc (bounded by
watermark eviction in production); near-dup gate = exactly one founder
doc_id per non-empty bucket — a hot boilerplate cluster costs ONE
state row no matter how many duplicates hit it. ``state_buckets``
trades per-group overhead against state-blob granularity (every
occupied bucket in a group is rewritten when any of them changes);
size it ≫ shuffle partitions, ~(expected occupied buckets / 100).

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

# per-group state: parallel arrays over the group's OCCUPIED buckets
# ("band:bucket" composite key, founder doc id, last-activity ms)
_BUCKET_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("founder", T.ArrayType(T.LongType())),
        T.StructField("last_ms", T.ArrayType(T.LongType())),
    ]
)


def _make_bucket_gate(ttl_ms: int = 0):
    def gate(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        occupied: dict = {}
        if state.exists:
            keys, founders, lasts = state.get
            occupied = {k: [founders[i], lasts[i]] for i, k in enumerate(keys)}

        def save() -> None:
            if not occupied:
                if state.exists:
                    state.remove()
                return
            state.update(
                (
                    list(occupied.keys()),
                    [e[0] for e in occupied.values()],
                    [e[1] for e in occupied.values()],
                )
            )
            if ttl_ms > 0:
                state.setTimeoutDuration(ttl_ms)

        if ttl_ms > 0 and state.hasTimedOut:
            # TTL eviction: idle buckets' founders expire — the
            # bounded-state trade every streaming dedup makes (a
            # duplicate arriving after the horizon is re-admitted).
            # The group timer re-arms on every activity, so firing
            # means ttl_ms with no events for ANY bucket here; each
            # entry is still checked against its own last activity.
            now = state.getCurrentProcessingTimeMs()
            for k in [k for k, e in occupied.items() if now - e[1] >= ttl_ms]:
                del occupied[k]
            save()
            return

        now = state.getCurrentProcessingTimeMs() if ttl_ms > 0 else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic admission order within the batch; same (band,
        # bucket) key ⇒ candidate pair: the key already encodes
        # band-signature equality, so occupancy decides — an occupied
        # bucket flags every arrival, an empty one admits exactly the
        # lowest doc_id and flags the rest (vectorized, no row loop)
        batch = batch.sort_values("doc_id", kind="stable", ignore_index=True)
        bk = batch["band"].astype(str).str.cat(batch["bucket"], sep=":")
        first = ~bk.duplicated()
        in_state = bk.isin(set(occupied))
        dup = ~(first & ~in_state)
        for k, d in zip(bk, batch["doc_id"]):
            e = occupied.get(k)
            if e is None:
                occupied[k] = [int(d), now]
            else:
                e[1] = now
        if ttl_ms > 0:
            # lazy sweep (same horizon as the old per-key timer): an
            # expired bucket not touched by this batch evicts now
            # instead of waiting for the whole group to go idle
            for k in [k for k, e in occupied.items() if now - e[1] >= ttl_ms]:
                del occupied[k]
        save()
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
    state_buckets: int = 1024,
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
    ).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        F.pmod(
            F.xxhash64(F.col("bb.band"), F.col("bb.bucket")), F.lit(state_buckets)
        ).alias("_skey"),
    )

    return keyed.groupBy("_skey").applyInPandasWithState(
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
