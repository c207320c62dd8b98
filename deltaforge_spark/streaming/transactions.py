"""Stateful transaction assembly — a custom streaming operator.

The reference guarantees that a source transaction is never split
across delivery batches (reference: crates/runner/src/
coordinator.rs:87-110 checks ``tx_end`` before splitting;
docs/src/guarantees.md:67-99). Spark's micro-batch boundaries cannot
make that promise natively, so we re-express the guarantee one level
up: a keyed stateful operator (``applyInPandasWithState``) buffers
change events per transaction id and emits exactly one assembled row
per transaction when its ``tx_end`` marker arrives — regardless of how
many micro-batches the transaction's events were spread across.

Scale shape: state is keyed by ``tx_id`` and holds only counters +
boundary timestamps (not the buffered rows), so state size is
O(open transactions), not O(events); a ProcessingTimeTimeout evicts
transactions whose tail never arrives (source crash mid-tx), emitting
them with ``complete = false`` instead of leaking state forever.

The batch twin (same output schema, same semantics over a bounded
input) is ``assembled_transactions_batch`` — used by the DuckDB oracle
to hash-check the operator's arithmetic, while the streaming test
checks stream-vs-batch equivalence across multi-batch splits.

Ordering assumption: ``tx_end`` is trusted to be the last event of its
transaction to *arrive* — true for any log-ordered source (binlog/WAL
positions, a Kafka topic keyed by table/PK), matching the reference's
delivery model (docs/src/guarantees.md:47-51). Out-of-order transports
would need a watermark-buffered variant instead.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("tx_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_creates", T.LongType()),
        T.StructField("n_updates", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("first_ts_ms", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("complete", T.BooleanType()),
    ]
)

# running counters per open transaction: n, c, u, d, min_ts, max_ts
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("u", T.LongType()),
        T.StructField("d", T.LongType()),
        T.StructField("min_ts", T.LongType()),
        T.StructField("max_ts", T.LongType()),
        T.StructField("seen_end", T.BooleanType()),
    ]
)


def _make_assemble(timeout_ms: int):
    def _assemble(key, pdfs: Iterable[pd.DataFrame], state):
        """Fold incoming event batches into the per-tx counters; emit
        when the tx_end marker has been seen (or on state timeout)."""
        (tx_id,) = key
        if state.hasTimedOut:
            n, c, u, d, mn, mx, _ = state.get
            state.remove()
            yield pd.DataFrame(
                [[tx_id, n, c, u, d, mn, mx, False]], columns=[f.name for f in OUT_SCHEMA]
            )
            return

        n, c, u, d, mn, mx, seen_end = (
            state.get if state.exists else (0, 0, 0, 0, None, None, False)
        )
        for pdf in pdfs:
            n += len(pdf)
            ops = pdf["op"].value_counts()
            c += int(ops.get("c", 0))
            u += int(ops.get("u", 0))
            d += int(ops.get("d", 0))
            lo, hi = int(pdf["ts_ms"].min()), int(pdf["ts_ms"].max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
            seen_end = bool(seen_end or pdf["tx_end"].any())

        if seen_end:
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                [[tx_id, n, c, u, d, mn, mx, True]], columns=[f.name for f in OUT_SCHEMA]
            )
        else:
            state.update((n, c, u, d, mn, mx, seen_end))
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)

    return _assemble


def assemble_transactions(events: DataFrame, *, timeout_ms: int = 60_000) -> DataFrame:
    """Streaming: change-event stream → one row per completed source
    transaction (``applyInPandasWithState`` keyed on transaction.id).

    ``timeout_ms`` bounds how long an abandoned (never-terminated)
    transaction holds state before being evicted as ``complete=false``;
    pass 0 to disable eviction (state then lives until its ``tx_end``
    arrives — only safe when the source guarantees transaction
    termination, e.g. replayed bounded feeds)."""
    flat = events.select(
        F.col("transaction.id").alias("tx_id"),
        F.col("op"),
        F.col("ts_ms"),
        F.col("tx_end"),
    )
    return flat.groupBy("tx_id").applyInPandasWithState(
        _make_assemble(timeout_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if timeout_ms > 0 else "NoTimeout",
    )


def assembled_transactions_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`assemble_transactions`: identical output
    over a bounded input, expressed as one partial-aggregating groupBy
    (map-side combine, single shuffle on tx_id)."""
    return (
        events.groupBy(F.col("transaction.id").alias("tx_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("op") == "c").alias("n_creates"),
            F.count_if(F.col("op") == "u").alias("n_updates"),
            F.count_if(F.col("op") == "d").alias("n_deletes"),
            F.min("ts_ms").alias("first_ts_ms"),
            F.max("ts_ms").alias("last_ts_ms"),
            # coalesce: bool_or over all-NULL is NULL, but the streaming
            # twin emits complete=false for a never-terminated tx
            F.coalesce(F.bool_or("tx_end"), F.lit(False)).alias("complete"),
        )
    )
