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

Scale shape: state holds only counters + boundary timestamps per open
transaction (not the buffered rows), so state size is
O(open transactions); a ProcessingTimeTimeout evicts transactions
whose tail never arrives (source crash mid-tx), emitting them with
``complete = false`` instead of leaking state forever.

r13 optimization (guide §4 — the Python boundary): the operator used
to key the state on ``tx_id`` itself, which made every transaction its
own ``applyInPandasWithState`` group. The per-GROUP machinery of that
API (Arrow slice + per-column pandas conversion + GroupState
construct/serialize round-trip, all per group) costs ~1-2 ms
regardless of the group's size, and CDC transactions are small (the
bench feed averages ~1 event/tx) — measured 10.8 s for a 100k-tx drain
with a **no-op** gate body, i.e. >80% pure harness. The state is now
keyed on ``pmod(xxhash64(tx_id), buckets)`` and each bucket's state
holds the counters of ALL its open transactions as parallel arrays, so
the Python boundary is crossed ``buckets`` times per batch instead of
once per transaction, and the per-bucket body is vectorized numpy.
Semantics are unchanged: same emit-on-tx_end rule, same per-tx
timeout eviction (see ``_sweep_expired``), same restart recovery (the
arrays live in the same Spark-managed state store).

``buckets`` trades per-group overhead against state-blob granularity:
every open tx in a bucket is rewritten when any of them changes. Size
it so buckets ≫ shuffle partitions (even spread) while keeping
open-tx-per-bucket small; the default (1024) suits both the local
bench and a cluster running tens of state partitions — at larger
scale raise it via the ``buckets=`` argument roughly in proportion to
expected concurrent open transactions / 100.

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

import numpy as np
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

# per-bucket state: parallel arrays over the bucket's OPEN transactions
# (counters + boundary timestamps + last-activity processing time)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tx_ids", T.ArrayType(T.StringType())),
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("c", T.ArrayType(T.LongType())),
        T.StructField("u", T.ArrayType(T.LongType())),
        T.StructField("d", T.ArrayType(T.LongType())),
        T.StructField("min_ts", T.ArrayType(T.LongType())),
        T.StructField("max_ts", T.ArrayType(T.LongType())),
        T.StructField("last_ms", T.ArrayType(T.LongType())),
    ]
)

_OUT_COLS = [f.name for f in OUT_SCHEMA]


def _load_open(state) -> dict:
    """State arrays → {tx_id: [n, c, u, d, mn, mx, last_ms]}."""
    if not state.exists:
        return {}
    tx_ids, ns, cs, us, ds, mns, mxs, lasts = state.get
    return {
        t: [ns[i], cs[i], us[i], ds[i], mns[i], mxs[i], lasts[i]]
        for i, t in enumerate(tx_ids)
    }


def _save_open(state, open_tx: dict, timeout_ms: int) -> None:
    if not open_tx:
        if state.exists:
            state.remove()
        return
    cols = list(zip(*open_tx.values()))
    state.update((list(open_tx.keys()),) + tuple(list(c) for c in cols))
    if timeout_ms > 0:
        state.setTimeoutDuration(timeout_ms)


def _emit(rows: list) -> pd.DataFrame:
    """rows of (tx_id, n, c, u, d, mn, mx, complete) → output frame."""
    cols = list(zip(*rows))
    return pd.DataFrame(
        {name: list(vals) for name, vals in zip(_OUT_COLS, cols)}
    )


def _sweep_expired(open_tx: dict, now: int, timeout_ms: int) -> list:
    """Per-tx timeout eviction (same contract as the old per-tx-keyed
    timer): any open tx idle ≥ timeout_ms leaves state and emits with
    complete=false. Runs on the bucket's ProcessingTimeTimeout (where
    every tx is expired by construction — the timer re-arms on each
    bucket activity, so firing means timeout_ms with no events at all)
    AND lazily on data invocations, so an abandoned tx inside a busy
    bucket still evicts ~on time instead of waiting for bucket idle."""
    rows = []
    for t in [t for t, e in open_tx.items() if now - e[6] >= timeout_ms]:
        e = open_tx.pop(t)
        rows.append((t, e[0], e[1], e[2], e[3], e[4], e[5], False))
    return rows


def _make_assemble(timeout_ms: int):
    def _assemble(key, pdfs: Iterable[pd.DataFrame], state):
        """Fold the bucket's event chunks into per-tx counters; emit
        each tx whose tx_end marker has been seen (or timed out)."""
        open_tx = _load_open(state)

        if state.hasTimedOut:
            now = state.getCurrentProcessingTimeMs()
            rows = _sweep_expired(open_tx, now, timeout_ms)
            _save_open(state, open_tx, timeout_ms)
            if rows:
                yield _emit(rows)
            return

        now = state.getCurrentProcessingTimeMs() if timeout_ms > 0 else 0
        ended: set = set()
        for pdf in pdfs:
            tx = pdf["tx_id"].to_numpy()
            op = pdf["op"].to_numpy()
            ts = pdf["ts_ms"].to_numpy()
            end = pdf["tx_end"].to_numpy()
            keys, inv = np.unique(tx, return_inverse=True)
            k = keys.shape[0]
            n_ = np.bincount(inv, minlength=k)
            c_ = np.bincount(inv, weights=(op == "c"), minlength=k)
            u_ = np.bincount(inv, weights=(op == "u"), minlength=k)
            d_ = np.bincount(inv, weights=(op == "d"), minlength=k)
            mn_ = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
            mx_ = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
            np.minimum.at(mn_, inv, ts)
            np.maximum.at(mx_, inv, ts)
            end_ = np.bincount(inv, weights=end.astype(np.float64), minlength=k) > 0
            for i in range(k):
                t = keys[i]
                e = open_tx.get(t)
                if e is None:
                    open_tx[t] = [
                        int(n_[i]), int(c_[i]), int(u_[i]), int(d_[i]),
                        int(mn_[i]), int(mx_[i]), now,
                    ]
                else:
                    e[0] += int(n_[i])
                    e[1] += int(c_[i])
                    e[2] += int(u_[i])
                    e[3] += int(d_[i])
                    e[4] = min(e[4], int(mn_[i]))
                    e[5] = max(e[5], int(mx_[i]))
                    e[6] = now
                if end_[i]:
                    ended.add(t)

        rows = []
        for t in ended:
            e = open_tx.pop(t)
            rows.append((t, e[0], e[1], e[2], e[3], e[4], e[5], True))
        if timeout_ms > 0:
            rows.extend(_sweep_expired(open_tx, now, timeout_ms))
        _save_open(state, open_tx, timeout_ms)
        if rows:
            yield _emit(rows)

    return _assemble


def assemble_transactions(
    events: DataFrame, *, timeout_ms: int = 60_000, buckets: int = 1024
) -> DataFrame:
    """Streaming: change-event stream → one row per completed source
    transaction (``applyInPandasWithState`` keyed on a hash bucket of
    transaction.id — see the module docstring for why buckets, and how
    to size ``buckets`` at scale).

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
        F.pmod(F.xxhash64(F.col("transaction.id")), F.lit(buckets)).alias("_bucket"),
    )
    return flat.groupBy("_bucket").applyInPandasWithState(
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
