"""Streaming sessionization — the stateful twin of
operators/sessions.sessionize: a continuously-ingesting event stream
where every event is tagged with its per-user session number the
moment it arrives, session state carried across micro-batch
boundaries.

Beyond-reference streaming operator (the reference has no stateful
operators — guarantees.md:380); pairs with the batch operator the way
dedup_stream pairs with operators/dedup: identical boundary semantics
(a session starts when the gap from the previous event strictly
exceeds ``gap_ns``), so the bounded-drain result replays the SAME
DuckDB oracle as the batch query.

Dataflow: ``applyInPandasWithState`` keyed on user_id; state is three
longs (last event ts, current session number, count of sessions
started) — O(1) per user regardless of event volume, the minimum any
sessionizer can hold. Events are tagged and emitted in append mode
(each event exactly once), so no end-of-stream flush is ever needed —
per-session reduction is an ordinary downstream aggregation.

Ordering contract: within a micro-batch events are processed in
(ts, event_id) order (deterministic replay); ACROSS batches the
operator assumes the source delivers a user's events in
non-decreasing-ts batch order — the same in-order contract the
reference's binlog/pgoutput tail guarantees by construction, and what
a watermark enforces in unbounded production. A bounded availableNow
drain satisfies it trivially. Out-of-order arrivals across batches
are folded into the CURRENT session (never retroactively re-split):
the documented degradation, identical to every production sessionizer
that has already emitted downstream rows.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..operators.sessions import DEFAULT_GAP_NS

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _make_tagger(gap_ns: int):
    def tag(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, seq = state.get
        else:
            last_ts, seq = None, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        out_ts, out_seq = [], []
        for ts in batch["ts"]:
            ts = int(ts)
            if last_ts is None or ts - last_ts > gap_ns:
                seq += 1
            # out-of-order within the gap folds into the current
            # session; last_ts advances monotonically so a stale ts
            # can never reopen an older boundary
            last_ts = ts if last_ts is None else max(last_ts, ts)
            out_ts.append(ts)
            out_seq.append(seq)
        state.update((last_ts, seq))
        yield pd.DataFrame(
            {"user_id": int(user_id), "ts": out_ts, "session_seq": out_seq},
            columns=["user_id", "ts", "session_seq"],
        )

    return tag


def streaming_sessionize(
    events: DataFrame,
    *,
    gap_ns: int = DEFAULT_GAP_NS,
) -> DataFrame:
    """event stream (user_id, event_id, ts nanos) → tagged stream
    (user_id, ts, session_seq), append mode, exactly one output row per
    input event. Works identically on a batch frame
    (applyInPandasWithState's batch execution)."""
    keyed = events.select("user_id", "event_id", "ts")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_tagger(gap_ns),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
