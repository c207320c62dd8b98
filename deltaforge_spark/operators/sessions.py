"""Gap-based sessionization — the canonical event-stream operator the
product-analytics tier (funnel/retention/paths, operators/funnel.py)
composes over, exposed as its own first-class primitive: assign every
event to a per-user session whose boundary is an inactivity gap, then
reduce to per-session facts (event count, span, duration).

Training-data relevance: chat/interaction corpora are assembled by
exactly this operator (group raw turns into conversations by user +
inactivity gap) before packing; the reference's analytics suite keys
several reports on the same notion of session.

Semantics (exact, engine-portable):
- events are ordered per user by (ts, event_id) — the id tiebreak makes
  simultaneous events deterministic,
- a session STARTS at the first event and at any event whose gap from
  the previous one strictly exceeds ``gap_ns``,
- ``session_seq`` is the running count of starts (1-based) per user —
  pure integer window algebra, no floats anywhere, so any SQL engine
  replays it bit-for-bit.

Scale shape (100 TB / 1e9 users):
- one shuffle on user_id for the lag + running-sum windows (both share
  the same window spec, one Exchange), then a groupBy on
  (user_id, session_seq) with map-side combine.
- per-user state is a window over that user's events only — bounded by
  the same per-user-volume bound funnel.py documents; no global window,
  no sort of the full stream, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_GAP_NS = 30 * 60 * 1_000_000_000  # 30 min, the industry default


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_ns: int = DEFAULT_GAP_NS,
) -> DataFrame:
    """Input events (+``session_seq`` long) — every event tagged with
    its 1-based per-user session number. ``ts_col`` is epoch nanos
    (read_table's normalized events clock)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(ts_col).over(w)
    is_start = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(gap_ns)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(is_start).over(run).cast("long"))


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_ns: int = DEFAULT_GAP_NS,
) -> DataFrame:
    """Per-session reduction: (user, session_seq, n_events, start_ms,
    end_ms, duration_s) — all exact integers (hash-gate rules: never
    emit raw nanos; ms/seconds via integer division)."""
    tagged = sessionize(
        events, user_col=user_col, ts_col=ts_col, id_col=id_col, gap_ns=gap_ns
    )
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(f"CAST(min({ts_col}) DIV 1000000 AS BIGINT)").alias("start_ms"),
        F.expr(f"CAST(max({ts_col}) DIV 1000000 AS BIGINT)").alias("end_ms"),
        F.expr(
            f"CAST((max({ts_col}) - min({ts_col})) DIV 1000000000 AS BIGINT)"
        ).alias("duration_s"),
    )


def session_stats_oracle_sql(
    table_expr: str,
    *,
    user_col: str = "user_id",
    ts_expr: str = "epoch_ns(ts)",
    id_col: str = "event_id",
    gap_ns: int = DEFAULT_GAP_NS,
) -> str:
    """The identical algebra as ANSI SQL (DuckDB dialect): same order,
    same strict-gap rule, same integer reductions."""
    return f"""
        WITH e AS (
            SELECT {user_col} AS u, CAST({ts_expr} AS BIGINT) AS ts_ns,
                   {id_col} AS eid
            FROM {table_expr}
        ),
        lagd AS (
            SELECT u, ts_ns, eid,
                   lag(ts_ns) OVER (PARTITION BY u ORDER BY ts_ns, eid) AS prev_ns
            FROM e
        ),
        seq AS (
            SELECT u, ts_ns,
                   sum(CASE WHEN prev_ns IS NULL
                                 OR ts_ns - prev_ns > {gap_ns} THEN 1
                            ELSE 0 END)
                       OVER (PARTITION BY u ORDER BY ts_ns, eid
                             ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM lagd
        )
        SELECT u AS {user_col},
               CAST(session_seq AS BIGINT) AS session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(ts_ns) // 1000000 AS BIGINT) AS start_ms,
               CAST(max(ts_ns) // 1000000 AS BIGINT) AS end_ms,
               CAST((max(ts_ns) - min(ts_ns)) // 1000000000 AS BIGINT)
                   AS duration_s
        FROM seq GROUP BY u, session_seq
    """
