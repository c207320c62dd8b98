"""As-of join: enrich each left row with the most recent right row at
or before its event time, per key.

The canonical time-series operator Spark's join surface lacks
(Flink temporal joins / kdb aj / DuckDB ASOF JOIN). Used in event
pipelines to stamp each event with the prevailing state of a slowly
changing stream — last price before a trade, last session start before
a click, last config change before a metric.

Spark expression — the union-and-carry pattern, NOT a range join:

1. tag right rows (carrying their payload) and left rows (null
   payload), union them;
2. one hash shuffle on the key + partition-local sort by
   (time, side-tag);
3. ``last(payload, ignorenulls) OVER (PARTITION BY key ORDER BY time,
   tag ROWS UNBOUNDED PRECEDING)`` carries the latest right payload
   forward onto every subsequent left row;
4. keep the left rows.

Scale: exactly ONE shuffle on the join key (what any keyed join pays)
and a spillable partition-local sort. A naive range join
(``l.ts >= r.ts`` + window-max dedup) materializes O(|L|·|R|) pairs
per key before pruning — quadratic in key hotness; the carry pattern
stays O(|L|+|R|) per key regardless of skew in time.

Tie policy: a right row AT the same timestamp matches (<=, like
DuckDB ASOF JOIN's default); the side tag sorts right rows before
left rows at equal times to make that exact. Among multiple right
rows at the same (key, time) the LAST in (deterministic tiebreak
column) order wins — pass ``right_order`` to pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the latest
    ``right`` row with ``right.on <= left.on`` and equal ``by`` key
    (null payload when no prior right row exists).

    ``right_cols`` names the right payload columns to carry (appended
    with ``suffix``). ``right_order`` breaks ties among right rows at
    the same (by, on) — defaults to the first payload column.
    """
    order_col = right_order or right_cols[0]
    payload = F.struct(*[F.col(c) for c in right_cols])

    r = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),  # right sorts first at equal times → <=
        F.col(order_col).alias("_rord"),
        payload.alias("_payload"),
    )
    l = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rord"].dataType).alias("_rord"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType))

    w = (
        Window.partitionBy("_by")
        .orderBy("_on", "_side", "_rord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r.select(*l.columns))
        .withColumn("_carry", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_carry.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_cols)
