"""Time-series rollups: gap-filled dense buckets and exact percentiles.

The reference's event stream analytics stop at windowed aggregation;
a warehouse consumer of its lake sink immediately needs the two
standard follow-ups — continuous (gap-free) rollups and latency-style
percentile summaries. Both are expressed here as pure DataFrame
algebra with deterministic cross-engine semantics.

Scale shapes:

- ``gap_fill_forward``: one groupBy on (key, bucket) with map-side
  combine, a per-key min/max agg (rows = #keys), a ``sequence`` explode
  that generates only the dense bucket range (output-proportional, no
  cross join against a calendar dimension), one equi-join back on
  (key, bucket), and one per-key ordered window for the forward fill.
  The window partitions by key — no global sort, no single-task stage.

- ``percentiles_exact``: one per-key ordered window (rank + count),
  a filter that keeps at most 2 rows per (key, quantile) — the two
  order statistics each interpolation needs — then a tiny final agg.
  The full sort is per-key and spills; the post-filter data is O(#keys).
  This is the exact-audit twin of ``percentile_approx`` — at 100 TB you
  run the approx form for dashboards and this form for sign-off.

Determinism: sums are carried as fixed-scale decimals (never floating
doubles, whose distributed accumulation order is nondeterministic);
interpolation ``v_lo + frac * (v_hi - v_lo)`` is the one double
expression, written identically in the SQL oracle so both engines run
the same IEEE ops in the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill_forward(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    *,
    scale: str = "decimal(18,4)",
) -> DataFrame:
    """Dense per-key bucket series with forward-filled aggregates.

    Aggregates ``value_col`` (sum, as exact decimal) per (key, bucket),
    generates every bucket between each key's min and max, and carries
    the last observed sum forward across empty buckets. Output columns:
    key, bucket, ``n`` (rows in bucket, 0 for gaps), ``sum_value``
    (NULL in gaps), ``filled_value`` (forward-filled), ``is_gap``.
    """
    agg = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(bucket_col).cast("long").alias("b"),
            F.col(value_col).cast(scale).alias("v"),
        )
        .groupBy("k", "b")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").cast("decimal(38,4)").alias("sum_v"),
        )
    )
    bounds = agg.groupBy("k").agg(F.min("b").alias("mn"), F.max("b").alias("mx"))
    dense = bounds.select(
        "k", F.explode(F.sequence("mn", "mx")).alias("b")
    )
    joined = dense.join(agg, ["k", "b"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("k").alias(key_col),
        F.col("b").alias(bucket_col),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.col("sum_v").cast("string").alias("sum_value"),
        F.last("sum_v", ignorenulls=True).over(w).cast("string").alias("filled_value"),
        F.col("n").isNull().alias("is_gap"),
    )


def gap_fill_oracle_sql(
    events_expr: str, key_sql: str, bucket_sql: str, value_sql: str
) -> str:
    """DuckDB twin: same decimal carry, same dense range, same fill."""
    return f"""
        WITH src AS (
            SELECT {key_sql} AS k, {bucket_sql} AS b,
                   CAST({value_sql} AS DECIMAL(18,4)) AS v
            FROM {events_expr}
        ),
        agg AS (
            SELECT k, b, count(*) AS n,
                   CAST(sum(v) AS DECIMAL(38,4)) AS sum_v
            FROM src GROUP BY k, b
        ),
        bounds AS (SELECT k, min(b) AS mn, max(b) AS mx FROM agg GROUP BY k),
        dense AS (SELECT k, unnest(range(mn, mx + 1)) AS b FROM bounds),
        j AS (
            SELECT dense.k, dense.b, agg.n, agg.sum_v
            FROM dense LEFT JOIN agg ON dense.k = agg.k AND dense.b = agg.b
        )
        SELECT k, b,
               CAST(coalesce(n, 0) AS BIGINT) AS n,
               CAST(sum_v AS VARCHAR) AS sum_value,
               CAST(last_value(sum_v IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS filled_value,
               n IS NULL AS is_gap
        FROM j
    """


def percentiles_exact(
    df: DataFrame, key_col: str, value_col: str, quantiles: list[float]
) -> DataFrame:
    """Exact interpolated percentiles (the ``quantile_cont`` definition:
    pos = (n-1)*q, linear interpolation between the two adjacent order
    statistics) per key, one output row per (key, quantile)."""
    w = Window.partitionBy("k").orderBy("v")
    ranked = df.select(
        F.col(key_col).alias("k"), F.col(value_col).cast("double").alias("v")
    ).select(
        "k",
        "v",
        (F.row_number().over(w) - 1).cast("long").alias("rnk"),
        F.count("*").over(Window.partitionBy("k")).cast("long").alias("n"),
    )
    parts = []
    for q in quantiles:
        pos = (F.col("n") - 1).cast("double") * F.lit(q)
        lo = F.floor(pos).cast("long")
        part = (
            ranked.where((F.col("rnk") == lo) | (F.col("rnk") == lo + 1))
            .groupBy("k", "n")
            .agg(
                F.min(F.when(F.col("rnk") == F.floor((F.col("n") - 1).cast("double") * F.lit(q)).cast("long"), F.col("v"))).alias("v_lo"),
                F.min(F.when(F.col("rnk") == F.floor((F.col("n") - 1).cast("double") * F.lit(q)).cast("long") + 1, F.col("v"))).alias("v_hi"),
            )
            .select(
                "k",
                F.lit(q).alias("q"),
                (
                    F.col("v_lo")
                    + ((F.col("n") - 1).cast("double") * F.lit(q)
                       - F.floor((F.col("n") - 1).cast("double") * F.lit(q)))
                    * (F.coalesce(F.col("v_hi"), F.col("v_lo")) - F.col("v_lo"))
                ).alias("value"),
            )
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(F.col("k").alias(key_col), "q", "value")


def percentiles_oracle_sql(
    events_expr: str, key_sql: str, value_sql: str, quantiles: list[float]
) -> str:
    """DuckDB twin with the IDENTICAL interpolation expression (not the
    engine's quantile_cont, whose internal arithmetic we don't control)."""
    selects = []
    for q in quantiles:
        # e-notation keeps the literal DOUBLE in DuckDB (a bare 0.5 parses
        # as DECIMAL and would change the interpolation arithmetic).
        qd = f"{q!r}e0"
        selects.append(f"""
        SELECT k, CAST({qd} AS DOUBLE) AS q,
               min(CASE WHEN rnk = CAST(floor((n - 1) * {qd}) AS BIGINT) THEN v END)
               + ((n - 1) * {qd} - floor((n - 1) * {qd}))
                 * (coalesce(
                        min(CASE WHEN rnk = CAST(floor((n - 1) * {qd}) AS BIGINT) + 1 THEN v END),
                        min(CASE WHEN rnk = CAST(floor((n - 1) * {qd}) AS BIGINT) THEN v END))
                    - min(CASE WHEN rnk = CAST(floor((n - 1) * {qd}) AS BIGINT) THEN v END))
               AS value
        FROM ranked
        WHERE rnk = CAST(floor((n - 1) * {qd}) AS BIGINT)
           OR rnk = CAST(floor((n - 1) * {qd}) AS BIGINT) + 1
        GROUP BY k, n
        """)
    union = " UNION ALL ".join(selects)
    return f"""
        WITH src AS (
            SELECT {key_sql} AS k, CAST({value_sql} AS DOUBLE) AS v
            FROM {events_expr}
        ),
        ranked AS (
            SELECT k, v,
                   CAST(row_number() OVER (PARTITION BY k ORDER BY v) - 1 AS BIGINT) AS rnk,
                   CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
            FROM src
        )
        {union}
    """


def anomalies_rolling_z(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    *,
    window: int = 24,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over per-(key, bucket) counts.

    Counts rows per (key, bucket), densifies the bucket range per key
    (a silent gap IS the anomaly a monitor must see — zero-count
    buckets enter the statistics and can themselves be flagged), then
    scores each bucket against the mean/std of the ``window`` buckets
    strictly BEFORE it (trailing, exclusive — the current value never
    contaminates its own baseline). Rows without a full trailing window
    are not scored.

    Scale shape: one (key, bucket) groupBy with map-side combine, the
    same output-proportional ``sequence`` densification as
    ``gap_fill_forward``, and one per-key ordered window — parallelism
    = #keys, state = ``window`` rows per task frame.

    Determinism: counts are integers; variance uses the sum-of-squares
    identity ``(sumsq - sum*sum/cnt) / cnt`` with integer sums, so both
    engines run the same double ops in the same order; IEEE-754 sqrt is
    correctly rounded, so std and z match bit-for-bit before the final
    6dp rounding.
    """
    agg = (
        df.select(F.col(key_col).alias("k"), F.col(bucket_col).cast("long").alias("b"))
        .groupBy("k", "b")
        .agg(F.count("*").alias("n"))
    )
    bounds = agg.groupBy("k").agg(F.min("b").alias("mn"), F.max("b").alias("mx"))
    dense = bounds.select("k", F.explode(F.sequence("mn", "mx")).alias("b"))
    counts = dense.join(agg, ["k", "b"], "left").select(
        "k", "b", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    )
    w = Window.partitionBy("k").orderBy("b").rowsBetween(-window, -1)
    stats = counts.select(
        "k",
        "b",
        "n",
        F.count("n").over(w).alias("cnt_w"),
        F.sum("n").over(w).cast("long").alias("sum_w"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("sumsq_w"),
    ).where(F.col("cnt_w") == window)
    mean = F.col("sum_w").cast("double") / F.lit(float(window))
    var = (
        F.col("sumsq_w").cast("double")
        - F.col("sum_w").cast("double") * F.col("sum_w").cast("double") / F.lit(float(window))
    ) / F.lit(float(window))
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("n").cast("double") - mean) / std)
    # std == 0 means the trailing window was perfectly constant: any
    # departure from that constant is infinite-sigma — flag on inequality
    # rather than dividing by zero (z stays NULL there).
    anomalous = F.when(std > 0, F.abs(z) > F.lit(z_thresh)).otherwise(
        F.col("n").cast("double") != mean
    )
    return stats.select(
        F.col("k").alias(key_col),
        F.col("b").alias(bucket_col),
        "n",
        F.round(mean, 6).alias("mean_w"),
        F.round(std, 6).alias("std_w"),
        F.round(z, 6).alias("z"),
        anomalous.alias("is_anomaly"),
    )


def anomalies_oracle_sql(
    events_expr: str,
    key_sql: str,
    bucket_sql: str,
    *,
    window: int = 24,
    z_thresh: float = 3.0,
) -> str:
    """DuckDB twin of anomalies_rolling_z — identical densification,
    identical trailing-exclusive frame, identical variance identity."""
    wf = float(window)
    return f"""
        WITH src AS (
            SELECT {key_sql} AS k, {bucket_sql} AS b FROM {events_expr}
        ),
        agg AS (SELECT k, b, count(*) AS n FROM src GROUP BY k, b),
        bounds AS (SELECT k, min(b) AS mn, max(b) AS mx FROM agg GROUP BY k),
        dense AS (SELECT k, unnest(range(mn, mx + 1)) AS b FROM bounds),
        counts AS (
            SELECT dense.k, dense.b,
                   CAST(coalesce(agg.n, 0) AS BIGINT) AS n
            FROM dense LEFT JOIN agg ON dense.k = agg.k AND dense.b = agg.b
        ),
        stats AS (
            SELECT k, b, n,
                   count(n) OVER tw AS cnt_w,
                   CAST(sum(n) OVER tw AS BIGINT) AS sum_w,
                   CAST(sum(n * n) OVER tw AS BIGINT) AS sumsq_w
            FROM counts
            WINDOW tw AS (PARTITION BY k ORDER BY b
                          ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)
        ),
        scored AS (
            SELECT k, b, n,
                   CAST(sum_w AS DOUBLE) / {wf!r}e0 AS mean_w,
                   sqrt((CAST(sumsq_w AS DOUBLE)
                         - CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE) / {wf!r}e0)
                        / {wf!r}e0) AS std_w
            FROM stats WHERE cnt_w = {window}
        )
        SELECT k, b, n,
               round(mean_w, 6) AS mean_w,
               round(std_w, 6) AS std_w,
               round(CASE WHEN std_w > 0
                          THEN (CAST(n AS DOUBLE) - mean_w) / std_w END, 6) AS z,
               CASE WHEN std_w > 0
                    THEN abs((CAST(n AS DOUBLE) - mean_w) / std_w) > {z_thresh!r}e0
                    ELSE CAST(n AS DOUBLE) != mean_w
               END AS is_anomaly
        FROM scored
    """
