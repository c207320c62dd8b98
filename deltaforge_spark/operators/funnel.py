"""Ordered funnel analysis over an event stream: how many users reach
each step of a required event sequence, where step i+1 must occur
STRICTLY AFTER the user's step-i time (the classic product-analytics
funnel; e.g. view → click → purchase).

Beyond-reference operator (the reference forwards events; it cannot
ask sequence questions — guarantees.md:380 excludes joins/windows).

Scale shape: every step is a conditional ``min`` window over the SAME
``partitionBy(user)`` spec — Catalyst plans ONE exchange on user_id
and evaluates all steps in consecutive window passes over the sorted
partition; the per-user reduction and the final per-step counts are
partial-aggregated. Nothing but (user, ts) pairs ever shuffles. A
power user with millions of events lands in one partition — bounded
by per-user event count (the same bound the sessionization operator
documents), AQE-splittable upstream.

Semantics: step times use the user's EARLIEST valid occurrence
(min ts satisfying the predicate), the standard unordered-scan funnel
definition — deterministic for any event order, no per-row state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_times(
    df: DataFrame,
    *,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user step timestamps: (user, t0..t{n-1}) — t_i is the
    earliest ``steps[i]`` event strictly after t_{i-1} (NULL = step
    never reached; later steps are then NULL by construction)."""
    w = Window.partitionBy("user")
    out = df.select(F.col(user_col).alias("user"), F.col(type_col).alias("_ty"), F.col(ts_col).alias("_ts"))
    prev = None
    for i, step in enumerate(steps):
        cond = F.col("_ty") == step
        if prev is not None:
            cond = cond & (F.col("_ts") > F.col(prev))
        out = out.withColumn(f"t{i}", F.min(F.when(cond, F.col("_ts"))).over(w))
        prev = f"t{i}"
    return out.groupBy("user").agg(
        *[F.first(f"t{i}").alias(f"t{i}") for i in range(len(steps))]
    )


def funnel_counts(
    df: DataFrame,
    *,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The funnel report: one row per step — (step, event_type,
    n_users, pct_of_first rounded 6dp)."""
    times = funnel_user_times(
        df, steps=steps, user_col=user_col, type_col=type_col, ts_col=ts_col
    )
    agg = times.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(len(steps))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    first_n = F.col(f"n0")
    return (
        agg.select(F.explode(rows).alias("r"), first_n.alias("_n0"))
        .select(
            "r.step",
            "r.event_type",
            "r.n_users",
            F.round(F.col("r.n_users") / F.greatest(F.col("_n0"), F.lit(1)), 6).alias(
                "pct_of_first"
            ),
        )
    )


def cohort_retention(
    df: DataFrame,
    *,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST
    ``cohort_event`` period; each later activity period counts them
    once — (cohort_period, period_offset, n_users). The other classic
    product-analytics reduction.

    Scale shape: cohort assignment is one min-agg per user; activity
    is a distinct over (user, period) — both shuffle on user-sized
    keys with partial aggregation; the final matrix groupBy's key
    space is periods², tiny. ``ts`` is epoch NANOS (the engine's
    event-time convention)."""
    # integer division: event-time nanos exceed float64's 53-bit mantissa,
    # so a double divide could mis-floor at period boundaries
    divisor = int(1e9) * bucket_seconds
    period = lambda c: (  # noqa: E731
        ((c - (c % F.lit(divisor))).cast("decimal(38,0)") / F.lit(divisor)).cast("long")
    )
    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("_ty"),
        F.col(ts_col).alias("_ts"),
    )
    cohorts = (
        ev.filter(F.col("_ty") == cohort_event)
        .groupBy("user")
        .agg(period(F.min("_ts")).alias("cohort_period"))
    )
    activity = ev.select("user", period(F.col("_ts")).alias("activity_period")).distinct()
    return (
        activity.join(cohorts, "user")
        .filter(F.col("activity_period") >= F.col("cohort_period"))
        .groupBy(
            "cohort_period",
            (F.col("activity_period") - F.col("cohort_period")).cast("int").alias("period_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
