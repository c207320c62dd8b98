"""Ordered funnel (operators/funnel.py): strict-order semantics pinned
on hand-built event sequences."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from deltaforge_spark.operators.funnel import funnel_counts, funnel_user_times


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=ts) for u, t, ts in rows]
    )


def test_strict_order_required(spark):
    # user 1: full ordered funnel; user 2: purchase BEFORE click — step 3
    # not reached; user 3: signup only
    df = _events(
        spark,
        [
            (1, "signup", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "signup", 10), (2, "purchase", 15), (2, "click", 20),
            (3, "signup", 5),
        ],
    )
    got = {r["step"]: r for r in funnel_counts(df, steps=["signup", "click", "purchase"]).collect()}
    assert got[1]["n_users"] == 3
    assert got[2]["n_users"] == 2
    assert got[3]["n_users"] == 1
    assert abs(got[3]["pct_of_first"] - round(1 / 3, 6)) < 1e-9


def test_earliest_valid_occurrence(spark):
    # click at ts=5 (before signup) must NOT count; the ts=25 click does
    df = _events(spark, [(7, "click", 5), (7, "signup", 10), (7, "click", 25)])
    t = funnel_user_times(df, steps=["signup", "click"]).collect()[0]
    assert t["t0"] == 10 and t["t1"] == 25


def test_equal_timestamp_is_not_after(spark):
    df = _events(spark, [(9, "signup", 10), (9, "click", 10)])
    t = funnel_user_times(df, steps=["signup", "click"]).collect()[0]
    assert t["t0"] == 10 and t["t1"] is None


def test_cohort_retention_matrix(spark):
    from deltaforge_spark.operators.funnel import cohort_retention

    W = 7 * 24 * 3600 * int(1e9)  # one period in nanos
    rows = [
        # user 1 signs up week 0, active weeks 0 and 2
        (1, "signup", 0), (1, "click", 2 * W + 5),
        # user 2 signs up week 0, active week 0 only
        (2, "signup", 10),
        # user 3 signs up week 1, active weeks 1 and 2
        (3, "signup", W + 3), (3, "view", 2 * W + 9),
        # user 4 never signs up — excluded entirely
        (4, "click", 5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}
