"""As-of join: hand-checkable semantics (before/at/after, per-key
isolation, no-prior-match nulls) and the single-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 250),
            (3, "u1", 300),  # exactly at a right timestamp → matches it
            (4, "u2", 500),
            (5, "u3", 50),  # u3 has no right rows at all
        ],
        "event_id long, user string, ts long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 200, 20.0, 901),
            ("u1", 300, 30.0, 902),
            ("u1", 400, 40.0, 903),  # after every left row → never used
            ("u2", 100, 11.0, 904),
        ],
        "user string, ts long, price double, rid long",
    )
    return left, right


@pytest.mark.spark
def test_asof_semantics(spark, frames):
    left, right = frames
    out = {
        r.event_id: (r.price_asof, r.rid_asof)
        for r in asof_join(
            left, right, on="ts", by="user", right_cols=["price", "rid"]
        ).collect()
    }
    assert out[1] == (None, None)  # before any right row
    assert out[2] == (20.0, 901)  # latest at-or-before 250
    assert out[3] == (30.0, 902)  # equal timestamp matches (<=)
    assert out[4] == (11.0, 904)  # keys never bleed
    assert out[5] == (None, None)  # key with no right rows


@pytest.mark.spark
def test_asof_tie_on_right_order(spark):
    left = spark.createDataFrame([(1, "u", 10)], "event_id long, user string, ts long")
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 10, 9.0)], "user string, ts long, price double"
    )
    out = asof_join(
        left, right, on="ts", by="user", right_cols=["price"], right_order="price"
    ).collect()
    assert out[0].price_asof == 9.0  # max right_order wins at equal time


@pytest.mark.spark
def test_asof_single_shuffle_plan(spark, frames):
    left, right = frames
    import contextlib
    import io

    df = asof_join(left, right, on="ts", by="user", right_cols=["price"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # exactly one hash exchange (the key shuffle); the carry is a
    # window, never a join materializing time-range pairs
    assert p.count("hashpartitioning(_by") == 1, p
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p
