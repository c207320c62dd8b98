"""Differential property tests: gap-fill and rolling-z vs independent
Python models (same pattern as test_flatten_differential / the span
property tests — the Spark column algebra must match a brute-force
reimplementation on arbitrary inputs)."""

import math
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from deltaforge_spark.operators.timeseries import anomalies_rolling_z, gap_fill_forward

# small alphabets force key collisions and adjacent/duplicate buckets
_keys = st.sampled_from(["a", "b"])
_buckets = st.integers(min_value=0, max_value=12)
_values = st.decimals(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, places=2
)
_rows = st.lists(st.tuples(_keys, _buckets, _values), min_size=1, max_size=30)


def _gap_fill_model(rows):
    """Brute-force model of gap_fill_forward."""
    agg: dict = {}
    for k, b, v in rows:
        n, s = agg.get((k, b), (0, Decimal(0)))
        agg[(k, b)] = (n + 1, s + v)
    out = {}
    for k in {k for k, _, _ in rows}:
        bs = [b for (kk, b) in agg if kk == k]
        last = None
        for b in range(min(bs), max(bs) + 1):
            if (k, b) in agg:
                n, s = agg[(k, b)]
                last = s
                out[(k, b)] = (n, s, last, False)
            else:
                out[(k, b)] = (0, None, last, True)
    return out


@settings(max_examples=12, deadline=None)
@given(_rows)
def test_gap_fill_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(k, b, float(v)) for k, b, v in rows], ["k", "b", "v"]
    )
    got = {
        (r["k"], r["b"]): r for r in gap_fill_forward(df, "k", "b", "v").collect()
    }
    model = _gap_fill_model(rows)
    assert set(got) == set(model)
    for key, (n, s, last, is_gap) in model.items():
        r = got[key]
        assert r["n"] == n and r["is_gap"] == is_gap, key
        fmt = lambda d: None if d is None else f"{d.quantize(Decimal('0.0001')):f}"
        assert r["sum_value"] == fmt(s), key
        assert r["filled_value"] == fmt(last), key


def _anomaly_model(rows, window, z_thresh=3.0):
    """Brute-force model of anomalies_rolling_z."""
    counts: dict = {}
    for k, b in rows:
        counts[(k, b)] = counts.get((k, b), 0) + 1
    out = {}
    for k in {k for k, _ in rows}:
        bs = [b for (kk, b) in counts if kk == k]
        dense = {b: counts.get((k, b), 0) for b in range(min(bs), max(bs) + 1)}
        order = sorted(dense)
        for i, b in enumerate(order):
            if i < window:
                continue
            base = [dense[order[j]] for j in range(i - window, i)]
            mean = sum(base) / float(window)
            var = (sum(x * x for x in base) - sum(base) ** 2 / float(window)) / float(window)
            std = math.sqrt(var) if var > 0 else 0.0
            n = dense[b]
            if std > 0:
                z = (n - mean) / std
                flag = abs(z) > z_thresh
            else:
                z = None
                flag = float(n) != mean
            out[(k, b)] = (n, round(mean, 6), round(std, 6), flag)
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_keys, _buckets), min_size=1, max_size=40))
def test_anomalies_match_model(spark, rows):
    window = 3
    df = spark.createDataFrame(rows, ["k", "b"])
    got = {
        (r["k"], r["b"]): r
        for r in anomalies_rolling_z(df, "k", "b", window=window).collect()
    }
    model = _anomaly_model(rows, window)
    assert set(got) == set(model)
    for key, (n, mean, std, flag) in model.items():
        r = got[key]
        assert r["n"] == n, key
        assert abs(r["mean_w"] - mean) < 1e-9, key
        assert abs(r["std_w"] - std) < 1e-9, key
        assert r["is_anomaly"] == flag, key
