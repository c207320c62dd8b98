"""Sketch + time-series operators: HLL distinct, gap-fill, percentiles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.sketches import hll_distinct, hll_registers
from deltaforge_spark.operators.timeseries import gap_fill_forward, percentiles_exact


def test_hll_estimate_accuracy(spark):  # noqa: F811
    # 2000 distinct values; p=6 (m=64) has ~13% standard error — assert 3 sigma.
    df = spark.range(2000).select(F.concat(F.lit("v"), F.col("id")).alias("val"))
    row = hll_distinct(df, [], "val", p=6).collect()[0]
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.4
    assert row["used_buckets"] + row["zero_buckets"] == 64


def test_hll_small_range_correction(spark):  # noqa: F811
    # 5 distinct values: most buckets empty -> linear counting path; the
    # estimate should be nearly exact for tiny cardinalities.
    df = spark.createDataFrame([(f"x{i}",) for i in range(5)], ["val"])
    row = hll_distinct(df, [], "val", p=6).collect()[0]
    assert row["zero_buckets"] >= 59
    assert abs(row["est_distinct"] - 5) <= 1


def test_hll_duplicates_do_not_move_estimate(spark):  # noqa: F811
    base = [(f"k{i % 50}",) for i in range(50)]
    df1 = spark.createDataFrame(base, ["val"])
    df2 = spark.createDataFrame(base * 40, ["val"])  # same distinct set, 40x rows
    r1 = hll_distinct(df1, [], "val").collect()[0]
    r2 = hll_distinct(df2, [], "val").collect()[0]
    assert r1["est_distinct"] == r2["est_distinct"]
    assert r1["harmonic_sum_scaled"] == r2["harmonic_sum_scaled"]


def test_hll_registers_merge_by_max(spark):  # noqa: F811
    # Sketch state is mergeable: registers(A ∪ B) == max-merge of
    # registers(A), registers(B) — the property that makes it a
    # partial-aggregatable distributed aggregate.
    a = spark.range(0, 500).select(F.col("id").cast("string").alias("val"))
    b = spark.range(300, 900).select(F.col("id").cast("string").alias("val"))
    whole = {
        r["bucket"]: r["m_j"]
        for r in hll_registers(a.union(b), [], "val").collect()
    }
    ra = {r["bucket"]: r["m_j"] for r in hll_registers(a, [], "val").collect()}
    rb = {r["bucket"]: r["m_j"] for r in hll_registers(b, [], "val").collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert whole == merged


def test_gap_fill_forward(spark):  # noqa: F811
    rows = [
        ("a", 1, 10.0),
        ("a", 1, 2.0),
        ("a", 4, 7.0),
        ("b", 10, 1.0),
        ("b", 12, 3.0),
    ]
    df = spark.createDataFrame(rows, ["k", "b", "v"])
    out = {
        (r["k"], r["b"]): r
        for r in gap_fill_forward(df, "k", "b", "v").collect()
    }
    # dense range per key, nothing outside [min, max]
    assert sorted(k for k in out) == [
        ("a", 1), ("a", 2), ("a", 3), ("a", 4),
        ("b", 10), ("b", 11), ("b", 12),
    ]
    assert out[("a", 1)]["n"] == 2 and out[("a", 1)]["sum_value"] == "12.0000"
    assert out[("a", 2)]["is_gap"] and out[("a", 2)]["sum_value"] is None
    # forward fill carries the last observed sum across the gap
    assert out[("a", 2)]["filled_value"] == "12.0000"
    assert out[("a", 3)]["filled_value"] == "12.0000"
    assert out[("a", 4)]["filled_value"] == "7.0000"
    assert out[("b", 11)]["filled_value"] == "1.0000"
    assert not out[("b", 12)]["is_gap"]


def test_percentiles_match_numpy(spark):  # noqa: F811
    vals = [3.5, 1.0, 9.25, 4.0, 8.5, 2.75, 7.0, 0.5, 6.125, 5.0, 11.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["k", "v"])
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        r["q"]: r["value"]
        for r in percentiles_exact(df, "k", "v", qs).collect()
    }
    for q in qs:
        expected = float(np.percentile(vals, q * 100, method="linear"))
        assert got[q] == pytest.approx(expected, abs=1e-12), q


def test_percentiles_multiple_keys(spark):  # noqa: F811
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(101)] + [("b", 42.0)], ["k", "v"]
    )
    got = {
        (r["k"], r["q"]): r["value"]
        for r in percentiles_exact(df, "k", "v", [0.5, 0.99]).collect()
    }
    assert got[("a", 0.5)] == 50.0
    assert got[("a", 0.99)] == 99.0
    # single-element group: every quantile is that element
    assert got[("b", 0.5)] == 42.0
    assert got[("b", 0.99)] == 42.0


def test_anomalies_rolling_z_flags_spike_and_gap(spark):
    from deltaforge_spark.operators.timeseries import anomalies_rolling_z

    # steady 5 rows/bucket for 30 buckets, a moderate 9-row spike at 31,
    # then a silent bucket (32 missing entirely -> zero count via
    # densification). A moderate spike keeps the trailing std small so
    # the silent bucket is a genuine >3-sigma departure; a huge spike
    # would inflate std and mask it — exactly the robustness property
    # the windowed estimator is supposed to have.
    rows = []
    for b in range(1, 31):
        rows += [("svc", b)] * 5
    rows += [("svc", 31)] * 9
    rows += [("svc", 33)] * 5
    df = spark.createDataFrame(rows, ["k", "b"])
    out = {r["b"]: r for r in anomalies_rolling_z(df, "k", "b", window=24).collect()}
    # first scored bucket is 25 (needs 24 full trailing buckets)
    assert min(out) == 25
    # steady state: constant baseline (std == 0) and n == mean -> quiet
    assert not out[30]["is_anomaly"] and out[30]["z"] is None
    # the spike: baseline still constant (std == 0), so any departure
    # from the constant is infinite-sigma -> flagged with NULL z
    assert out[31]["is_anomaly"] and out[31]["n"] == 9 and out[31]["z"] is None
    # the silent bucket: baseline = 23 fives + one 9 -> small std, and
    # zero sits far below the mean -> flagged with a real z
    assert out[32]["n"] == 0 and out[32]["is_anomaly"] and out[32]["z"] < -3


def test_anomalies_deterministic_stats(spark):
    from deltaforge_spark.operators.timeseries import anomalies_rolling_z

    rows = [("a", b) for b in range(1, 30) for _ in range(b % 5 + 1)]
    df = spark.createDataFrame(rows, ["k", "b"])
    out = anomalies_rolling_z(df, "k", "b", window=4).collect()
    import statistics

    counts = {b: b % 5 + 1 for b in range(1, 30)}
    for r in out:
        base = [counts[x] for x in range(r["b"] - 4, r["b"])]
        assert r["mean_w"] == pytest.approx(statistics.mean(base), abs=1e-6)
        assert r["std_w"] == pytest.approx(statistics.pstdev(base), abs=1e-6)


def test_url_canonicalization_rules(spark):
    from deltaforge_spark.operators.urls import canonical_url, url_host

    cases = [
        # (input, canonical, host)
        ("HTTP://WWW.Ex.COM:80/A/b?z=1&a=2#frag", "http://ex.com/A/b?a=2&z=1", "ex.com"),
        ("https://ex.com:443/x", "https://ex.com/x", "ex.com"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x", "ex.com"),  # non-default port kept
        ("http://ex.com/p?utm_source=a&utm_medium=b&gclid=1&fbclid=2", "http://ex.com/p", "ex.com"),
        ("https://www.ex.com/p/", "https://ex.com/p/", "ex.com"),  # trailing slash preserved
        ("https://ex.com/CaseSensitive/Path", "https://ex.com/CaseSensitive/Path", "ex.com"),
        ("https://ex.com/p?b=2&a=1&utm_campaign=x", "https://ex.com/p?a=1&b=2", "ex.com"),
        ("https://ex.com", "https://ex.com", "ex.com"),  # no path
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    out = df.select(
        "url", canonical_url(F.col("url")).alias("c"), url_host(F.col("url")).alias("h")
    ).collect()
    got = {r["url"]: (r["c"], r["h"]) for r in out}
    for url, canon, host in cases:
        assert got[url] == (canon, host), url


def test_url_dedup_rank_keeps_first(spark):
    from deltaforge_spark.operators.urls import url_dedup_rank

    rows = [
        (1, "https://ex.com/a?x=1&utm_source=s"),
        (2, "HTTPS://WWW.ex.com:443/a?x=1"),   # same canonical as 1
        (3, "https://ex.com/a?x=2"),           # different query -> distinct
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["doc_id"]: r for r in url_dedup_rank(df, "url", "doc_id").collect()}
    assert out[1]["canonical_url"] == out[2]["canonical_url"]
    assert out[1]["dup_rank"] == 1 and out[2]["dup_rank"] == 2
    assert out[3]["dup_rank"] == 1


def test_kmv_estimate_and_exact_below_k(spark):
    from deltaforge_spark.operators.sketches import kmv_estimate, kmv_sketch

    # 40 distinct < k=64 -> sketch holds all hashes, estimate is exact
    small = spark.range(40).select(F.col("id").cast("string").alias("v"))
    row = kmv_sketch(small, [], "v", k=64).select(
        kmv_estimate(F.col("kmv"), 64).alias("est"), "kmv_size"
    ).collect()[0]
    assert row["kmv_size"] == 40 and row["est"] == 40
    # 5000 distinct -> KMV with k=64 has ~1/sqrt(62) ~ 13% std error
    big = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    est = kmv_sketch(big, [], "v", k=64).select(
        kmv_estimate(F.col("kmv"), 64).alias("est")
    ).collect()[0]["est"]
    assert abs(est - 5000) / 5000 < 0.4


def test_kmv_jaccard_tracks_true_overlap(spark):
    from deltaforge_spark.operators.sketches import kmv_jaccard, kmv_sketch

    # A = [0, 1000), B = [500, 1500): true Jaccard = 500/1500 = 1/3
    rows = [("A", i) for i in range(1000)] + [("B", i) for i in range(500, 1500)]
    df = spark.createDataFrame(rows, ["g", "v"]).select(
        "g", F.col("v").cast("string").alias("v")
    )
    sk = kmv_sketch(df, ["g"], "v", k=64)
    a = sk.where(F.col("g") == "A").select(F.col("kmv").alias("ka"))
    b = sk.where(F.col("g") == "B").select(F.col("kmv").alias("kb"))
    j = a.crossJoin(b).select(kmv_jaccard(F.col("ka"), F.col("kb"), 64).alias("j"))
    got = j.collect()[0]["j"]
    # k=64 bottom-k estimator: matches/k is Binomial(64, 1/3) -> 3 sigma ~ 0.18
    assert abs(got - 1 / 3) < 0.25
    # identical sets -> exactly 1.0
    same = a.crossJoin(a.select(F.col("ka").alias("ka2"))).select(
        kmv_jaccard(F.col("ka"), F.col("ka2"), 64).alias("j")
    )
    assert same.collect()[0]["j"] == 1.0


# ------------------------------------------------------------- Bloom filter


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """The Bloom contract: every inserted key is claimed (zero false
    negatives — the property dedup correctness rests on); false
    positives exist and stay within ~3x of the theoretical rate."""
    import math

    from deltaforge_spark.operators.sketches import (
        BLOOM_K,
        BLOOM_M,
        bloom_build,
        bloom_probe,
    )

    members = [(f"g", f"user{i}") for i in range(800)]
    df = spark.createDataFrame(members, ["g", "uid"])
    bits = bloom_build(df, ["g"], "uid")

    # members + disjoint non-members
    probe_rows = [(f"user{i}",) for i in range(800)] + [
        (f"ghost{i}",) for i in range(800)
    ]
    probes = spark.createDataFrame(probe_rows, ["uid"])
    got = {
        r["uid"]: r["claimed"]
        for r in bloom_probe(probes, bits, "uid", filter_group_cols=["g"]).collect()
    }
    assert all(got[f"user{i}"] for i in range(800)), "false negative!"
    fp = sum(1 for i in range(800) if got[f"ghost{i}"]) / 800
    theory = (1 - math.exp(-BLOOM_K * 800 / BLOOM_M)) ** BLOOM_K
    assert fp <= 3 * theory + 0.02, (fp, theory)


def test_bloom_merge_is_union_of_bits(spark):
    """Mergeability: bloom(A ∪ B) == distinct(bloom(A) ∪ bloom(B)) —
    the property an incremental backfill relies on."""
    from deltaforge_spark.operators.sketches import bloom_build

    a = spark.createDataFrame([("g", f"a{i}") for i in range(50)], ["g", "uid"])
    b = spark.createDataFrame([("g", f"b{i}") for i in range(50)], ["g", "uid"])
    whole = {tuple(r) for r in bloom_build(a.union(b), ["g"], "uid").collect()}
    merged = {
        tuple(r)
        for r in bloom_build(a, ["g"], "uid")
        .union(bloom_build(b, ["g"], "uid"))
        .distinct()
        .collect()
    }
    assert whole == merged and len(whole) > 0
