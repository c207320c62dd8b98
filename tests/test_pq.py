"""Product quantization (operators/pq.py): encode determinism, ADC
distance correctness against a direct Python recomputation, Lloyd's
descent, and the codes' compression contract."""

import math

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.pq import (
    QSCALE,
    deterministic_codebook,
    pq_adc_topk,
    pq_distortion,
    pq_encode,
    pq_fit,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.persist().count()
    return df


def _quant(v):
    return [math.floor(float(x) * QSCALE + 0.5) for x in v]


def _encode_py(vq, cb):
    codes = []
    sub = len(cb[0][0])
    for m, cw in enumerate(cb):
        s = vq[m * sub : (m + 1) * sub]
        dists = [sum((a - b) ** 2 for a, b in zip(s, c)) for c in cw]
        codes.append(dists.index(min(dists)))  # first-minimum tie-break
    return codes


def test_encode_matches_python_model(emb):
    cb = deterministic_codebook()
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb).limit(50).collect()}
    raw = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    assert len(got) == 50
    for vid, codes in got.items():
        assert codes == _encode_py(_quant(raw[vid]), cb)
        assert all(0 <= c < 16 for c in codes) and len(codes) == 8


def test_adc_distance_is_exact_lookup_sum(emb):
    cb = deterministic_codebook()
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = {r["match_id"]: r["adc_dist"] for r in pq_adc_topk(emb, q, k=3).collect()}
    raw = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    codes = {vid: _encode_py(_quant(v), cb) for vid, v in raw.items()}
    qq = _quant(raw[0])
    sub = len(cb[0][0])
    for mid, dist in res.items():
        want = 0
        for m, c in enumerate(codes[mid]):
            s = qq[m * sub : (m + 1) * sub]
            cw = cb[m][c]
            want += sum((a - b) ** 2 for a, b in zip(s, cw))
        assert dist == want


def test_adc_topk_shape_and_rank_order(emb):
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = pq_adc_topk(emb, q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"], r["match_id"]))
    assert set(by_q) == {0, 1}
    for qid, rs in by_q.items():
        rs.sort()
        assert [r[0] for r in rs] == [1, 2, 3, 4, 5]
        dists = [r[1] for r in rs]
        assert dists == sorted(dists)
        assert qid not in {r[2] for r in rs}  # self excluded


def test_fit_descends_distortion(emb):
    cb0 = deterministic_codebook()
    d0 = pq_distortion(emb, cb0)
    cb1 = pq_fit(emb, iters=2)
    d1 = pq_distortion(emb, cb1)
    assert d1 < d0 * 0.9  # Lloyd's must actually move

    # refined codebook flows through the same encode/search dataflow
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert pq_adc_topk(emb, q, k=3, codebook=cb1).count() == 3


def test_precomputed_codes_reused(emb):
    """The production shape: encode once, search many."""
    codes = pq_encode(emb)
    codes.persist().count()
    q = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, pq_adc_topk(emb, q, k=5, codes_df=codes).collect()))
    b = sorted(map(tuple, pq_adc_topk(emb, q, k=5).collect()))
    assert a == b
    codes.unpersist()


def test_ivf_pq_subset_of_full_adc(emb):
    """IVF-PQ returns the full-scan ADC answers restricted to probed
    cells: every (query, match, dist) it reports must carry the exact
    same adc_dist the flat scan computes, and higher nprobe can only
    improve agreement with the flat top-k."""
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    from deltaforge_spark.operators.pq import ivf_pq_topk

    flat = {
        (r["query_id"], r["match_id"]): r["adc_dist"]
        for r in pq_adc_topk(emb, q, k=2000).collect()
    }
    routed = ivf_pq_topk(emb, q, k=5, n_cells=8, nprobe=2).collect()
    assert len(routed) == 10
    for r in routed:
        assert flat[(r["query_id"], r["match_id"])] == r["adc_dist"]

    all_cells = {
        (r["query_id"], r["match_id"])
        for r in ivf_pq_topk(emb, q, k=5, n_cells=8, nprobe=8).collect()
    }
    flat_top = {
        (r["query_id"], r["match_id"])
        for r in pq_adc_topk(emb, q, k=5).collect()
    }
    assert all_cells == flat_top  # probing every cell == flat scan


def test_encode_impls_identical(emb):
    """numpy batch and codegen'd column encode are one definition:
    identical codes on real embeddings."""
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, impl="numpy").collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, impl="column").collect()}
    assert a == b and len(a) > 0
