"""DSIR importance-resampling operator properties (operators/dsir.py):
an independent pure-Python reference implementation, selection
determinism, and the containment-pairs dual of the Jaccard op."""

import hashlib
import math

import pyspark.sql.functions as F
from pyspark.sql import Row

from deltaforge_spark.operators.dedup import (
    containment_lsh_pairs,
    shingle_containment_pairs,
)
from deltaforge_spark.operators.dsir import (
    doc_dsir_weights,
    doc_gram_buckets,
    dsir_select,
)

DOCS = [
    Row(doc_id=1, text="alpha beta gamma alpha beta"),
    Row(doc_id=2, text="alpha beta gamma delta"),
    Row(doc_id=3, text="noise words totally unrelated junk tokens here"),
    Row(doc_id=4, text="more noise junk filler spam spam spam"),
    Row(doc_id=5, text="alpha beta gamma"),
    Row(doc_id=6, text="solo"),
]


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))


def _py_dsir(docs, target_ids, n_buckets=4096, seed="dsir"):
    """Independent reference: bag-of-hashed-uni+bigram models with
    add-one smoothing, micro-nat integer dot product."""
    def grams(text):
        toks = [t for t in text.strip().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def buckets(text):
        out = {}
        for g in grams(text):
            b = _h48(f"{seed}:{g}") % n_buckets
            out[b] = out.get(b, 0) + 1
        return out

    raw, tgt = {}, {}
    for d in docs:
        for b, c in buckets(d.text).items():
            raw[b] = raw.get(b, 0) + c
            if d.doc_id in target_ids:
                tgt[b] = tgt.get(b, 0) + c
    score = {
        b: _round_half_away(math.log(tgt.get(b, 0) + 1) - math.log(c + 1))
        for b, c in raw.items()
    }
    norm = _round_half_away(
        math.log(sum(raw.values()) + n_buckets)
        - math.log(sum(tgt.values()) + n_buckets)
    )
    out = {}
    for d in docs:
        bs = buckets(d.text)
        n = sum(bs.values())
        if n == 0:
            continue
        micro = sum(c * score.get(b, 0) for b, c in bs.items()) + n * norm
        out[d.doc_id] = (n, round(micro / 1e6, 6))
    return out


def test_dsir_weights_match_python_reference(spark):
    df = spark.createDataFrame(DOCS)
    target = df.filter(F.col("doc_id") <= 2)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in doc_dsir_weights(df, df, target).collect()
    }
    assert got == _py_dsir(DOCS, {1, 2})


def test_dsir_weights_rank_target_like_docs_higher(spark):
    df = spark.createDataFrame(DOCS)
    target = df.filter(F.col("doc_id") <= 2)
    w = {r["doc_id"]: r["log_weight"] for r in doc_dsir_weights(df, df, target).collect()}
    # doc 5 shares all its grams with the target; docs 3/4 share none
    assert w[5] > w[3] and w[5] > w[4]


def test_gram_buckets_single_token_no_bigram(spark):
    df = spark.createDataFrame([Row(doc_id=6, text="solo")])
    n = doc_gram_buckets(df).agg(F.sum("cnt")).collect()[0][0]
    assert n == 1  # sequence(1, 0) guard: no phantom bigrams


def test_gram_buckets_empty_doc_absent(spark):
    df = spark.createDataFrame([Row(doc_id=9, text="   "), Row(doc_id=1, text="a b")])
    ids = {r["doc_id"] for r in doc_gram_buckets(df).select("doc_id").distinct().collect()}
    assert ids == {1}


def test_dsir_weights_reshard_deterministic(spark):
    df = spark.createDataFrame(DOCS)
    target = df.filter(F.col("doc_id") <= 2)
    a = sorted(
        (r["doc_id"], r["log_weight"])
        for r in doc_dsir_weights(df, df, target).collect()
    )
    b = sorted(
        (r["doc_id"], r["log_weight"])
        for r in doc_dsir_weights(
            df.repartition(11), df.repartition(5), target.repartition(3)
        ).collect()
    )
    assert a == b


def test_dsir_select_deterministic_and_bounded(spark):
    df = spark.createDataFrame(DOCS)
    target = df.filter(F.col("doc_id") <= 2)
    w = doc_dsir_weights(df, df, target)
    a = [r["doc_id"] for r in dsir_select(w, k=3).collect()]
    b = [r["doc_id"] for r in dsir_select(w.repartition(7), k=3).collect()]
    assert len(a) == 3 and sorted(a) == sorted(b)  # reshard-stable
    c = [r["doc_id"] for r in dsir_select(w, k=3, seed="other").collect()]
    assert len(c) == 3  # different seed still yields k rows


def test_containment_catches_subset_jaccard_misses(spark):
    docs = [
        Row(doc_id=1, text="the quick brown fox jumps"),  # 3 trigrams
        Row(
            doc_id=2,
            text=(" ".join(f"w{i}" for i in range(40))
                  + " the quick brown fox jumps"),
        ),  # contains doc 1 wholesale
        Row(doc_id=3, text="completely different words about engines"),
    ]
    df = spark.createDataFrame(docs)
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in shingle_containment_pairs(
            df, text_col="text", id_col="doc_id", threshold=0.8
        ).collect()
    }
    pair = out[(1, 2)]
    assert pair["c_a_in_b"] == 1.0  # every trigram of doc 1 is in doc 2
    assert pair["c_b_in_a"] < 0.2
    assert pair["containment"] == 1.0
    assert (1, 3) not in out and (2, 3) not in out
    # jaccard on the same pair is diluted far below the threshold
    assert pair["n_inter"] / (3 + 44 - pair["n_inter"]) < 0.1


def test_containment_lsh_estimates_track_exact_on_subset(spark):
    base = " ".join(f"w{i}" for i in range(30))
    docs = [
        Row(doc_id=1, text=base),                       # subset
        Row(doc_id=2, text=base + " x1 x2 x3"),         # superset of doc 1
        Row(doc_id=3, text=" ".join(f"z{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(docs)
    est = {
        (r["doc_a"], r["doc_b"]): r
        for r in containment_lsh_pairs(
            df, text_col="text", id_col="doc_id", threshold=0.5
        ).collect()
    }
    pair = est[(1, 2)]
    # identical signatures on near-identical shingle sets -> J_est near
    # 1 -> derived containment near/at the cap; disjoint doc 3 absent
    assert pair["containment_est"] >= 0.9
    assert pair["c_a_in_b_est"] >= pair["c_b_in_a_est"]  # subset side saturates
    assert not any(3 in p for p in est)


def test_containment_hot_shingle_pruning_bounds_join(spark):
    docs = [
        Row(doc_id=i, text=f"common boiler plate unique{i} tail{i} end{i}")
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(docs)
    full = shingle_containment_pairs(
        df, text_col="text", id_col="doc_id", threshold=0.0
    )
    pruned = shingle_containment_pairs(
        df, text_col="text", id_col="doc_id", threshold=0.0, max_doc_freq=2
    )
    # every pair overlaps ONLY on the boilerplate trigram (doc-freq 5);
    # DF-pruning removes that key from the join so the quadratic hot-key
    # blowup — 10 pairs here, D² at scale — never materializes
    assert full.count() == 10
    assert pruned.count() == 0
