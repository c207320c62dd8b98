"""Trained quality classifier — fastText-style logistic regression over
hashed n-gram features (Joulin et al. 2016, arXiv:1607.01759), the
discriminative data-filtering tool of the GPT-3 / LLaMA / CCNet corpus
pipelines: train "does this look like the curated target?" against the
raw crawl, keep documents the classifier scores above a threshold.
Complements operators/dsir.py (the generative importance-weight twin).

Model: P(target | x) = sigmoid(w · f(x) + b), where f(x) is the
bag-of-hashed-uni+bigram bucket counts of a document normalized by its
gram count (the fastText mean-of-features input), trained by K rounds
of full-batch gradient descent.

Scale shape (100 TB):
- Features are extracted ONCE into a persisted (doc_id, bucket, cnt,
  n, y) frame — one corpus scan + one (doc,bucket) counts-only
  shuffle; every training round reads the cache, never the raw corpus.
  The cached plan keeps its doc_id hash partitioning (a checkpoint
  would report UnknownPartitioning), so the per-round doc-keyed
  aggregate and join are exchange-free.
- One Spark job per round: per-doc margin (doc-keyed aggregate over
  the cache), probabilities joined back (doc-keyed, 2-column payload),
  then a B-BOUNDED per-bucket gradient aggregate collected O(B) to the
  driver (B = n_buckets, the feature-hashing dimension — same
  bounded-collect class as the DSIR score table and BPE merge table).
- The weight update runs driver-side in exact int64 arithmetic; the
  next round broadcasts the B-row weight table back. K rounds = K
  bounded jobs over the cache; no corpus-sized state ever leaves
  executors.

Determinism (oracle hash-match): weights and bias live in integer
MICRO-units. Per round, both engines compute
    p      = round(sigmoid(dot/(n·1e6) + b/1e6), 6)        (6dp grid)
    g[b]   = Σ_docs round((p − y) · cnt · 1e6 / n)         (exact int)
    w[b]  -= trunc_div(lr_num · g[b], N)                   (exact int)
with expression trees written token-identically (same associativity),
so the doubles agree bit-for-bit and every rounded quantity is an
identical integer. trunc_div truncates toward zero — Spark's DIV and
DuckDB's // semantics — implemented explicitly driver-side because
Python's // floors.

EAGER at build: training (K bounded jobs + O(B) collects) runs when the
operator is constructed. The returned frame is backed by the feature
cache and tagged with ``retain`` — callers release via
``plans.lineage.release_retained`` once consumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.lineage import retain
from .dsir import doc_gram_buckets

_MICRO = 1000000.0


def _tdiv(num: int, den: int) -> int:
    """Integer division truncating toward zero (Spark DIV / DuckDB //);
    Python's // floors, which disagrees on negatives."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den > 0) else -q


def _margin_prob(b_micro: int) -> Column:
    """round(sigmoid(dot/(n*1e6) + b/1e6), 6) — token-identical to the
    oracle's expression tree (same associativity, same literals)."""
    m = (
        F.col("dot").cast("double") / (F.col("n") * F.lit(_MICRO))
        + F.lit(int(b_micro)).cast("double") / F.lit(_MICRO)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 6)


def doc_quality_classifier(
    df: DataFrame,
    *,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    iters: int = 6,
    lr_num: int = 4,
    seed: str = "dsir",
    threshold: float = 0.5,
) -> DataFrame:
    """Train the hashed-feature logistic classifier on ``df`` (docs
    where ``label`` is true are the positive / target class) and score
    every document: (doc_id, n_grams, prob, keep).

    ``lr_num`` is the integer learning-rate numerator: the per-round
    update is w[b] -= trunc(lr_num * g[b] / N) with N the number of
    training documents — mean-gradient semantics, so the effective
    step is scale-free and the same constants work at any corpus size.
    Whitespace-only documents have no features and are excluded (same
    contract as the DSIR weights)."""
    spark = df.sparkSession
    feats_raw = doc_gram_buckets(
        df, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    )
    labels = df.select(
        F.col(id_col).alias("doc_id"), label.cast("int").alias("y")
    )
    per_doc = feats_raw.groupBy("doc_id").agg(F.sum("cnt").cast("long").alias("n"))
    # r13 optimization (guide §2.4): persist() instead of a reliable
    # checkpoint — a checkpoint scan reports UnknownPartitioning, so
    # every round paid TWO corpus-sized doc_id exchanges (margin
    # aggregate + probability join). The cached plan keeps the join's
    # hashpartitioning(doc_id), so each round's groupBy("doc_id") and
    # doc_id join are exchange-free: the only per-round shuffle is the
    # B-bounded bucket gradient. Lineage on executor loss recomputes
    # one scan + one shuffle (same durability class as the dedup-CC /
    # graph round persists).
    # the explicit repartition pins the cache's layout to doc_id even
    # when AQE broadcast-converts the two build joins (which would
    # otherwise leave the (doc_id, bucket) layout of the feature agg)
    feat = (
        feats_raw.join(per_doc, "doc_id").join(labels, "doc_id").select(
            "doc_id", "bucket", "cnt", "n", "y"
        )
    ).repartition("doc_id").persist()
    n_docs = feat.select("doc_id").distinct().count()

    weights: dict[int, int] = {}
    b_micro = 0
    for _ in range(iters):
        if weights:
            w_df = F.broadcast(
                spark.createDataFrame(
                    list(weights.items()), schema="bucket long, w long"
                )
            )
            joined = feat.join(w_df, "bucket", "left")
            wcol = F.coalesce(F.col("w"), F.lit(0))
        else:  # round 1: w = 0 everywhere
            joined = feat
            wcol = F.lit(0)
        doc_p = (
            joined.groupBy("doc_id")
            .agg(
                F.sum(F.col("cnt") * wcol).cast("long").alias("dot"),
                F.first("n").alias("n"),
                F.first("y").alias("y"),
            )
            .select("doc_id", _margin_prob(b_micro).alias("p"), "y")
        )
        contrib = feat.join(doc_p.select("doc_id", "p"), "doc_id").select(
            "bucket",
            F.round(
                (F.col("p") - F.col("y")) * F.col("cnt") * F.lit(_MICRO)
                / F.col("n"),
                0,
            )
            .cast("long")
            .alias("gc"),
        )
        # bias gradient rides the same collect as bucket -1 (buckets are
        # md5 % B, never negative) — r13 optimization: one bounded job
        # per round instead of two, and the doc_p exchange is shared
        # between the two branches by ReuseExchange instead of being
        # recomputed by a second job
        bias = doc_p.select(
            F.lit(-1).cast("long").alias("bucket"),
            F.round((F.col("p") - F.col("y")) * F.lit(_MICRO), 0)
            .cast("long")
            .alias("gc"),
        )
        grad_rows = (
            contrib.unionByName(bias)
            .groupBy("bucket")
            .agg(F.sum("gc").cast("long").alias("g"))
            .collect()  # <= n_buckets + 1 rows by construction
        )
        gb = 0
        for r in grad_rows:
            if r["bucket"] == -1:
                gb = r["g"]
            else:
                weights[r["bucket"]] = weights.get(r["bucket"], 0) - _tdiv(
                    lr_num * r["g"], n_docs
                )
        b_micro -= _tdiv(lr_num * (gb or 0), n_docs)

    w_df = F.broadcast(
        spark.createDataFrame(
            list(weights.items()) or [(0, 0)], schema="bucket long, w long"
        )
    )
    out = (
        feat.join(w_df, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0)))
            .cast("long")
            .alias("dot"),
            F.first("n").alias("n"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_grams"),
            _margin_prob(b_micro).alias("prob"),
        )
        .withColumn("keep", F.col("prob") >= F.lit(threshold))
    )
    return retain(out, feat)
