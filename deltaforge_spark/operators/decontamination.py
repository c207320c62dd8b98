"""Benchmark decontamination: exact n-gram overlap against an eval set.

Pretraining pipelines must drop (or flag) training documents that
contain verbatim n-grams from evaluation benchmarks — otherwise eval
scores measure memorization. The standard method (GPT-3 appendix C,
PaLM §7) is exact 8-13-gram collision between corpus and benchmark.

Scale shape: the benchmark side is tiny (thousands of docs) — its
n-gram hash set broadcasts; the corpus side is the 100 TB side and
stays map-only: shingle → hash → broadcast semi-join, no corpus
shuffle at all for the flag variant. The count variant aggregates
per doc_id (one shuffle of matched (doc_id, hash) pairs only —
matches are rare by construction, so the shuffle is tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash_shingle, word_shingles


def ngram_hash_set(df: DataFrame, *, text_col: str, n: int) -> DataFrame:
    """Distinct 48-bit hashes of all word n-grams in ``df`` — the
    benchmark fingerprint set."""
    return (
        df.select(F.explode(word_shingles(F.col(text_col), n)).alias("_g"))
        .select(_hash_shingle(F.col("_g"), 0).alias("gram_hash"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    counts: bool = True,
) -> DataFrame:
    """Docs sharing ≥1 exact word n-gram with the benchmark.

    ``counts=True`` returns (doc_id, n_overlapping_grams) — the signal
    for graduated policies (drop above k collisions, keep below).
    ``counts=False`` returns just the contaminated doc ids via a
    broadcast LEFT SEMI join — zero corpus shuffle, the cheapest flag.
    """
    bench = F.broadcast(ngram_hash_set(benchmark, text_col=text_col, n=n))
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("_g"),
    ).select("doc_id", _hash_shingle(F.col("_g"), 0).alias("gram_hash"))
    if not counts:
        return doc_grams.join(bench, "gram_hash", "left_semi").select("doc_id").distinct()
    return (
        doc_grams.join(bench, "gram_hash")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlapping_grams"))
    )


def fuzzy_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy decontamination: corpus docs whose MinHash-estimated
    Jaccard similarity to ANY benchmark doc reaches ``threshold`` —
    the paraphrase/near-copy leak the exact n-gram pass misses
    (light edits break every 8-gram but barely move Jaccard).

    Returns (doc_id, n_bench_matches, max_jaccard_est) for contaminated
    docs only; jaccard_est = fraction of agreeing signature components
    (the standard unbiased MinHash estimator).

    Scale shape: the corpus signs once (explode + one groupBy,
    signatures = k longs/doc); the BENCHMARK side is tiny, so both its
    band buckets and its full signatures broadcast — candidate
    generation is a broadcast equi-join on (band, bucket), the
    estimator join is a broadcast equi-join on bench_id, and the
    corpus never self-joins or shuffles its text. Same banded-LSH
    candidate rule as minhash_lsh_pairs."""
    from .dedup import minhash_signatures

    sig_c = minhash_signatures(docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes)
    sig_b = minhash_signatures(
        benchmark, text_col=text_col, id_col=id_col, num_hashes=num_hashes
    ).withColumnRenamed("doc_id", "bench_id")

    rows_per_band = num_hashes // bands

    def buckets(sig: DataFrame, idc: str) -> DataFrame:
        cols = []
        for b in range(bands):
            members = [
                F.col(f"mh{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ]
            cols.append(
                F.struct(
                    F.lit(b).alias("band"), F.md5(F.concat_ws(":", *members)).alias("bucket")
                )
            )
        return sig.select(F.col(idc), F.explode(F.array(*cols)).alias("bb")).select(
            idc, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )

    cand = (
        buckets(sig_c, "doc_id")
        .join(F.broadcast(buckets(sig_b, "bench_id")), ["band", "bucket"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    agree = sum(
        F.when(F.col(f"mh{j}") == F.col(f"b_mh{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    bsig = F.broadcast(
        sig_b.select("bench_id", *[F.col(f"mh{j}").alias(f"b_mh{j}") for j in range(num_hashes)])
    )
    est = (
        cand.join(sig_c, "doc_id")
        .join(bsig, "bench_id")
        .select(
            "doc_id",
            "bench_id",
            (agree / F.lit(float(num_hashes))).alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= threshold)
    )
    return est.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.round(F.max("jaccard_est"), 6).alias("max_jaccard_est"),
    )
