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
