"""Corpus-level dataset reports: the summary statistics a training-data
pipeline publishes with every snapshot (dataset cards / ablation
bookkeeping).

Beyond-reference operators, all single-purpose aggregations with
map-side partial combine — the only exchanges carry (key, count)
pairs:

- vocabulary top-k: one explode + one token-keyed groupBy; the top-k
  window runs over the (tiny) aggregated frame. Zipf skew on hot
  tokens is absorbed by the partial aggregation (combiner), never a
  row-level hot partition.
- length histogram: per-doc bucket is a map-only projection; the
  groupBy key space is the bucket count.
- corpus summary: token totals and exact vocabulary size. Exact
  distinct over tokens shuffles one row per distinct token (bounded by
  vocabulary, not corpus size); at 100 TB swap in
  ``approx_count_distinct`` (documented knob) — the dataflow is
  identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), " +")).alias("token"),
    ).filter(F.col("token") != "")


def vocab_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-k tokens by corpus frequency with document frequency:
    (rank, token, n_occurrences, n_docs). Deterministic ties: higher
    count first, then lexicographic token.

    Top-k shape: orderBy().limit(k) compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of k rows per partition) — a
    global row_number window here would sort the ENTIRE vocabulary
    (tens of millions of tokens at web scale) in one partition. Rank is
    stamped with a window over only the k survivors."""
    toks = _tokens(df, text_col, id_col)
    counts = toks.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    order = [F.col("n_occurrences").desc(), F.col("token").asc()]
    return (
        counts.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.partitionBy(F.lit(0)).orderBy(*order)))
        .select("rank", "token", "n_occurrences", "n_docs")
    )


def length_histogram(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_tokens: int = 50,
) -> DataFrame:
    """Document-length distribution in fixed token buckets:
    (bucket_start, n_docs, total_tokens). Map-only bucket assignment;
    the shuffle key space is the bucket count."""
    n = F.size(F.split(F.trim(F.col(text_col)), " +"))
    bucket = (F.floor(n / F.lit(bucket_tokens)) * bucket_tokens).cast("long")
    return (
        df.select(bucket.alias("bucket_start"), n.alias("_n"))
        .groupBy("bucket_start")
        .agg(F.count("*").alias("n_docs"), F.sum("_n").alias("total_tokens"))
    )


def corpus_summary(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_vocab: bool = True,
) -> DataFrame:
    """One-row corpus card: n_docs, total_tokens, vocab_size,
    type_token_ratio (rounded 6dp). ``exact_vocab=False`` switches to
    approx_count_distinct for trillion-token corpora."""
    toks = _tokens(df, text_col, id_col)
    vocab = (
        F.count_distinct("token") if exact_vocab else F.approx_count_distinct("token")
    )
    return toks.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("total_tokens"),
        vocab.alias("vocab_size"),
    ).select(
        "n_docs",
        "total_tokens",
        "vocab_size",
        F.round(F.col("vocab_size") / F.col("total_tokens"), 6).alias("type_token_ratio"),
    )
