"""Exact-substring duplicate-span detection over a document corpus —
the ExactSubstr dedup of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL 2022), re-expressed for Spark.

Beyond-reference training-data operator. The paper builds a suffix
array over the concatenated corpus; the equivalent corpus-scale Spark
shape is a positional k-gram index:

1. every token position emits its k-token gram hash — one row per
   token, hashed immediately to 8 bytes (the gram text never shuffles);
2. a count over a window partitioned by gram hash marks grams that
   occur ≥2 times anywhere in the corpus (self-repetition included,
   as in the paper) — ONE shuffle, on the 8-byte hash;
3. duplicated positions merge into maximal per-document spans with the
   classic gaps-and-islands window (second shuffle, on doc_id);
4. per-document summary: span count, duplicated-token count and ratio.

Scale: shuffles carry (doc_id, position, hash48) triples — ~20 bytes
per token regardless of text width. A hot gram (boilerplate phrase)
skews step 2's window the same way it skews ngram-jaccard's index;
unlike the pair-join there it stays LINEAR (count only, no self-join),
so the skew bound is one partition's row count — AQE-splittable.

Span semantics: two duplicated k-grams merge when their token ranges
overlap or touch (start ≤ prev_end + 1), giving maximal duplicated
regions; a span's token length is end − start + 1. The DuckDB oracle
mirrors every step including the tie/merge rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_ngrams_positional(text: Column, n: int) -> Column:
    """Ordered (non-distinct) word n-grams; index i in the result is
    the gram starting at token position i (0-based via posexplode)."""
    toks = F.split(text, " ")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    grams = F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram)
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def duplicate_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document maximal duplicated spans: (doc_id, span_start,
    span_end, span_tokens). ``k`` is the gram width in tokens (the
    paper uses 50 bytes ≈ 10-15 tokens); ``min_count`` the corpus-wide
    occurrence threshold."""
    g = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams_positional(F.col(text_col), k)).alias("gpos", "gram"),
    ).select(
        "doc_id",
        "gpos",
        F.conv(F.substring(F.md5(F.concat(F.lit("ds:"), F.col("gram"))), 1, 12), 16, 10)
        .cast("long")
        .alias("gh"),
    )
    hits = (
        g.withColumn("n", F.count("*").over(Window.partitionBy("gh")))
        .filter(F.col("n") >= min_count)
        .select("doc_id", "gpos", (F.col("gpos") + F.lit(k - 1)).alias("gend"))
    )
    w = Window.partitionBy("doc_id").orderBy("gpos")
    prev_end = F.max("gend").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_end >= F.col("gpos") - 1, F.lit(0)).otherwise(F.lit(1))
    islands = hits.withColumn("island", F.sum(brk).over(w))
    return (
        islands.groupBy("doc_id", "island")
        .agg(F.min("gpos").alias("span_start"), F.max("gend").alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def duplicate_span_profile(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplication summary — the filter signal a pipeline
    thresholds on: (doc_id, n_spans, dup_tokens, total_tokens,
    dup_ratio). Only documents containing at least one duplicated span
    appear (the clean majority emits nothing)."""
    spans = duplicate_spans(
        df, text_col=text_col, id_col=id_col, k=k, min_count=min_count
    )
    sizes = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("total_tokens"),
    )
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"), F.sum("span_tokens").alias("dup_tokens")
    )
    return agg.join(sizes, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        "total_tokens",
        F.round(F.col("dup_tokens") / F.col("total_tokens"), 6).alias("dup_ratio"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """APPLY step of exact-substring dedup (the rewrite that follows
    :func:`duplicate_spans`' detection — Lee et al. 2022's ExactSubstr
    "cut" policy as most pipelines run it for boilerplate): every token
    covered by a corpus-duplicated span is removed from every document
    and the surviving tokens are rejoined. Cut-all (rather than
    keep-one-occurrence) is deliberate: keep-one needs a global
    occurrence tie-break that serializes on the hottest gram, while
    cut-all is order-free — and for boilerplate (the dominant use) the
    span should survive in NO document.

    Output: (doc_id, total_tokens, removed_tokens, kept_tokens,
    clean_md5) — the rewritten text travels as its md5 so a 100-TB
    verification never ships document bodies; callers wanting the text
    use ``return_text=True`` semantics by selecting ``clean_text``
    before the final projection (kept internal here to keep the
    declared query's compare payload bounded).

    Scale shape: the span table (dup-y docs only) joins doc-keyed —
    one shuffle of (doc_id, start, end) triples; the rebuild is pure
    per-row column algebra (positions filtered against the ≤handful of
    spans per doc), no Python, no second pass over text."""
    spans = duplicate_spans(
        df, text_col=text_col, id_col=id_col, k=k, min_count=min_count
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_sps")
    )
    out = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")).join(
        per_doc, "doc_id", "left"
    )
    toks = F.split(F.col("_t"), " ")
    sps = F.coalesce(F.col("_sps"), F.array().cast("array<struct<span_start:long,span_end:long>>"))
    pos = F.sequence(F.lit(0), F.size(toks) - 1)
    covered = lambda p: F.exists(  # noqa: E731
        sps, lambda s: (p >= s["span_start"]) & (p <= s["span_end"])
    )
    kept = F.filter(pos, lambda p: ~covered(p))
    clean = F.concat_ws(
        " ", F.transform(kept, lambda p: F.element_at(toks, p + 1))
    )
    return out.select(
        "doc_id",
        F.size(toks).cast("long").alias("total_tokens"),
        (F.size(toks) - F.size(kept)).cast("long").alias("removed_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        F.md5(clean).alias("clean_md5"),
    )


def token_chunks(text: Column, n: int) -> Column:
    """Deterministic pseudo-lines: consecutive n-token chunks of a
    whitespace-tokenized text (for corpora whose documents carry no
    newline structure; real corpora pass their own lines array)."""
    toks = F.split(text, " ")
    last = F.floor((F.size(toks) - 1) / F.lit(n)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.concat_ws(" ", F.slice(toks, i * n + 1, n)),
    )


def line_dedup(
    df: DataFrame,
    *,
    lines_col: str,
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Corpus-wide exact line dedup, C4/RefinedWeb-style: of all
    occurrences of a line ANYWHERE in the corpus, only the globally
    first (lowest (doc_id, position)) survives; every other occurrence
    is dropped from its document. Returns per-doc
    ``(doc_id, kept_text, n_kept, n_removed)``.

    Scale shape: lines explode once; the keep/drop decision is one
    window over the 8-byte line hash (same linear-skew bound as
    duplicate_spans — a boilerplate line concentrates counts, not
    pairs); reassembly is one groupBy doc_id with an in-agg sort
    bounded by lines-per-doc. Two shuffles total, both on small keys.
    """
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col(lines_col)).alias("pos", "line"),
    ).withColumn(
        "lh",
        F.conv(F.substring(F.md5(F.concat(F.lit("ld:"), F.col("line"))), 1, 12), 16, 10).cast(
            "long"
        ),
    )
    # global order key = lexicographic min of (doc_id, pos): a struct-min
    # window instead of arithmetic packing, which silently corrupted
    # ordering for docs with >=2^20 lines and overflowed int64 for
    # 64-bit hash doc_ids (Spark wraps; DuckDB errors — divergence).
    first = F.min(F.struct(F.col("doc_id"), F.col("pos"))).over(Window.partitionBy("lh"))
    marked = ex.withColumn(
        "keep", F.struct(F.col("doc_id"), F.col("pos")) == first
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("kept_text"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_removed"),
        )
    )
