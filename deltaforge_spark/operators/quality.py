"""Document-quality filtering for training-data pipelines: the
Gopher-style heuristic rule set (Rae et al. 2021, "Scaling Language
Models", appendix A1.1) re-expressed as Spark column algebra, plus the
repetition metrics it gates on.

The corpus here is whitespace-token text with no line structure, so the
line-based Gopher rules (duplicate-line fraction, bullet/ellipsis line
fractions) are expressed over word n-grams instead — the same
repetition signal the paper's n-gram rules capture:

- ``top_2gram_char_frac``: chars covered by the dominant word 2-gram:
  ``max over grams of (count * len(gram)) / len(text)`` — the max of
  the product, not the product of the max-count gram, so the metric is
  deterministic without a tiebreak and computes in one conditional
  aggregation (no per-doc top-K window).
- ``dup_5gram_char_frac``: chars covered by all 5-grams occurring at
  least twice: ``sum(count * len(gram)) / len(text)``, capped at 1.0
  (overlap-naive attribution — overlapping occurrences double-count,
  which the cap bounds; documented deviation from the paper's exact
  char-coverage walk).

Everything is deterministic integer/single-division arithmetic so the
DuckDB oracle reproduces values bit-for-bit; ratios are rounded to 6dp.

Scale shape: the per-row gates are one narrow projection (no shuffle);
each repetition metric is one explode + one (doc_id, gram) partial-agg
groupBy + one (doc_id) agg — the same inverted-index shape as MinHash
signatures, skew-free because grams are salted by doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textanalysis import tokens

# Gopher's stopword-presence rule uses this fixed marker set
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Gopher thresholds (appendix A1.1)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WLEN, MAX_MEAN_WLEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORD_HITS = 2
MAX_TOP2GRAM_FRAC = 0.20
MAX_DUP5GRAM_FRAC = 0.15


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams of ``text`` WITH duplicates (repetition metrics need
    occurrence counts; contrast dedup.word_shingles which distincts)."""
    toks = tokens(text)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    grams = F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram)
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics: (doc_id, top_2gram_char_frac,
    dup_5gram_char_frac). Docs shorter than the n-gram size get 0.0.

    Shape: ONE explode emits 2-grams and 5-grams together (tagged by
    size), one (doc_id, n, gram) partial-agg groupBy counts them, one
    (doc_id) conditional agg derives both metrics — no per-doc window,
    one join back for the char denominator. Both shuffles carry counts,
    never text."""
    base = df.select(F.col(id_col).alias("doc_id"), F.length(F.col(text_col)).alias("n_chars"))

    tagged = F.concat(
        F.transform(
            word_ngrams(F.col(text_col), 2),
            lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
        ),
        F.transform(
            word_ngrams(F.col(text_col), 5),
            lambda g: F.struct(F.lit(5).alias("n"), g.alias("gram")),
        ),
    )
    counts = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tagged).alias("t"))
        .groupBy("doc_id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("n") == 2, F.col("cnt") * F.length("gram"))
        ).alias("top2_chars"),
        F.sum(
            F.when((F.col("n") == 5) & (F.col("cnt") >= 2), F.col("cnt") * F.length("gram"))
        ).alias("dup5_chars"),
    )

    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.round(
            F.least(
                F.coalesce(F.col("top2_chars"), F.lit(0)) / F.greatest("n_chars", F.lit(1)),
                F.lit(1.0),
            ),
            6,
        ).alias("top_2gram_char_frac"),
        F.round(
            F.least(
                F.coalesce(F.col("dup5_chars"), F.lit(0)) / F.greatest("n_chars", F.lit(1)),
                F.lit(1.0),
            ),
            6,
        ).alias("dup_5gram_char_frac"),
    )


def repetition_metrics_arrow(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Map-only twin of :func:`repetition_metrics` — same output,
    ZERO shuffle.

    The repetition metrics are per-document with no cross-document
    state, so the structurally right 100 TB shape is embarrassingly
    parallel: an Arrow-batched ``mapInPandas`` Counter pass per doc.
    The column-algebra twin above (explode + groupBy) shuffles ~7x the
    corpus text as gram strings; this one shuffles nothing. Measured
    3x faster at sf0.1 (1.86s -> 0.63s warm) — see SCALE.md.

    Bit-parity contract: tokenization replicates ``tokens()`` exactly
    (trim spaces, split on runs of single spaces — NOT arbitrary
    whitespace), the per-doc char sums are integers, and the final
    fraction/round runs in the SAME Spark column expressions as the
    columnar twin. Differentially tested against it.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"doc_id {id_type}, top2_chars long, dup5_chars long, n_chars long"

    def compute(batches):
        import re
        from collections import Counter

        import pandas as pd

        split = re.compile(" +").split
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""  # null text → 0.0 like the columnar twin
                toks = split(text.strip(" "))
                c2 = Counter(zip(toks, toks[1:]))
                top2 = max(
                    (cnt * (len(a) + len(b) + 1) for (a, b), cnt in c2.items()),
                    default=0,
                )
                c5 = Counter(zip(toks, toks[1:], toks[2:], toks[3:], toks[4:]))
                dup5 = sum(
                    cnt * (sum(map(len, g)) + 4)
                    for g, cnt in c5.items()
                    if cnt >= 2
                )
                out.append((doc_id, top2, dup5, len(text)))
            yield pd.DataFrame(
                out, columns=["doc_id", "top2_chars", "dup5_chars", "n_chars"]
            )

    per_doc = df.select(id_col, text_col).mapInPandas(compute, out_schema)
    return per_doc.select(
        "doc_id",
        F.round(
            F.least(F.col("top2_chars") / F.greatest("n_chars", F.lit(1)), F.lit(1.0)),
            6,
        ).alias("top_2gram_char_frac"),
        F.round(
            F.least(F.col("dup5_chars") / F.greatest("n_chars", F.lit(1)), F.lit(1.0)),
            6,
        ).alias("dup_5gram_char_frac"),
    )


def gopher_flags(text: Column) -> dict[str, Column]:
    """The per-row (shuffle-free) Gopher gates as named boolean columns,
    plus the metrics they derive from."""
    toks = tokens(text)
    n_words = F.size(toks)
    n_chars = F.length(text)
    mean_wlen = F.round(n_chars / F.greatest(n_words, F.lit(1)), 6)
    # symbols: '#' occurrences and '...' ellipses (Gopher's symbol set)
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), 0))
    symbol_ratio = F.round(n_symbols / F.greatest(n_words, F.lit(1)), 6)
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha_words / F.greatest(n_words, F.lit(1)), 6)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(GOPHER_STOPWORDS)))
    return {
        "n_words": n_words,
        "mean_word_len": mean_wlen,
        "symbol_ratio": symbol_ratio,
        "alpha_word_frac": alpha_frac,
        "stopword_hits": stop_hits,
        "ok_word_count": (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        "ok_mean_word_len": (mean_wlen >= MIN_MEAN_WLEN) & (mean_wlen <= MAX_MEAN_WLEN),
        "ok_symbol_ratio": symbol_ratio <= MAX_SYMBOL_RATIO,
        "ok_alpha_words": alpha_frac >= MIN_ALPHA_WORD_FRAC,
        "ok_stopwords": stop_hits >= MIN_STOPWORD_HITS,
    }


def gopher_quality_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    repetition_impl: str = "arrow",
) -> DataFrame:
    """Full Gopher-style quality assessment: per-row gates + repetition
    gates, ``keep`` = all gates pass. One narrow projection + the two
    repetition metrics joined back on doc_id. ``repetition_impl``
    selects the map-only Arrow twin (default — zero shuffle) or the
    pure column-algebra path ("columnar"); both produce identical
    values (differential-tested)."""
    flags = gopher_flags(F.col(text_col))
    per_row = df.select(F.col(id_col).alias("doc_id"), *[c.alias(k) for k, c in flags.items()])
    rep_fn = repetition_metrics_arrow if repetition_impl == "arrow" else repetition_metrics
    rep = rep_fn(df, text_col=text_col, id_col=id_col)
    out = per_row.join(rep, "doc_id")
    keep = (
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords")
        & (F.col("top_2gram_char_frac") <= MAX_TOP2GRAM_FRAC)
        & (F.col("dup_5gram_char_frac") <= MAX_DUP5GRAM_FRAC)
    )
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_frac",
        "stopword_hits",
        "top_2gram_char_frac",
        "dup_5gram_char_frac",
        keep.alias("keep"),
    )


def compression_ratio(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the RefinedWeb-style
    redundancy signal (highly repetitive or templated text compresses
    far below natural prose; near-random strings barely compress).
    Returns (doc_id, raw_bytes, compressed_bytes, compression_ratio
    rounded 6dp, ratio = compressed/raw — LOWER means more redundant).

    Map-only Arrow ``mapInPandas``; zlib output is deterministic for a
    fixed level/strategy so the metric is stable across runs and
    partitionings (layout-invariance holds because the computation is
    per-row). No SQL engine exposes zlib, so this operator is
    pytest-pinned rather than oracle-declared — the one documented
    exception class (non-SQL-expressible kernels).
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("raw_bytes", T.IntegerType()),
            T.StructField("compressed_bytes", T.IntegerType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def run(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            raw_len = raw.str.len().astype("int32")
            comp_len = raw.map(lambda b: len(zlib.compress(b, level))).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "raw_bytes": raw_len,
                    "compressed_bytes": comp_len,
                    "compression_ratio": (
                        comp_len / raw_len.where(raw_len > 0, 1)
                    ).round(6),
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)
