"""Text-analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
codegen'd, no Python in the hot path — and all deterministic so a SQL
oracle reproduces them bit-for-bit:

- **token counting**: whitespace tokens + a BPE-ish regex segmentation
  (letter runs / digit runs / single punctuation marks).
- **language ID**: n-gram/stopword marker heuristic — per-language
  marker-token hit counts, argmax with deterministic tiebreak.
- **quality scoring**: length, mean word length, stopword ratio,
  punctuation ratio folded into a bounded [0,1] score.
- **document fingerprinting**: polynomial rolling hash (Karp-Rabin
  style) over token hashes — order-sensitive, unlike a bag-of-words
  hash, so reordered documents fingerprint differently. Implemented as
  an ``aggregate`` fold with exact 63-bit-safe modular arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish segmentation: letter runs | digit runs | single non-space symbol
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny marker vocabularies per language. The corpus is synthetic
# English-ish text, so real lang-ID is out of scope — the operator's
# contract is a deterministic n-gram-marker heuristic with argmax.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "est"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# rolling-hash parameters: base and a prime modulus < 2^31 so that
# acc*B + h stays under 2^63 (exact in long arithmetic)
RH_BASE = 1000003
RH_MOD = 2147483647


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), " +"))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), " +")


def marker_hits(text: Column, markers: list[str]) -> Column:
    """How many tokens of ``text`` are in the marker list (occurrence
    count, not distinct — compiles to an IN inside a higher-order
    filter, no explode/shuffle)."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(markers)))


def language_id(text: Column) -> Column:
    """Argmax of marker hit counts; ties and zero-hit docs break to the
    lexicographically-first language / 'und'."""
    scores = [(lang, marker_hits(text, ms)) for lang, ms in sorted(LANG_MARKERS.items())]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties => apply last
        pred = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    return pred


def quality_score(text: Column) -> Column:
    """Bounded [0,1] quality heuristic:
    0.25*len_ok + 0.25*word_len_ok + 0.25*stopword_ratio_ok + 0.25*(1-punct_ratio).
    """
    n_chars = F.length(text)
    toks = tokens(text)
    n_toks = F.size(toks)
    mean_wlen = n_chars / F.greatest(n_toks, F.lit(1))
    stop_hits = marker_hits(text, STOPWORDS)
    stop_ratio = stop_hits / F.greatest(n_toks, F.lit(1))
    punct = F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9 ]"), 0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 5000), 1.0).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.0)
    return F.round(
        0.25 * len_ok + 0.25 * wlen_ok + 0.25 * stop_ok + 0.25 * (1.0 - punct_ratio), 6
    )


def rolling_fingerprint(text: Column) -> Column:
    """Karp-Rabin polynomial fingerprint over token hashes:
    ``acc = (acc * B + h(tok)) % P`` folded left-to-right.
    h(tok) = first 28 bits of md5 (so acc*B + h < 2^63, exact)."""
    tok_hashes = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"),
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(RH_BASE) + h) % F.lit(RH_MOD),
    )


def analyze_documents(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The combined text-analysis projection — one narrow scan, one
    select, no shuffle."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        whitespace_token_count(t).alias("n_tokens_ws"),
        bpe_token_count(t).alias("n_tokens_bpe"),
        language_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        rolling_fingerprint(t).alias("fingerprint"),
    )


# -------------------------------------------------------- BPE merge path
#
# A REAL merge-table tokenizer (GPT-2-style byte-pair encoding shape),
# distinct from the regex pre-tokenizer above: text is cleaned to
# [A-Za-z0-9 ], lowercased (ASCII-only, engine-identical), exploded to
# space-separated symbols with '|' word separators, then a PRETRAINED
# merge table applies in rank order — each rank merging every
# occurrence of its pair in one pass. (Exact BPE inference re-scans for
# the lowest-rank pair after every merge; the rank-ordered single-pass
# variant is the standard fast approximation, and both engines
# implement it identically so the oracle is exact.)
#
# Everything is column algebra — chained replace() calls, zero Python
# in the hot path; at 100 TB this is a map-only pass whose cost is
# linear in text bytes, like the reference's scalar layer.

#: pretrained merge table (rank-ordered): common English pairs, with
#: second-order merges referencing earlier outputs. Production would
#: load a real tokenizer's merges file; the mechanics are identical.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("t", "i"), ("a", "r"), ("t", "e"), ("an", "d"),
    ("in", "g"), ("s", "t"), ("a", "l"), ("i", "t"), ("o", "u"),
    ("l", "e"), ("i", "s"), ("s", "e"), ("th", "at"),
]


def bpe_merge_tokens(text: Column) -> Column:
    """Token count under the rank-ordered merge tokenizer."""
    clean = F.regexp_replace(text, "[^A-Za-z0-9 ]", "")
    s = F.lower(clean)
    s = F.regexp_replace(F.trim(s), " +", "|")
    s = F.regexp_replace(s, "(.)", "$1 ")
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"{a} {b} "), F.lit(f"{a}{b} "))
    syms = F.split(F.trim(s), " +")
    n = F.size(F.filter(syms, lambda x: x != F.lit("|")))
    return F.when(F.trim(clean) == "", F.lit(0)).otherwise(n)


def bpe_merge_tokens_oracle_sql(text_expr: str) -> str:
    """DuckDB twin: the identical chained replacements in the identical
    order (the merge literals bake into the SQL, LSH-oracle style)."""
    s = f"regexp_replace({text_expr}, '[^A-Za-z0-9 ]', '', 'g')"
    s = f"lower({s})"
    s = f"regexp_replace(trim({s}), ' +', '|', 'g')"
    s = f"regexp_replace({s}, '(.)', '\\1 ', 'g')"
    for a, b in BPE_MERGES:
        s = f"replace({s}, '{a} {b} ', '{a}{b} ')"
    n = f"len(list_filter(string_split_regex(trim({s}), ' +'), x -> x <> '|'))"
    empty = f"trim(regexp_replace({text_expr}, '[^A-Za-z0-9 ]', '', 'g')) = ''"
    return f"(CASE WHEN {empty} THEN 0 ELSE {n} END)"
