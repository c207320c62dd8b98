"""TF-IDF / BM25 keyword extraction over a document corpus.

Beyond-reference training-data operator (BASELINE.json text-analysis
family): per-document top-k salient terms by corpus-weighted term
frequency. Used for topic bucketing, mixture balancing, and as a cheap
relevance signal for retrieval-style filtering.

Definitions (deterministic, oracle-reproducible):
- tf(d, t)  = occurrences of term t in doc d (whitespace tokens,
  lowercased)
- df(t)     = number of docs containing t
- idf(t)    = ln((N + 1) / (df + 1)) + 1   (smoothed; always > 0)
- tfidf     = tf * idf, rounded to 6dp
- bm25(d,t) = idf * tf*(k1+1) / (tf + k1*(1-b + b*len_d/avg_len)),
  k1=1.2, b=0.75 — same statistics, saturation-bounded.

Top-k per doc is rank-stable: ties break on the term string, so two
engines computing the same scores return the same rows.

Scale shape (100 TB):
- one explode + one (doc_id, term) partial-agg groupBy for TF — terms
  salted by doc_id, stopword skew cannot hot-spot;
- DF/IDF derives from TF by a (term) groupBy carrying ONLY counts (the
  partial agg collapses each term to one row per partition first, so
  even "the" contributes one row per partition to the shuffle);
- the TF⋈IDF join is term-keyed; the IDF side is vocab-sized (≪ corpus)
  and already reduced — broadcastable when vocab fits, shuffle-join on
  term otherwise (AQE decides);
- per-doc top-k is one window over the (doc_id)-partitioned TF rows —
  carried counts, never text bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textanalysis import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def term_frequencies(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) — lowercased whitespace terms, empty terms
    dropped."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) from the TF table — one count-only groupBy."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    scoring: str = "tfidf",
) -> DataFrame:
    """Top-``k`` terms per document: (doc_id, rank, term, tf, score).

    ``scoring``: "tfidf" (default) or "bm25". Rank ties break on the
    term string — deterministic across engines.
    """
    tf = term_frequencies(df, text_col=text_col, id_col=id_col)
    n_docs = df.select(F.col(id_col)).distinct().count()
    idf = document_frequencies(tf).select(
        "term",
        (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    scored = tf.join(idf, "term")
    if scoring == "bm25":
        doc_len = (
            tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        )
        avg_len = doc_len.agg(F.avg("dl").alias("avgdl"))
        scored = (
            scored.join(doc_len, "doc_id")
            .crossJoin(F.broadcast(avg_len))
            .withColumn(
                "score",
                F.round(
                    F.col("idf")
                    * (F.col("tf") * (BM25_K1 + 1))
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                    ),
                    6,
                ),
            )
        )
    else:
        scored = scored.withColumn("score", F.round(F.col("tf") * F.col("idf"), 6))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "score")
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Retrieval-style ranked search: the top-``k`` documents by summed
    BM25 relevance to a fixed query-term set — the lexical-retrieval
    tier a RAG/decontamination pipeline runs next to the embedding ANN
    index (operators/similarity.py): same corpus statistics as
    ``tfidf_keywords(scoring="bm25")``, aggregated per document instead
    of per term.

    Returns (doc_id, rank, n_terms, score): rank by (score desc,
    doc_id), n_terms = how many query terms matched.

    Determinism: the per-document total is a FIXED-ORDER sum of the
    per-term scores (one conditional-agg column per query term, added
    left-to-right), never a float SUM whose partial order an engine
    could pick — so an independent SQL engine reproduces the ranking
    bit-for-bit. Rounded 6dp, ranked on the rounded value.

    Scale shape: the query-term filter on the TF table is a pushed
    equality-set predicate, so the scored stream is |terms|·|matching
    docs| rows; IDF and avgdl are one-row/vocab-sized broadcasts; the
    doc-length join is doc-keyed; top-k is orderBy().limit() —
    TakeOrderedAndProject, never a global sort.
    """
    # dedup preserving order: a repeated term must not double its score
    # in the fixed-order total; empty query has no ranking to return
    query_terms = list(dict.fromkeys(query_terms))
    if not query_terms:
        raise ValueError("bm25_search requires at least one query term")
    tf = term_frequencies(df, text_col=text_col, id_col=id_col)
    doc_len = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    qtf = tf.filter(F.col("term").isin(list(query_terms)))
    n_docs = df.select(F.col(id_col)).distinct().count()
    idf = document_frequencies(qtf).select(
        "term",
        (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    avg_len = doc_len.agg(F.avg("dl").alias("avgdl"))
    scored = (
        qtf.join(F.broadcast(idf), "term")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(avg_len))
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"_s{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"), *per_term
    )
    total = F.col("_s0")
    for i in range(1, len(query_terms)):
        total = total + F.col(f"_s{i}")
    ranked = (
        agg.withColumn("score", F.round(total, 6))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), "doc_id")
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "rank", F.col("n_terms").cast("long").alias("n_terms"), "score"
    )
