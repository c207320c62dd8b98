"""TF-IDF / BM25 keyword extraction: hand-computable corpus, rank
determinism, and the BM25 saturation property."""

import math

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.keywords import (
    document_frequencies,
    term_frequencies,
    tfidf_keywords,
)

DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry date"),
    (3, "apple apple apple apple"),
    (4, "unique words only here"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.spark
def test_term_and_document_frequencies(spark, docs):
    tf = {
        (r.doc_id, r.term): r.tf for r in term_frequencies(docs).collect()
    }
    assert tf[(1, "apple")] == 2 and tf[(3, "apple")] == 4
    assert tf[(2, "cherry")] == 2
    df = {r.term: r.df for r in document_frequencies(term_frequencies(docs)).collect()}
    assert df["apple"] == 2 and df["banana"] == 2 and df["unique"] == 1


@pytest.mark.spark
def test_tfidf_scores_and_ranks(spark, docs):
    out = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 3: only one distinct term → single row despite k=2
    assert [r.term for r in sorted(by_doc[3], key=lambda r: r.rank)] == ["apple"]
    idf_apple = math.log(5 / 3) + 1
    assert by_doc[3][0].score == pytest.approx(round(4 * idf_apple, 6))
    # doc 1: apple tf=2 outranks cherry/banana tf=1
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert d1[0].term == "apple" and d1[0].rank == 1
    # rank ties (equal score) break on the term string: doc 4 has four
    # tf=1 df=1 terms -> alphabetical order
    d4 = sorted(by_doc[4], key=lambda r: r.rank)
    assert [r.term for r in d4] == ["here", "only"]


@pytest.mark.spark
def test_case_folding_and_empty_terms(spark):
    df = spark.createDataFrame(
        [(1, "  Apple APPLE  apple  "), (2, "")], "doc_id long, text string"
    )
    tf = {(r.doc_id, r.term): r.tf for r in term_frequencies(df).collect()}
    assert tf == {(1, "apple"): 3}  # folded, empties dropped


@pytest.mark.spark
def test_bm25_saturates_term_frequency(spark):
    # same df for "spam" in both docs; tf 40 vs 4. BM25's tf saturation
    # must compress the 10x tf ratio to < 1.4x in score, while tfidf
    # keeps it at 10x.
    rows = [
        (1, " ".join(["spam"] * 40) + " filler"),
        (2, " ".join(["spam"] * 4) + " filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bm = {r.doc_id: r.score for r in tfidf_keywords(df, k=1, scoring="bm25").collect()}
    ti = {r.doc_id: r.score for r in tfidf_keywords(df, k=1).collect()}
    assert ti[1] / ti[2] == pytest.approx(10.0)
    assert bm[1] / bm[2] < 1.4
