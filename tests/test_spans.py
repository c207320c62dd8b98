"""Exact-substring duplicate spans (operators/spans.py): span merge
semantics, self-repetition, thresholds — pinned on hand-built docs
where the expected spans are computable by eye."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from deltaforge_spark.operators.spans import (
    duplicate_span_profile,
    duplicate_spans,
    word_ngrams_positional,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_positional_ngrams_order_and_short_doc(spark):
    df = _docs(spark, ["a b c d", "a b"])
    out = df.select(
        "doc_id", word_ngrams_positional(F.col("text"), 3).alias("g")
    ).collect()
    by_id = {r["doc_id"]: r["g"] for r in out}
    assert by_id[0] == ["a b c", "b c d"]
    assert by_id[1] == []


def test_cross_doc_duplicate_span_found(spark):
    # docs 0 and 1 share tokens 2..6 ("x1 x2 x3 x4 x5"); k=4 gives two
    # overlapping duplicated grams per doc that must merge into ONE span
    shared = "x1 x2 x3 x4 x5"
    df = _docs(spark, [f"a0 b0 {shared} c0", f"a1 b1 {shared} c1"])
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, k=4).collect()
    }
    assert spans == {(0, 2, 6, 5), (1, 2, 6, 5)}


def test_disjoint_spans_stay_separate(spark):
    s1, s2 = "p1 p2 p3 p4", "q1 q2 q3 q4"
    df = _docs(
        spark,
        [f"{s1} m0 m1 m2 m3 m4 {s2}", f"{s1} z0 z1 z2 z3 z4 {s2}"],
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, k=4).collect()
    )
    assert got == [(0, 0, 3), (0, 9, 12), (1, 0, 3), (1, 9, 12)]


def test_self_repetition_counts(spark):
    # one doc repeating the same 4 tokens twice — duplicated within itself
    df = _docs(spark, ["r1 r2 r3 r4 mid r1 r2 r3 r4", "clean doc here ok"])
    prof = {r["doc_id"]: r for r in duplicate_span_profile(df, k=4).collect()}
    assert set(prof) == {0}
    assert prof[0]["n_spans"] == 2 and prof[0]["dup_tokens"] == 8
    assert abs(prof[0]["dup_ratio"] - 8 / 9) < 1e-6  # ratio is rounded to 6dp


def test_min_count_threshold(spark):
    shared = "s1 s2 s3 s4"
    df = _docs(spark, [f"{shared} a", f"{shared} b", f"{shared} c"])
    assert duplicate_spans(df, k=4, min_count=4).count() == 0
    assert duplicate_spans(df, k=4, min_count=3).count() == 3


def test_line_dedup_keeps_global_first_occurrence(spark):
    from pyspark.sql import functions as F

    from deltaforge_spark.operators.spans import line_dedup

    df = spark.createDataFrame(
        [
            (0, ["shared line", "own a"]),
            (1, ["own b", "shared line", "own c"]),
            (2, ["shared line"]),
        ],
        ["doc_id", "lines"],
    )
    got = {r["doc_id"]: r for r in line_dedup(df, lines_col="lines").collect()}
    assert got[0]["kept_text"] == "shared line own a"
    assert got[1]["kept_text"] == "own b own c" and got[1]["n_removed"] == 1
    assert got[2]["kept_text"] == "" and got[2]["n_kept"] == 0


def test_line_dedup_self_duplicate_within_doc(spark):
    from deltaforge_spark.operators.spans import line_dedup

    df = spark.createDataFrame([(5, ["x", "x", "y"])], ["doc_id", "lines"])
    r = line_dedup(df, lines_col="lines").collect()[0]
    assert r["kept_text"] == "x y" and r["n_removed"] == 1


def test_token_chunks_boundaries(spark):
    from pyspark.sql import functions as F

    from deltaforge_spark.operators.spans import token_chunks

    df = spark.createDataFrame([("a b c d e",), ("a",)], ["text"])
    got = [r["c"] for r in df.select(token_chunks(F.col("text"), 2).alias("c")).collect()]
    assert got[0] == ["a b", "c d", "e"]
    assert got[1] == ["a"]


def test_remove_duplicate_spans_cuts_and_rejoins(spark):
    """APPLY step: duplicated tokens are cut from every doc, unique
    tokens survive in order, a fully-duplicated doc becomes the empty
    string (md5('') pins the edge), clean docs pass through intact."""
    import hashlib

    from deltaforge_spark.operators.spans import remove_duplicate_spans

    shared = "x1 x2 x3 x4 x5"
    docs = [
        f"a0 b0 {shared} c0",   # doc 0: span at tokens 2..6
        f"a1 b1 {shared} c1",   # doc 1: same
        shared,                  # doc 2: fully duplicated -> empty
        "u0 u1 u2 u3 u4 u5",     # doc 3: clean, untouched
    ]
    df = _docs(spark, docs)
    got = {
        r["doc_id"]: (
            r["total_tokens"], r["removed_tokens"], r["kept_tokens"], r["clean_md5"]
        )
        for r in remove_duplicate_spans(df, k=4).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[0] == (8, 5, 3, md5("a0 b0 c0"))
    assert got[1] == (8, 5, 3, md5("a1 b1 c1"))
    assert got[2] == (5, 5, 0, md5(""))
    assert got[3] == (6, 0, 6, md5("u0 u1 u2 u3 u4 u5"))
