"""Gopher-style quality filter, PII redaction, int8 quantization, and
deterministic dataset split (reference has no quality layer — these are
the beyond-reference training-data operators per BASELINE.json)."""

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.operators.pii import scan_documents
from deltaforge_spark.operators.quality import (
    gopher_quality_filter,
    repetition_metrics,
)
from deltaforge_spark.operators.sampling import dataset_split
from deltaforge_spark.operators.similarity import quantize_embeddings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away to "
    "find a quiet place by the river where it can rest with some friends and "
    "watch the water flow past the old mill while birds sing in the trees "
    "above and the sun sets slowly behind the green hills of that valley"
)


def test_gopher_keep_and_reject(spark):
    rep = ("spam ham " * 40).strip()  # one 2-gram dominates -> repetition gate
    short = "too short"
    df = _docs(spark, [(1, GOOD), (2, rep), (3, short)])
    out = {r.doc_id: r for r in gopher_quality_filter(df).collect()}
    assert out[1].keep is True
    assert out[2].keep is False and out[2].top_2gram_char_frac > 0.2
    assert out[3].keep is False and out[3].n_words < 50


def test_repetition_metrics_bounds(spark):
    # a doc below the n-gram sizes yields 0.0, not null
    df = _docs(spark, [(1, "just three words"), (2, ("x y z w v " * 30).strip())])
    m = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert m[1].dup_5gram_char_frac == 0.0
    assert 0.0 <= m[2].top_2gram_char_frac <= 1.0
    assert m[2].dup_5gram_char_frac == 1.0  # fully periodic text, capped


def test_pii_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail a.b#x@corp.io now"),
            (2, "call 12-345-678-9012 or ssn 123-45-6789"),
            (3, "host 192.168.0.1 ok"),
            (4, "clean text with nothing"),
        ],
    )
    out = {r.doc_id: r for r in scan_documents(df, text_col="text", id_col="doc_id").collect()}
    assert out[1].n_email == 1 and out[1].redacted_text == "mail [EMAIL] now"
    # the phone is redacted FIRST, so its ssn-shaped infix is not counted
    assert out[2].n_phone == 1 and out[2].n_ssn == 1
    assert out[2].redacted_text == "call [PHONE] or ssn [SSN]"
    assert out[3].n_ipv4 == 1 and out[3].redacted_text == "host [IP] ok"
    assert out[4].n_pii_total == 0 and out[4].redacted_text == "clean text with nothing"


def test_pii_no_double_count_overlap(spark):
    # an SSN-shaped string inside a phone must count once as phone
    df = _docs(spark, [(1, "n 12-345-678-9012 x")])
    r = scan_documents(df, text_col="text", id_col="doc_id").collect()[0]
    assert (r.n_phone, r.n_ssn) == (1, 0)


def test_quantize_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[1].scale == 1.0
    assert list(out[1].qvec) == [127, -63, 32, 0]  # floor(x*127/1 + .5)
    assert out[1].max_abs_err <= out[1].scale / 127.0
    assert out[2].scale == 0.0 and list(out[2].qvec) == [0, 0, 0, 0]
    assert out[2].max_abs_err == 0.0


def test_dataset_split_deterministic_and_exhaustive(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = dataset_split(df, key_col="doc_id").groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    # same assignment on re-run and on a differently-partitioned frame
    b = dataset_split(df.repartition(7), key_col="doc_id")
    joined = (
        dataset_split(df, key_col="doc_id")
        .select("doc_id", F.col("split").alias("s1"))
        .join(b.select("doc_id", F.col("split").alias("s2")), "doc_id")
    )
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0


@pytest.mark.spark
def test_repetition_arrow_twin_matches_columnar(spark):
    """The map-only Arrow implementation must be bit-identical to the
    column-algebra twin, including edge shapes: repeated grams, short
    docs, empty text, multi-space runs, leading/trailing spaces."""
    from deltaforge_spark.operators.quality import repetition_metrics_arrow
    from deltaforge_spark.sources.snapshot import read_table

    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "a b a b a b a b a b c d e f g a b c d e f g"),
        (4, "tiny"),
        (5, ""),
        (6, "  leading and   multi  space   runs preserved   "),
        (7, "x " * 300),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    for frame in (df, docs):
        col = {r.doc_id: r.asDict() for r in repetition_metrics(frame).collect()}
        arr = {r.doc_id: r.asDict() for r in repetition_metrics_arrow(frame).collect()}
        assert col == arr


@pytest.mark.spark
def test_gopher_filter_impl_parity(spark):
    from deltaforge_spark.sources.snapshot import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    a = {r.doc_id: r.asDict() for r in gopher_quality_filter(docs).collect()}
    b = {
        r.doc_id: r.asDict()
        for r in gopher_quality_filter(docs, repetition_impl="columnar").collect()
    }
    assert a == b


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below varied text; ratios are
    deterministic and layout-invariant (per-row computation)."""
    from pyspark.sql import functions as F

    from deltaforge_spark.operators.quality import compression_ratio

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over a lazy dog while rain falls"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[3]["raw_bytes"] == 0
    # layout invariance: single partition vs many — identical rows
    a = sorted(map(tuple, compression_ratio(df.coalesce(1)).collect()))
    b = sorted(map(tuple, compression_ratio(df.repartition(5)).collect()))
    assert a == b
