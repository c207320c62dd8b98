"""Property-based tests (hypothesis) for the round-3 training-data
operators — bounds and stability laws that hold for ALL inputs, not
just fixtures. Examples are batched into one DataFrame per property so
each property costs one Spark job."""

import math

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from deltaforge_spark.operators.pii import redact_pii, scan_documents
from deltaforge_spark.operators.quality import gopher_quality_filter
from deltaforge_spark.operators.sampling import dataset_split
from deltaforge_spark.operators.similarity import quantize_embeddings

_SETTINGS = dict(max_examples=5, deadline=None)

# brackets excluded: a generated literal "[EMAIL]" would alias the
# redaction placeholders and break the count-vs-placeholder property
text_st = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00[]"),
    min_size=0,
    max_size=200,
)


@settings(**_SETTINGS)
@given(st.lists(text_st, min_size=1, max_size=20))
def test_pii_redaction_is_stable(spark, texts):
    """redact(redact(x)) == redact(x): placeholders never re-match."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    once = df.select("id", redact_pii(F.col("t")).alias("r1"))
    twice = once.select("id", F.col("r1"), redact_pii(F.col("r1")).alias("r2"))
    assert twice.filter(F.col("r1") != F.col("r2")).count() == 0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_quantization_error_bound_and_range(spark, vecs):
    """For every vector: ints in [-127,127], reconstruction error
    <= scale/127 (half-step rounding + clamp edge), zero vectors exact."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    for r in quantize_embeddings(df).collect():
        assert all(-127 <= q <= 127 for q in r.qvec)
        if r.scale == 0.0:
            assert r.max_abs_err == 0.0
        else:
            # floor(x+0.5) rounds within half a step; round-to-6dp on the
            # reported error adds at most 5e-7
            assert r.max_abs_err <= r.scale / 127.0 + 1e-6


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=50, unique=True))
def test_dataset_split_total_and_stable(spark, keys):
    """Every key gets exactly one split; assignment is a pure function
    of the key (stable across calls)."""
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = {r.doc_id: r.split for r in dataset_split(df, key_col="doc_id").collect()}
    b = {r.doc_id: r.split for r in dataset_split(df, key_col="doc_id").collect()}
    assert a == b
    assert set(a) == set(keys)
    assert set(a.values()) <= {"train", "val", "test"}


@settings(**_SETTINGS)
@given(st.lists(text_st.filter(lambda t: t.strip()), min_size=1, max_size=10))
def test_gopher_metrics_bounded(spark, texts):
    """All ratio metrics live in [0,1]; counts are non-negative."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for r in gopher_quality_filter(df).collect():
        assert r.n_words >= 0 and r.stopword_hits >= 0
        assert 0.0 <= r.alpha_word_frac <= 1.0
        assert 0.0 <= r.top_2gram_char_frac <= 1.0
        assert 0.0 <= r.dup_5gram_char_frac <= 1.0
        assert r.symbol_ratio >= 0.0
        assert isinstance(r.keep, bool)


@settings(**_SETTINGS)
@given(st.lists(text_st, min_size=1, max_size=15))
def test_pii_counts_match_placeholders(spark, texts):
    """n_<class> equals the number of placeholders the redaction pass
    actually inserted — the counts and the rewrite can't drift apart."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = scan_documents(df, text_col="text", id_col="doc_id").collect()
    for r in out:
        for cls, tag in (("email", "[EMAIL]"), ("phone", "[PHONE]"), ("ssn", "[SSN]"), ("ipv4", "[IP]")):
            assert getattr(r, f"n_{cls}") == r.redacted_text.count(tag)
