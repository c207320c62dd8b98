"""Property-based differential tests: duplicate_spans and line_dedup
against independent brute-force Python models over randomized tiny
corpora (the flatten_differential.py pattern). Catches semantic drift
the hand-built cases can't — island-merge edge cases, multi-doc gram
collisions, tie-breaks."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

_SETTINGS = dict(max_examples=6, deadline=None)

# tiny alphabet → collisions are common by construction
_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOC = st.lists(_WORD, min_size=0, max_size=12)
_CORPUS = st.lists(_DOC, min_size=1, max_size=5)


def _model_spans(corpus, k):
    """Brute-force ExactSubstr model: positional k-grams, corpus-wide
    counts, overlap-or-touch island merge."""
    grams = {}
    pos_by_doc = {}
    for d, words in enumerate(corpus):
        for i in range(max(len(words) - k + 1, 0)):
            g = tuple(words[i : i + k])
            grams.setdefault(g, []).append((d, i))
    for g, occ in grams.items():
        if len(occ) >= 2:
            for d, i in occ:
                pos_by_doc.setdefault(d, []).append(i)
    out = set()
    for d, starts in pos_by_doc.items():
        starts.sort()
        cur_s, cur_e = starts[0], starts[0] + k - 1
        for s in starts[1:]:
            if s <= cur_e + 1:
                cur_e = max(cur_e, s + k - 1)
            else:
                out.add((d, cur_s, cur_e, cur_e - cur_s + 1))
                cur_s, cur_e = s, s + k - 1
        out.add((d, cur_s, cur_e, cur_e - cur_s + 1))
    return out


def _model_line_dedup(corpus):
    """Global-first line dedup model."""
    first = {}
    for d, lines in enumerate(corpus):
        for i, ln in enumerate(lines):
            first.setdefault(ln, (d, i))
    out = {}
    for d, lines in enumerate(corpus):
        kept = [ln for i, ln in enumerate(lines) if first[ln] == (d, i)]
        removed = len(lines) - len(kept)
        out[d] = (" ".join(kept), len(kept), removed)
    return out


@pytest.mark.spark
@settings(**_SETTINGS)
@given(corpus=_CORPUS)
def test_duplicate_spans_matches_model(spark, corpus):
    from deltaforge_spark.operators.spans import duplicate_spans

    k = 2
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(corpus)]
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, k=k).collect()
    }
    assert got == _model_spans(corpus, k)


@pytest.mark.spark
@settings(**_SETTINGS)
@given(corpus=_CORPUS.filter(lambda c: any(len(d) > 0 for d in c)))
def test_line_dedup_matches_model(spark, corpus):
    from deltaforge_spark.operators.spans import line_dedup

    df = spark.createDataFrame(
        [Row(doc_id=i, lines=[" ".join([w]) for w in ws]) for i, ws in enumerate(corpus)]
    )
    got = {
        r["doc_id"]: (r["kept_text"], r["n_kept"], r["n_removed"])
        for r in line_dedup(df, lines_col="lines").collect()
    }
    model = _model_line_dedup([[w for w in ws] for ws in corpus])
    # docs with zero lines emit no row (no exploded lines)
    model = {d: v for d, v in model.items() if corpus[d]}
    assert got == model
