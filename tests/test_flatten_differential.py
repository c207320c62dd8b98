"""Differential test: flatten_json (column algebra) vs an independent
pure-Python model of the reference's flatten semantics
(flatten.rs:29-203 / flatten_cfg.rs policy matrix), over
hypothesis-generated JSON documents.

The generator emits COMPACT JSON limited to int/str/bool scalars and
ascii keys without the separator, because ``from_json(map<string,
string>)`` surfaces nested containers as their raw source text (so
whitespace would leak into values) and scalar strings unquoted."""

import json

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from deltaforge_spark.operators.flatten import flatten_json

keys = st.text(alphabet="abcdef", min_size=1, max_size=3)
scalars = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.text(alphabet="xyz123 ", min_size=0, max_size=8),
    st.booleans(),
)


def json_objects(depth):
    if depth == 0:
        return scalars
    return st.dictionaries(
        keys,
        st.one_of(
            scalars,
            json_objects(depth - 1),
            st.lists(scalars, max_size=3),
        ),
        max_size=4,
    )


def _scalar_text(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    return v  # strings surface unquoted through map<string,string>


def _container_text(v):
    return json.dumps(v, separators=(",", ":"))


def model_flatten(doc, *, sep="__", max_depth=3, lists="preserve",
                  empty_object="preserve", empty_list="preserve"):
    """BFS by level, mirroring flatten_json's step() exactly."""
    out = {}
    level = [(k, v) for k, v in doc.items()]
    for d in range(max_depth + 1):
        at_boundary = d == max_depth
        nxt = []
        for path, v in level:
            is_obj = isinstance(v, dict)
            is_lst = isinstance(v, list)
            recurses = (not at_boundary) and (
                (is_obj and len(v) > 0) or (lists == "index" and is_lst and len(v) > 0)
            )
            if recurses:
                if is_obj:
                    nxt.extend((f"{path}{sep}{k}", cv) for k, cv in v.items())
                else:
                    nxt.extend((f"{path}{sep}{i}", cv) for i, cv in enumerate(v))
                continue
            if is_obj and len(v) == 0:
                if empty_object == "drop":
                    continue
                out[path] = "{}" if empty_object == "preserve" else "null"
            elif is_lst and len(v) == 0:
                if empty_list == "drop":
                    continue
                out[path] = "[]" if empty_list == "preserve" else "null"
            elif is_obj or is_lst:
                out[path] = _container_text(v)
            else:
                out[path] = _scalar_text(v)
        level = nxt
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, json.dumps(d, separators=(",", ":"))) for i, d in enumerate(docs)],
        "id long, payload string",
    )
    rows = df.select(
        "id", flatten_json(F.col("payload"), collision="last", **kw).alias("m")
    ).collect()
    return {r.id: dict(r.m or {}) for r in rows}


_SETTINGS = dict(max_examples=8, deadline=None)


@settings(**_SETTINGS)
@given(st.lists(json_objects(3), min_size=1, max_size=8))
def test_flatten_json_matches_model_preserve(spark, docs):
    got = _run(spark, docs, lists="preserve")
    for i, d in enumerate(docs):
        assert got[i] == model_flatten(d, lists="preserve"), f"doc={d!r}"


@settings(**_SETTINGS)
@given(st.lists(json_objects(3), min_size=1, max_size=8))
def test_flatten_json_matches_model_indexed_lists(spark, docs):
    got = _run(spark, docs, lists="index")
    for i, d in enumerate(docs):
        assert got[i] == model_flatten(d, lists="index"), f"doc={d!r}"


@settings(**_SETTINGS)
@given(st.lists(json_objects(2), min_size=1, max_size=6))
def test_flatten_json_matches_model_drop_policies(spark, docs):
    kw = dict(empty_object="drop", empty_list="null")
    got = _run(spark, docs, lists="preserve", **kw)
    for i, d in enumerate(docs):
        assert got[i] == model_flatten(d, lists="preserve", **kw), f"doc={d!r}"
