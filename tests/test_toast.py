"""TOAST partial-row-image handling: marker recognition, `changed`
filter semantics over elided values, consumer-side merge, flatten
pass-through — mirrors postgres_object.rs:450-462 and the reference's
TOAST consumer guidance."""

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.operators.flatten import flatten_json
from deltaforge_spark.operators.toast import (
    UNCHANGED_JSON,
    changed_with_toast,
    is_unchanged_marker,
    resolve_toast,
    unchanged_marker,
)


def test_marker_recognition(spark):
    df = spark.createDataFrame(
        [(UNCHANGED_JSON,), ('{"k":1}',), ('{"_unchanged":false}',), (None,), ("5",)],
        ["j"],
    )
    got = [r["m"] for r in df.select(is_unchanged_marker(F.col("j")).alias("m")).collect()]
    assert got == [True, False, False, False, False]


def test_changed_filter_never_fires_on_marker(spark):
    rows = [
        ('{"big":"v1"}', UNCHANGED_JSON),  # elided → NOT changed
        ('{"big":"v1"}', '{"big":"v2"}'),  # real change
        ('{"big":"v1"}', '{"big":"v1"}'),  # identical → not changed
    ]
    df = spark.createDataFrame(rows, ["before_img", "after_img"])
    got = [
        r["c"]
        for r in df.select(
            changed_with_toast(F.col("before_img"), F.col("after_img")).alias("c")
        ).collect()
    ]
    assert got == [False, True, False]


def test_resolve_toast_merges_latest_real_value(spark):
    rows = [
        (1, 10, '{"a":1}'),
        (2, 10, UNCHANGED_JSON),  # resolves to {"a":1}
        (3, 10, '{"a":2}'),
        (4, 10, UNCHANGED_JSON),  # resolves to {"a":2}
        (1, 20, UNCHANGED_JSON),  # no prior real value → NULL
        (2, 20, '{"b":9}'),
    ]
    df = spark.createDataFrame(rows, ["seq", "uid", "img"])
    out = resolve_toast(df, "img", key="uid", order="seq")
    got = {(r["uid"], r["seq"]): (r["img_resolved"], r["img_toasted"]) for r in out.collect()}
    assert got[(10, 2)] == ('{"a":1}', True)
    assert got[(10, 4)] == ('{"a":2}', True)
    assert got[(10, 3)] == ('{"a":2}', False)
    assert got[(20, 1)] == (None, True)
    assert got[(20, 2)] == ('{"b":9}', False)


def test_flatten_passes_marker_through(spark):
    """Flatten must not descend into the placeholder as if it were a
    real object with an `_unchanged` key of its own — wait, it IS such
    an object; the reference passes it through verbatim. Flattening a
    payload whose field is a marker keeps the marker recognizable."""
    df = spark.createDataFrame([(f'{{"id":1,"big":{UNCHANGED_JSON}}}',)], ["j"])
    out = dict(df.select(flatten_json(F.col("j"), max_depth=0).alias("m")).collect()[0]["m"])
    # at depth 0 the field stays an intact, recognizable marker
    assert out["big"] == UNCHANGED_JSON
    probe = spark.createDataFrame([(out["big"],)], ["v"]).select(
        is_unchanged_marker(F.col("v")).alias("m")
    )
    assert probe.collect()[0]["m"] is True


def test_unchanged_marker_literal(spark):
    df = spark.range(1).select(unchanged_marker().alias("m"))
    assert df.collect()[0]["m"] == UNCHANGED_JSON


def test_filterspec_changed_op_is_toast_aware(spark):
    """The filter processor's `changed` predicate must not fire when the
    after-image holds the TOAST marker (the value was elided because it
    did not change)."""
    from deltaforge_spark.operators import FilterSpec, apply_filter

    rows = [
        ("u", ("big-v1",), (UNCHANGED_JSON,)),  # elided → not changed
        ("u", ("big-v1",), ("big-v2",)),  # real change
        ("u", ("big-v1",), ("big-v1",)),  # identical
    ]
    df = spark.createDataFrame(
        rows, "op string, before struct<doc:string>, after struct<doc:string>"
    )
    spec = FilterSpec(fields=[{"field": "doc", "op": "changed"}])
    got = [r["after"]["doc"] for r in apply_filter(df, spec).collect()]
    assert got == ["big-v2"]
