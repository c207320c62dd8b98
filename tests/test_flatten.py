"""Flatten processor policies — mirrors flatten_processor_tests.rs."""

import pytest
import pyspark.sql.functions as F
from pyspark.sql import Row

from deltaforge_spark.operators import flatten_struct_cols


def nested_df(spark):
    return spark.createDataFrame(
        [
            Row(
                op="c",
                after=Row(a=1, nested=Row(b=2, deeper=Row(c=3)), tags=["x", "y"]),
            )
        ]
    )


def test_basic_flatten(spark):
    out = flatten_struct_cols(nested_df(spark), cols=("after",))
    row = out.collect()[0]
    assert row["after__a"] == 1
    assert row["after__nested__b"] == 2
    assert row["after__nested__deeper__c"] == 3
    assert row["op"] == "c"


def test_max_depth_keeps_boundary_as_leaf(spark):
    out = flatten_struct_cols(nested_df(spark), cols=("after",), max_depth=2)
    row = out.collect()[0]
    assert row["after__nested__b"] == 2
    # depth boundary: deeper kept as a struct leaf
    assert row["after__nested__deeper"]["c"] == 3


def test_list_preserve_vs_index(spark):
    out = flatten_struct_cols(nested_df(spark), cols=("after",), list_policy="preserve")
    assert out.collect()[0]["after__tags"] == ["x", "y"]
    out = flatten_struct_cols(
        nested_df(spark), cols=("after",), list_policy="index", index_limit=3
    )
    row = out.collect()[0]
    assert row["after__tags__0"] == "x"
    assert row["after__tags__1"] == "y"
    assert row["after__tags__2"] is None  # out of range -> null


def test_collision_policies(spark):
    df = spark.createDataFrame([Row(after=Row(a=Row(b=1), a__b=9))])
    with pytest.raises(ValueError, match="collision"):
        flatten_struct_cols(df, cols=("after",), collision="error")
    first = flatten_struct_cols(df, cols=("after",), collision="first").collect()[0]
    assert first["after__a__b"] == 1
    last = flatten_struct_cols(df, cols=("after",), collision="last").collect()[0]
    assert last["after__a__b"] == 9


def test_flatten_in_place_keeps_envelope_composable(spark, sf_dir):
    """flatten.rs mutates the payload, not the event: before/after stay
    structs with flattened keys, NULL images stay NULL, and an envelope
    processor still works downstream."""
    from deltaforge_spark.operators import envelope_cloudevents
    from deltaforge_spark.operators.flatten import flatten_payloads_in_place
    from deltaforge_spark.sources import change_feed

    feed = change_feed(spark, sf_dir)
    flat = flatten_payloads_in_place(feed)
    # envelope columns intact, payload flattened in place
    assert "before" in flat.columns and "after" in flat.columns
    sub = flat.filter(F.col("op") == "u").select("after.value", "before.value").limit(1).collect()
    assert sub, "update rows exist"
    # NULL image stays NULL (creates have no before)
    creates = flat.filter(F.col("op") == "c").select("before").limit(5).collect()
    assert all(r.before is None for r in creates)
    # composes with a downstream envelope
    out = envelope_cloudevents(flat).select("value").limit(1).collect()
    assert '"specversion"' in out[0].value


def test_flatten_in_place_nested_keys(spark):
    from deltaforge_spark.operators.flatten import flatten_payloads_in_place

    df = spark.createDataFrame(
        [(1, ((1, "x"),))],
        "id long, after struct<a:struct<b:long,c:string>>",
    )
    out = flatten_payloads_in_place(df)
    row = out.collect()[0]
    assert row.after.asDict() == {"a__b": 1, "a__c": "x"}
