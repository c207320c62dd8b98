"""Dynamic-JSON flatten policy matrix — test names mirror
processors/tests/flatten_processor_tests.rs."""

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.operators.flatten import flatten_json, flatten_struct_cols


def _flat(spark, payload: str, **kw) -> dict:
    df = spark.createDataFrame([(payload,)], ["j"])
    out = df.select(flatten_json(F.col("j"), **kw).alias("m")).collect()
    return dict(out[0]["m"])


def test_flattens_nested_object_with_default_separator(spark):
    got = _flat(spark, '{"user":{"name":"amy","addr":{"city":"x"}},"n":1}')
    assert got == {"user__name": "amy", "user__addr__city": "x", "n": "1"}


def test_already_flat_payload_is_idempotent(spark):
    got = _flat(spark, '{"a":1,"b":"s"}')
    assert got == {"a": "1", "b": "s"}


def test_custom_separator_used_in_keys(spark):
    got = _flat(spark, '{"a":{"b":1}}', sep=".")
    assert got == {"a.b": "1"}


def test_max_depth_stops_recursion_and_keeps_remaining_as_leaf(spark):
    got = _flat(spark, '{"a":{"b":{"c":{"d":1}}}}', max_depth=2)
    assert got == {"a__b__c": '{"d":1}'}


def test_max_depth_zero_keeps_all_as_leaves(spark):
    got = _flat(spark, '{"a":{"b":1},"n":2}', max_depth=0)
    assert got == {"a": '{"b":1}', "n": "2"}


# ------------------------------------------------------ empty_object policy


def test_empty_object_preserve_keeps_field(spark):
    got = _flat(spark, '{"meta":{},"a":1}', empty_object="preserve")
    assert got == {"meta": "{}", "a": "1"}


def test_empty_object_drop_removes_field(spark):
    got = _flat(spark, '{"meta":{},"a":1}', empty_object="drop")
    assert got == {"a": "1"}


def test_empty_object_null_converts_field(spark):
    got = _flat(spark, '{"meta":{},"a":1}', empty_object="null")
    assert got == {"meta": "null", "a": "1"}


def test_empty_object_at_max_depth_respects_policy(spark):
    # user__meta sits at the boundary and is empty — still dropped
    got = _flat(spark, '{"user":{"meta":{},"n":1}}', max_depth=1, empty_object="drop")
    assert got == {"user__n": "1"}


# ------------------------------------------------------------ lists policy


def test_lists_preserve_keeps_array_intact(spark):
    got = _flat(spark, '{"tags":[1,2,3],"a":1}')
    assert got == {"tags": "[1,2,3]", "a": "1"}


def test_lists_index_expands_to_keyed_entries(spark):
    got = _flat(spark, '{"tags":[7,8],"a":1}', lists="index")
    assert got == {"tags__0": "7", "tags__1": "8", "a": "1"}


def test_index_list_recursion_descends_into_object_elements(spark):
    got = _flat(spark, '{"xs":[{"k":1},{"k":2}]}', lists="index")
    assert got == {"xs__0__k": "1", "xs__1__k": "2"}


def test_index_list_recursion_respects_max_depth(spark):
    got = _flat(spark, '{"xs":[{"k":{"d":1}}]}', lists="index", max_depth=2)
    assert got == {"xs__0__k": '{"d":1}'}


# ------------------------------------------------------- empty_list policy


def test_empty_list_preserve_keeps_field(spark):
    got = _flat(spark, '{"tags":[],"a":1}', empty_list="preserve")
    assert got == {"tags": "[]", "a": "1"}


def test_empty_list_drop_removes_field(spark):
    got = _flat(spark, '{"tags":[],"a":1}', empty_list="drop")
    assert got == {"a": "1"}


def test_empty_list_null_converts_field(spark):
    got = _flat(spark, '{"tags":[],"a":1}', empty_list="null")
    assert got == {"tags": "null", "a": "1"}


# -------------------------------------------------------- collision policy


def test_collision_last_wins(spark):
    # "a__b" literal key collides with flattened a.b — later wins
    got = _flat(spark, '{"a__b":"lit","a":{"b":"nested"}}', collision="last")
    assert got == {"a__b": "nested"}


def test_collision_first_wins(spark):
    got = _flat(spark, '{"a__b":"lit","a":{"b":"nested"}}', collision="first")
    assert got == {"a__b": "lit"}


def test_collision_error_fails_batch(spark):
    df = spark.createDataFrame([('{"a__b":1,"a":{"b":2}}',)], ["j"])
    with pytest.raises(Exception, match="DUPLICATED_MAP_KEY|Duplicate map key"):
        df.select(flatten_json(F.col("j"), collision="error").alias("m")).collect()


def test_non_object_payload_flattens_to_empty(spark):
    assert _flat(spark, "[1,2]") == {}
    assert _flat(spark, "5") == {}


# ---------------------------------------------------- typed-path policies


def test_typed_empty_list_null_policy(spark):
    df = spark.createDataFrame(
        [(1, ([], {"k": "v"})), (2, (["x"], {}))],
        "id long, after struct<tags:array<string>,attrs:map<string,string>>",
    )
    out = flatten_struct_cols(
        df, cols=("after",), empty_list="null", empty_object="null"
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["after__tags"] is None  # [] → NULL
    assert by_id[1]["after__attrs"] == {"k": "v"}
    assert by_id[2]["after__tags"] == ["x"]
    assert by_id[2]["after__attrs"] is None  # {} → NULL
