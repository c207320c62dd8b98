"""Filter processor predicate matrix — mirrors the reference's
processors/tests/filter_processor_tests.rs coverage."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from deltaforge_spark.envelope import finish_envelope, source_col
from deltaforge_spark.operators import FilterSpec, apply_filter


ROW_T = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("tags", T.StringType()),
    ]
)

EVENT_T = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", ROW_T),
        T.StructField("after", ROW_T),
        T.StructField("_table", T.StringType()),
        T.StructField("event_id", T.StringType()),
    ]
)


def make_events(spark, rows):
    """rows: list of (op, table, before_dict, after_dict)"""
    data = []
    for i, (op, table, before, after) in enumerate(rows):
        data.append((op, 1000 + i, before, after, table, str(i)))
    df = spark.createDataFrame(data, EVENT_T)
    df = df.withColumn(
        "source", source_col("test", "p", "db1", "t", snapshot=False)
    ).withColumn(
        "source",
        F.struct(
            F.col("source.connector"),
            F.col("source.name"),
            F.col("source.db"),
            F.col("source.schema"),
            F.col("_table").alias("table"),
            F.col("source.snapshot"),
            F.col("source.sequence"),
        ),
    ).drop("_table")
    return finish_envelope(df)


ROW = {"status": "active", "total": 120.0, "tags": "a,b"}


def test_op_gate(spark):
    df = make_events(spark, [("c", "t", None, ROW), ("u", "t", ROW, ROW), ("d", "t", ROW, None)])
    out = apply_filter(df, FilterSpec(ops=["c", "u"]))
    assert sorted(r.op for r in out.collect()) == ["c", "u"]


def test_numeric_eq_cross_type(spark):
    # 42 == 42.0 via double comparison (reference filter.rs:148)
    df = make_events(spark, [("c", "t", None, {"total": 42.0, "status": "x", "tags": ""})])
    out = apply_filter(df, FilterSpec(fields=[{"field": "total", "op": "eq", "value": 42}]))
    assert out.count() == 1


def test_gte_in_regex_all(spark):
    rows = [
        ("c", "t", None, {"status": "active", "total": 120.0, "tags": "x"}),
        ("c", "t", None, {"status": "active", "total": 80.0, "tags": "x"}),
        ("c", "t", None, {"status": "closed", "total": 200.0, "tags": "x"}),
    ]
    df = make_events(spark, rows)
    spec = FilterSpec(
        fields=[
            {"field": "total", "op": "gte", "value": 100},
            {"field": "status", "op": "in", "value": ["active", "pending"]},
            {"field": "status", "op": "regex", "value": "^act"},
        ],
        match="all",
    )
    assert apply_filter(df, spec).count() == 1


def test_match_any(spark):
    rows = [
        ("c", "t", None, {"status": "active", "total": 10.0, "tags": ""}),
        ("c", "t", None, {"status": "closed", "total": 500.0, "tags": ""}),
        ("c", "t", None, {"status": "closed", "total": 10.0, "tags": ""}),
    ]
    spec = FilterSpec(
        fields=[
            {"field": "status", "op": "eq", "value": "active"},
            {"field": "total", "op": "gt", "value": 100},
        ],
        match="any",
    )
    assert apply_filter(make_events(spark, rows), spec).count() == 2


def test_changed_passes_create_delete(spark):
    rows = [
        ("c", "t", None, ROW),  # create: passes unconditionally
        ("d", "t", ROW, None),  # delete: passes unconditionally
        ("u", "t", ROW, ROW),  # unchanged update: filtered
        ("u", "t", {"status": "old", "total": 120.0, "tags": "a,b"}, ROW),  # changed
    ]
    spec = FilterSpec(fields=[{"field": "status", "op": "changed"}])
    out = apply_filter(make_events(spark, rows), spec)
    assert sorted(r.op for r in out.collect()) == ["c", "d", "u"]


def test_exists_not_exists(spark):
    rows = [
        ("c", "t", None, {"status": "a", "total": 1.0, "tags": None}),
        ("c", "t", None, {"status": "b", "total": 2.0, "tags": "z"}),
    ]
    df = make_events(spark, rows)
    assert apply_filter(df, FilterSpec(fields=[{"field": "tags", "op": "exists"}])).count() == 1
    assert apply_filter(df, FilterSpec(fields=[{"field": "tags", "op": "not_exists"}])).count() == 1


def test_contains(spark):
    rows = [("c", "t", None, {"status": "a", "total": 1.0, "tags": "alpha,beta"})]
    df = make_events(spark, rows)
    assert apply_filter(df, FilterSpec(fields=[{"field": "tags", "op": "contains", "value": "beta"}])).count() == 1
    assert apply_filter(df, FilterSpec(fields=[{"field": "tags", "op": "contains", "value": "gamma"}])).count() == 0


def test_table_globs(spark):
    rows = [
        ("c", "orders", None, ROW),
        ("c", "orders_archive", None, ROW),
        ("c", "users", None, ROW),
    ]
    df = make_events(spark, rows)
    spec = FilterSpec(include_tables=["db1.orders*"])
    assert sorted(r["source"]["table"] for r in apply_filter(df, spec).collect()) == [
        "orders",
        "orders_archive",
    ]
    spec = FilterSpec(include_tables=["db1.*"], exclude_tables=["%.users"])
    assert apply_filter(df, spec).count() == 2


def test_delete_events_use_before_image(spark):
    # bare dot-paths fall back to the before image on deletes
    rows = [("d", "t", {"status": "active", "total": 99.0, "tags": ""}, None)]
    spec = FilterSpec(fields=[{"field": "status", "op": "eq", "value": "active"}])
    assert apply_filter(make_events(spark, rows), spec).count() == 1


def test_missing_field_no_match(spark):
    rows = [("c", "t", None, ROW)]
    spec = FilterSpec(fields=[{"field": "nope.deep", "op": "eq", "value": 1}])
    with pytest.raises(Exception):
        # unresolvable column is a plan-time error (typed structs)
        apply_filter(make_events(spark, rows), spec).count()
