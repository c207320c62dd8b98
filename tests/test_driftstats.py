"""Data-level drift statistics: variant type classification, histogram
totals, threshold behavior, undeclared keys, and null-vs-missing
distinction (drift_detector.rs semantics)."""

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.schema.driftstats import (
    drift_events,
    observed_key_counts,
    observed_type_counts,
)

ROWS = [
    ('{"a": 1, "b": "x"}',),
    ('{"a": "oops", "b": "y", "extra": true}',),
    ('{"a": 2.5, "b": null}',),
    ('{"b": "z", "arr": [1], "obj": {"k": 1}}',),  # a missing
]


@pytest.fixture()
def payloads(spark):
    return spark.createDataFrame(ROWS, "payload string")


@pytest.mark.spark
def test_observed_type_counts_classify_all_rows(spark, payloads):
    counts = {
        (r.column, r.observed): r.n
        for r in observed_type_counts(payloads, "payload", ["a", "b", "arr", "obj"]).collect()
    }
    assert counts[("a", "int")] == 1
    assert counts[("a", "string")] == 1
    assert counts[("a", "double")] == 1
    assert counts[("a", "missing")] == 1
    assert counts[("b", "string")] == 3
    assert counts[("b", "null")] == 1  # present-with-null ≠ missing
    assert counts[("arr", "array")] == 1 and counts[("arr", "missing")] == 3
    assert counts[("obj", "object")] == 1
    # every row classifies once per column
    for col in ("a", "b", "arr", "obj"):
        assert sum(n for (c, _), n in counts.items() if c == col) == len(ROWS)


@pytest.mark.spark
def test_observed_key_counts(spark, payloads):
    keys = {r.key: r.n_present for r in observed_key_counts(payloads, "payload").collect()}
    assert keys == {"a": 3, "b": 4, "extra": 1, "arr": 1, "obj": 1}


@pytest.mark.spark
def test_drift_events_rules(spark, payloads):
    out = drift_events(
        payloads,
        "payload",
        declared={"a": "int", "b": "string"},
        non_null={"a", "b"},
    ).collect()
    events = {(r["column"], r.drift_type, r.expected, r.observed): r.n for r in out}
    # type mismatches: a seen as string once and double once
    assert events[("a", "type_mismatch", "int", "string")] == 1
    assert events[("a", "type_mismatch", "int", "double")] == 1
    # nulls: a missing once (1/4 > 0.1%), b json-null once
    assert events[("a", "unexpected_nulls", "int", "null")] == 1
    assert events[("b", "unexpected_nulls", "string", "null")] == 1
    # undeclared keys with occurrence counts
    assert events[("extra", "undeclared_column", "-", "-")] == 1
    assert events[("arr", "undeclared_column", "-", "-")] == 1
    assert events[("obj", "undeclared_column", "-", "-")] == 1
    assert len(events) == 7


@pytest.mark.spark
def test_null_rate_threshold_gates_events(spark):
    # 1 null in 2000 rows = 0.05% < 0.1% default threshold → no event;
    # a custom lower threshold surfaces it
    rows = [(f'{{"a": {i}}}',) for i in range(1999)] + [('{"a": null}',)]
    df = spark.createDataFrame(rows, "payload string")
    quiet = drift_events(df, "payload", {"a": "int"}, non_null={"a"}).collect()
    assert quiet == []
    loud = drift_events(
        df, "payload", {"a": "int"}, non_null={"a"}, null_rate_threshold=0.0001
    ).collect()
    assert [(r.drift_type, r.n) for r in loud] == [("unexpected_nulls", 1)]


def test_drift_report_shape_for_rest(spark):
    """drift_events → the REST drift response shape, end to end through
    PipelineManager.record_drift (the drift_detector.rs surface)."""
    import json

    from pyspark.sql import functions as F

    from deltaforge_spark.schema.driftstats import drift_events, drift_report

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": "oops", "b": "y"}',),
        ('{"a": 2, "b": "z", "extra": true}',),
    ]
    df = spark.createDataFrame(rows, ["payload"])
    ev = drift_events(df, "payload", {"a": "int", "b": "string"})
    rep = drift_report(ev, table="orders", events_analyzed=3)
    assert rep["table"] == "orders" and rep["has_drift"] is True
    assert rep["events_analyzed"] == 3 and rep["events_with_drift"] == 1
    cols = {c["column"]: c for c in rep["columns"]}
    assert cols["a"]["expected_type"] == "int"
    assert "string" in cols["a"]["observed_types"]
    assert cols["extra"]["mismatch_count"] == 1
    json.dumps(rep)  # REST-serializable as-is
