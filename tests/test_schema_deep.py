"""Deep schema sensing: nested key-path fingerprints, per-field
map-vs-struct classification, shape-drift detection — mirrors reference
fingerprint.rs / high_cardinality.rs / sensor.rs cache-miss semantics."""

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.schema.sensing import (
    classify_field_paths,
    deep_key_paths,
    deep_shape_fingerprint,
    observe_deep_shapes,
    shape_drift,
)


@pytest.fixture()
def payloads(spark):
    rows = [
        ('{"a":1,"b":{"c":2,"d":{"e":3}}}',),
        ('{"a":9,"b":{"c":0,"d":{"e":7}}}',),  # same shape, different values
        ('{"a":1,"b":{"c":2}}',),  # nested shape differs (no b.d)
        ('{"a":1,"x":[1,2,3]}',),  # array is a leaf, not descended
    ]
    return spark.createDataFrame(rows, ["payload"])


def test_deep_key_paths_walk(payloads):
    out = payloads.select(
        F.array_sort(deep_key_paths(F.col("payload"))).alias("p")
    ).collect()
    assert out[0]["p"] == ["a", "b", "b.c", "b.d", "b.d.e"]
    assert out[2]["p"] == ["a", "b", "b.c"]
    assert out[3]["p"] == ["a", "x"]  # arrays/scalars stop the recursion


def test_fingerprint_value_invariant_shape_sensitive(payloads):
    fps = [
        r["f"]
        for r in payloads.select(
            deep_shape_fingerprint(F.col("payload")).alias("f")
        ).collect()
    ]
    assert fps[0] == fps[1]  # values don't matter
    assert fps[0] != fps[2]  # nested shape does (top-level keys identical!)
    assert len({fps[0], fps[2], fps[3]}) == 3


def test_observe_deep_shapes_collapses(payloads):
    obs = observe_deep_shapes(payloads, "payload")
    rows = {r["shape_fingerprint"]: r["n_rows"] for r in obs.collect()}
    assert sorted(rows.values()) == [1, 1, 2]


def test_shape_drift_detects_nested_change(spark, payloads):
    before = observe_deep_shapes(payloads.limit(2), "payload")  # one shape
    after = observe_deep_shapes(payloads, "payload")
    drifted = shape_drift(before, after)
    assert drifted.count() == 2  # the two novel shapes
    # a shallow (top-level-only) fingerprint would MISS the b.d change:
    shallow = payloads.select(
        F.md5(F.concat_ws(",", F.array_sort(F.json_object_keys("payload")))).alias("f")
    )
    assert shallow.distinct().count() == 2  # rows 0-2 collide at top level
    deep = payloads.select(deep_shape_fingerprint(F.col("payload")).alias("f"))
    assert deep.distinct().count() == 3


def test_classify_field_paths_map_vs_struct(spark):
    # 'attrs' is user-keyed (40 distinct keys), 'user' is a fixed struct
    df = spark.range(200).select(
        F.concat(
            F.lit('{"user":{"uid":'),
            F.col("id").cast("string"),
            F.lit(',"name":"x"},"attrs":{"k'),
            (F.col("id") % 40).cast("string"),
            F.lit('":1}}'),
        ).alias("payload")
    )
    out = {
        r["parent_path"]: r
        for r in classify_field_paths(df, "payload", exact=True).collect()
    }
    assert set(out) == {"", "user", "attrs"}
    assert not out[""]["is_map"]  # 2 stable top-level keys
    assert not out["user"]["is_map"]  # uid+name
    assert out["attrs"]["is_map"]  # 40 distinct keys > 16
    assert out["attrs"]["n_entries"] == 200
    assert out["user"]["n_distinct_keys"] == 2


def test_classify_approx_hll_path(spark):
    """The scale path uses approx_count_distinct (built-in HLL, the
    reference's sketch) — classification decisions match exact."""
    df = spark.range(500).select(
        F.concat(
            F.lit('{"attrs":{"k'), (F.col("id") % 100).cast("string"), F.lit('":1}}')
        ).alias("payload")
    )
    exact = {
        r["parent_path"]: r["is_map"]
        for r in classify_field_paths(df, "payload", exact=True).collect()
    }
    approx = {
        r["parent_path"]: r["is_map"]
        for r in classify_field_paths(df, "payload", exact=False).collect()
    }
    assert exact == approx


# ----------------------------------------------------------- guided sensing


@pytest.fixture()
def cdc_events(spark):
    rows = [
        # known table "users": typed cols + one JSON column "prefs"
        ("users", (1, '{"theme":"dark"}')),
        ("users", (2, '{"theme":"light"}')),
        ("users", (3, '{"theme":"dark","beta":{"on":true}}')),  # evolved shape
        # unknown table: full payload observed
        ("mystery", (9, '{"whatever":1}')),
    ]
    return spark.createDataFrame(
        rows, "table string, after struct<id:long,prefs:string>"
    ).select(F.struct(F.col("table")).alias("source"), "after")


def test_guided_sensing_scopes_known_tables_to_json_columns(cdc_events):
    from deltaforge_spark.schema.sensing import guided_shape_observations

    obs = guided_shape_observations(cdc_events, {"users": ["prefs"]})
    rows = obs.collect()
    by_table = {}
    for r in rows:
        by_table.setdefault(r["table"], []).append(r)
    # known table: observations are column-scoped to the JSON column only
    assert all(r["column"] == "prefs" for r in by_table["users"])
    assert len(by_table["users"]) == 2  # {"theme"} and {"theme","beta{on}"}
    # unknown table: one full-payload observation
    assert [r["column"] for r in by_table["mystery"]] == ["*"]


def test_guided_sensing_schemaless_falls_back_to_full_payload(cdc_events):
    from deltaforge_spark.schema.sensing import guided_shape_observations

    obs = guided_shape_observations(cdc_events, None)
    assert {r["column"] for r in obs.collect()} == {"*"}


def test_guided_drift_flags_only_unexpected_shapes(spark, cdc_events):
    from deltaforge_spark.schema.sensing import (
        guided_drift,
        guided_shape_observations,
    )

    obs = guided_shape_observations(cdc_events, {"users": ["prefs"]})
    # register the flat {"theme"} shape as expected
    flat = (
        obs.filter((F.col("table") == "users") & (F.col("n_rows") == 2))
        .collect()[0]["shape_fingerprint"]
    )
    drift = guided_drift(obs, {("users", "prefs"): flat}).collect()
    assert len(drift) == 1  # only the evolved {"theme","beta"} shape
    assert drift[0]["n_rows"] == 1
    assert drift[0]["expected_fingerprint"] == flat
    # unknown table has no expectation → never drift
    assert all(d["table"] == "users" for d in drift)


def test_heavy_hitter_keys_stable_vs_dynamic(spark):
    from deltaforge_spark.schema.sensing import heavy_hitter_keys

    # 10 payloads: root keys a/b always present (stable), "attrs" is a
    # user-keyed map — every child key unique per event (dynamic)
    rows = [
        (f'{{"a": 1, "b": 2, "attrs": {{"u{i}": "x", "v{i}": "y"}}}}'.replace("{i}", str(i)),)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "payload string")
    hh = heavy_hitter_keys(df, "payload", max_depth=2, capacity=50)
    root = {r.child_key: r for r in hh.filter(F.col("parent_path") == "").collect()}
    assert root["a"].stable and root["a"].support == 1.0
    assert root["b"].stable and root["attrs"].stable
    attrs = [r for r in hh.filter(F.col("parent_path") == "attrs").collect()]
    assert len(attrs) == 20  # u0..u9, v0..v9 each once
    assert all((not r.stable) and r.support == 0.1 for r in attrs)


def test_heavy_hitter_capacity_cut(spark):
    from deltaforge_spark.schema.sensing import heavy_hitter_keys

    rows = [('{"k%d": 1, "common": 2}' % (i % 7),) for i in range(21)]
    df = spark.createDataFrame(rows, "payload string")
    hh = heavy_hitter_keys(df, "payload", max_depth=1, capacity=3)
    got = hh.orderBy("rank").collect()
    assert len(got) == 3
    # 'common' appears in every payload -> rank 1 and stable
    assert got[0].child_key == "common" and got[0].stable
    assert [r.rank for r in got] == [1, 2, 3]
