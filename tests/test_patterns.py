"""AllowList / TableFilter semantics + the DataFrame-side compiled
predicate agreeing with the driver-side matcher on every case.

Mirrors the reference's patterns.rs tests (exact-must-not-prefix-match,
is_empty pins, unqualified-matches-any-qualifier, wildcard and
%-prefix cases, exclude-beats-include) and adds a differential test:
`table_filter_column` must decide identically to `TableFilter.matches`
over a matrix of (db, table) rows.
"""

import pytest

from deltaforge_spark.patterns import (
    AllowList,
    TableFilter,
    table_filter_column,
)


def test_exact_pattern_does_not_prefix_match():
    exact = AllowList(["orders"])
    assert exact.matches_name("orders")
    assert not exact.matches_name("orders_archive")
    assert AllowList(["order%"]).matches_name("orders")
    assert AllowList(["order*"]).matches_name("orders")


def test_empty_list_matches_everything():
    al = AllowList([])
    assert al.matches("any", "table") and al.is_empty()
    assert str(al) == "[*]"


def test_exact_qualified_match():
    al = AllowList(["public.users"])
    assert al.matches("public", "users")
    assert not al.matches("public", "orders")
    assert not al.matches("other", "users")


def test_unqualified_pattern_matches_any_qualifier():
    al = AllowList(["orders"])
    for q in ("public", "myschema", ""):
        assert al.matches(q, "orders")
    assert not al.matches("public", "users")


def test_wildcard_and_prefix():
    al = AllowList(["public.*"])
    assert al.matches("public", "users") and not al.matches("other", "users")
    pre = AllowList(["public.order_%"])
    assert pre.matches("public", "order_items")
    assert pre.matches("public", "order_")
    assert not pre.matches("public", "orders")
    assert not pre.matches("public", "user_orders")
    # qualifier side can be a wildcard too
    assert AllowList(["*.orders"]).matches("anything", "orders")


def test_table_filter_exclude_beats_include():
    tf = TableFilter(include=["shop.*"], exclude=["shop.tmp%"])
    assert tf.matches("shop", "orders")
    assert not tf.matches("shop", "tmp_scratch")
    assert not tf.matches("other", "orders")  # include scopes
    # empty include = include all (minus exclude)
    tf2 = TableFilter(exclude=["*.secrets"])
    assert tf2.matches("any", "orders")
    assert not tf2.matches("any", "secrets")


def test_table_filter_is_empty_requires_both_sides_empty():
    assert TableFilter().is_empty()
    assert not TableFilter(include=["a.b"]).is_empty()
    assert not TableFilter(exclude=["a.b"]).is_empty()


def test_matches_name_unqualified_context():
    tf = TableFilter(include=["orders", "audit.*"], exclude=["orders_old"])
    assert tf.matches_name("orders")
    assert not tf.matches_name("orders_old")
    # name-only mode drops the qualifier entirely (patterns.rs:124-132):
    # "audit.*" contributes name-pattern "*", which matches anything
    assert tf.matches_name("anything") is True


CASES = [
    ("shop", "orders"),
    ("shop", "order_items"),
    ("shop", "tmp_scratch"),
    ("audit", "logs"),
    ("other", "orders"),
    ("public", "users"),
    ("db_x", "secrets"),
    ("shop_eu", "orders"),
]

FILTERS = [
    TableFilter(),
    TableFilter(include=["shop.orders"]),
    TableFilter(include=["orders"]),
    TableFilter(include=["shop.*"], exclude=["shop.tmp%"]),
    TableFilter(include=["shop%.order%"]),
    TableFilter(exclude=["*.secrets"]),
    TableFilter(include=["audit.*", "public.users"]),
]


@pytest.mark.spark
def test_column_compiler_agrees_with_driver_matcher(spark):
    rows = [{"source": {"db": q, "table": n}} for q, n in CASES]
    df = spark.createDataFrame(rows)
    for tf in FILTERS:
        got = {
            (r["source"]["db"], r["source"]["table"])
            for r in df.filter(table_filter_column(tf)).collect()
        }
        want = {(q, n) for q, n in CASES if tf.matches(q, n)}
        assert got == want, f"divergence for {tf}"


@pytest.mark.spark
def test_snapshot_scoped_by_table_filter(spark, tmp_path):
    from deltaforge_spark.sources.snapshot import run_snapshot

    seen = []
    ran = run_snapshot(
        spark,
        "/root/testdata/sf0.001",
        ["region", "nation", "supplier"],
        sink=lambda t, ev: seen.append(t),
        table_filter=TableFilter(include=["testdb.*"], exclude=["*.supplier"]),
    )
    assert ran == ["region", "nation"] and seen == ran


# ---- property-based differential: driver matcher vs Column compiler ----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _name = st.text(alphabet="abz_123", min_size=0, max_size=6)
    _seg = st.one_of(
        st.just("*"),
        st.just("%"),
        _name,
        _name.map(lambda s: s + "%"),
        _name.map(lambda s: s + "*"),
    )
    _pattern = st.one_of(_seg, st.tuples(_seg, _seg).map(lambda t: f"{t[0]}.{t[1]}"))

    @settings(max_examples=200, deadline=None)
    @given(
        include=st.lists(_pattern, max_size=3),
        exclude=st.lists(_pattern, max_size=3),
        qualifier=_name,
        name=_name,
    )
    def test_matcher_is_total_and_consistent(include, exclude, qualifier, name):
        """Pure-python invariants over random patterns: empty filter
        admits everything; exclude always wins; matches() is
        deterministic and total."""
        tf = TableFilter(include=include, exclude=exclude)
        got = tf.matches(qualifier, name)
        assert isinstance(got, bool)
        assert got == tf.matches(qualifier, name)
        if not include and not exclude:
            assert got is True
        if AllowList(exclude).matches(qualifier, name) and exclude:
            assert got is False

    @pytest.mark.spark
    def test_column_compiler_agrees_on_random_matrix(spark):
        """One Spark pass over a hypothesis-shaped grid (kept out of
        @given — a Spark job per example would take minutes)."""
        import itertools
        import random

        rng = random.Random(7)
        segs = ["", "a", "ab", "abz", "a_1", "z3"]
        pats = ["*", "%", "a", "ab%", "a*", "z3", "ab.a", "*.z3", "a%.%", "ab.a%"]
        cases = list(itertools.product(segs, segs))
        rows = [{"source": {"db": q, "table": n}} for q, n in cases]
        df = spark.createDataFrame(rows)
        for _ in range(12):
            tf = TableFilter(
                include=rng.sample(pats, rng.randint(0, 3)),
                exclude=rng.sample(pats, rng.randint(0, 3)),
            )
            got = {
                (r["source"]["db"], r["source"]["table"])
                for r in df.filter(table_filter_column(tf)).collect()
            }
            want = {(q, n) for q, n in cases if tf.matches(q, n)}
            assert got == want, f"divergence for include={tf.include} exclude={tf.exclude}"
