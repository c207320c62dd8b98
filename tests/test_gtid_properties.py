"""Property tests for the GTID set algebra — invariants a resume
position must never violate (mirrors the reference's fingerprint-
stability style unit rigor, SURVEY §5.1, with hypothesis)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deltaforge_spark.sources.gtid import GtidSet, merge_gtid

UUIDS = ["aaaa-1111", "bbbb-2222", "cccc-3333"]

intervals = st.lists(
    st.tuples(st.integers(1, 200), st.integers(0, 30)).map(lambda t: (t[0], t[0] + t[1])),
    min_size=0,
    max_size=6,
)
gtid_sets = st.dictionaries(st.sampled_from(UUIDS), intervals, max_size=3).map(
    lambda d: GtidSet.parse(
        ",".join(
            f"{u}:" + ":".join(f"{a}-{b}" for a, b in ivs) for u, ivs in d.items() if ivs
        )
    )
)


@given(gtid_sets)
@settings(max_examples=200, deadline=None)
def test_parse_str_roundtrip(s):
    assert GtidSet.parse(str(s)).intervals == s.intervals


@given(gtid_sets)
@settings(max_examples=200, deadline=None)
def test_normalization_invariants(s):
    for ivs in s.intervals.values():
        # sorted, non-empty, non-adjacent/non-overlapping
        assert all(a <= b for a, b in ivs)
        assert all(ivs[i + 1][0] > ivs[i][1] + 1 for i in range(len(ivs) - 1))


@given(gtid_sets, gtid_sets)
@settings(max_examples=200, deadline=None)
def test_subset_of_union(a, b):
    union = GtidSet.parse(str(a))
    for uuid, ivs in b.intervals.items():
        for lo, hi in ivs:
            for seq in (lo, hi):
                union.add(uuid, seq)
            for seq in range(lo, hi + 1):
                union.add(uuid, seq)
    assert a.is_subset_of(union)
    assert b.is_subset_of(union)


@given(gtid_sets)
@settings(max_examples=100, deadline=None)
def test_subset_reflexive(s):
    assert s.is_subset_of(s)


@given(st.sampled_from(UUIDS), st.integers(1, 50), st.integers(1, 60))
@settings(max_examples=200, deadline=None)
def test_merge_gtid_matches_set_semantics(uuid, start, n):
    """Sequentially merging uuid:start..start+n-1 (the handle_gtid loop)
    produces a set whose coverage equals {start..start+n-1}."""
    acc = f"{uuid}:{start}"
    for seq in range(start + 1, start + n):
        acc = merge_gtid(acc, f"{uuid}:{seq}")
    parsed = GtidSet.parse(acc)
    assert parsed.contains(uuid, start) and parsed.contains(uuid, start + n - 1)
    assert not parsed.contains(uuid, start + n)
    # reference semantics: one contiguous range per uuid
    assert parsed.intervals[uuid] == [(start, start + n - 1)]


@given(gtid_sets, st.sampled_from(UUIDS), st.integers(1, 300))
@settings(max_examples=200, deadline=None)
def test_add_grows_monotonically(s, uuid, seq):
    before = GtidSet.parse(str(s))
    s.add(uuid, seq)
    assert before.is_subset_of(s)
    assert s.contains(uuid, seq)
