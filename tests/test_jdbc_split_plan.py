"""JDBC snapshot split planning (sources/snapshot.py pk_chunks /
jdbc_chunk_predicates / jdbc_snapshot_options): the chunk math must
match the reference's by_pk loop (mysql_snapshot.rs:441-507) exactly,
and every PK in [min, max] must be covered by exactly one chunk."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deltaforge_spark.sources.snapshot import (
    jdbc_chunk_predicates,
    jdbc_snapshot_options,
    pk_chunks,
)


def _reference_by_pk(min_pk, max_pk, chunk):
    """Literal transcription of the reference's cursor loop."""
    out, cursor = [], min_pk
    while cursor <= max_pk:
        out.append((cursor, cursor + chunk))
        cursor += chunk
    return out


def test_chunk_plan_matches_reference_loop():
    assert pk_chunks(1, 10, 4) == [(1, 5), (5, 9), (9, 13)]
    assert pk_chunks(1, 10, 4) == _reference_by_pk(1, 10, 4)
    # exact fit: last chunk ends exactly past max
    assert pk_chunks(0, 99, 50) == [(0, 50), (50, 100)]
    # single row
    assert pk_chunks(7, 7, 1000) == [(7, 1007)]
    # negative PKs (signed bigint ids)
    assert pk_chunks(-10, -1, 4) == _reference_by_pk(-10, -1, 4)


def test_empty_table_plans_zero_chunks():
    # mysql_snapshot.rs returns 0 on NULL bounds (empty table)
    assert pk_chunks(None, None, 100) == []
    assert pk_chunks(None, 5, 100) == []
    assert jdbc_chunk_predicates("id", None, None, 100) == []


def test_chunk_size_must_be_positive():
    import pytest

    with pytest.raises(ValueError):
        pk_chunks(0, 10, 0)


@settings(max_examples=200, deadline=None)
@given(
    mn=st.integers(min_value=-(2**40), max_value=2**40),
    span=st.integers(min_value=0, max_value=5_000),
    chunk=st.integers(min_value=1, max_value=700),
)
def test_every_pk_covered_exactly_once(mn, span, chunk):
    mx = mn + span
    chunks = pk_chunks(mn, mx, chunk)
    assert chunks == _reference_by_pk(mn, mx, chunk)
    # half-open ranges tile [mn, mx] with no gaps and no overlaps
    assert chunks[0][0] == mn and chunks[-1][1] > mx
    for (a_lo, a_hi), (b_lo, b_hi) in zip(chunks, chunks[1:]):
        assert a_hi == b_lo and a_hi - a_lo == chunk
    assert all(hi - lo == chunk for lo, hi in chunks)


def test_predicates_spell_the_chunks():
    preds = jdbc_chunk_predicates("id", 1, 10, 4)
    assert preds == [
        "id >= 1 AND id < 5",
        "id >= 5 AND id < 9",
        "id >= 9 AND id < 13",
    ]


def test_stride_options_bound_partition_width():
    opts = jdbc_snapshot_options("id", 0, 99, 50)
    assert opts == {
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "100",
        "numPartitions": "2",
    }
    # non-divisible span rounds the partition count UP so no stride
    # exceeds chunk_size
    assert jdbc_snapshot_options("id", 0, 100, 50)["numPartitions"] == "3"
    assert jdbc_snapshot_options("id", 5, 5, 1000)["numPartitions"] == "1"
