"""Property-based round-trip tests for the wire codecs: arbitrary
typed rows encode into a binlog segment / pgoutput messages and must
parse back identically — the fuzz layer on top of the pinned-vector
tests in test_wire_decode.py."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from deltaforge_spark.sources import binlog as bl
from deltaforge_spark.sources import pgoutput as pg
from deltaforge_spark.functions import jsonb as jb

# one strategy per supported column type: (type, meta, value strategy)
_COLUMN_KINDS = [
    (bl.MYSQL_TYPE_TINY, 0, st.integers(-128, 127)),
    (bl.MYSQL_TYPE_SHORT, 0, st.integers(-(1 << 15), (1 << 15) - 1)),
    (bl.MYSQL_TYPE_INT24, 0, st.integers(-(1 << 23), (1 << 23) - 1)),
    (bl.MYSQL_TYPE_LONG, 0, st.integers(-(1 << 31), (1 << 31) - 1)),
    (bl.MYSQL_TYPE_LONGLONG, 0, st.integers(-(1 << 63), (1 << 63) - 1)),
    (bl.MYSQL_TYPE_DOUBLE, 8, st.floats(allow_nan=False, width=64)),
    (
        bl.MYSQL_TYPE_VARCHAR,
        255,
        st.text(max_size=60).filter(lambda s: len(s.encode()) <= 255),
    ),
    (bl.MYSQL_TYPE_VARCHAR, 1024, st.text(max_size=300)),
    (
        bl.MYSQL_TYPE_DATETIME2,
        6,
        st.integers(0, 4_102_444_800_000_000),  # 1970..2100 µs
    ),
    (bl.MYSQL_TYPE_YEAR, 0, st.integers(1901, 2155)),
    (bl.MYSQL_TYPE_DATE, 0, st.dates().map(str)),
]


@st.composite
def _table_and_rows(draw):
    n_cols = draw(st.integers(1, 6))
    kinds = [draw(st.sampled_from(_COLUMN_KINDS)) for _ in range(n_cols)]
    nullable = [draw(st.booleans()) for _ in range(n_cols)]
    n_rows = draw(st.integers(1, 8))
    rows = []
    for _ in range(n_rows):
        row = []
        for (t, m, vs), nl in zip(kinds, nullable):
            if nl and draw(st.booleans()):
                row.append(None)
            else:
                row.append(draw(vs))
        rows.append(row)
    return kinds, nullable, rows


@settings(max_examples=60, deadline=None)
@given(_table_and_rows())
def test_binlog_segment_roundtrip(table):
    kinds, nullable, rows = table
    types = [t for t, _, _ in kinds]
    metas = [m for _, m, _ in kinds]
    w = bl.SegmentWriter(server_id=3)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    w.append(
        bl.TABLE_MAP_EVENT,
        bl.table_map_payload(7, "db", "t", types, metas, nullable),
    )
    w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(7, len(types), rows, types, metas))
    events = bl.parse_segment(w.bytes())
    out = next(e for e in events if e["kind"] == "rows")
    assert [r["after"] for r in out["rows"]] == rows


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=80), st.binary(max_size=40)),
        min_size=0,
        max_size=8,
    ),
    st.integers(0, (1 << 32) - 1),
)
def test_pgoutput_update_roundtrip(values, relation_id):
    msg = pg.encode_update(relation_id, values, values)
    m = pg.parse_message(msg)
    assert m["relation_id"] == relation_id
    assert m["old"] == values
    assert m["new"] == values


_JSON_VALUE = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-(1 << 62), 1 << 62),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=40),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=10), inner, max_size=5),
    ),
    max_leaves=20,
)


@settings(max_examples=80, deadline=None)
@given(_JSON_VALUE)
def test_jsonb_roundtrip(v):
    assert jb.jsonb_decode(jb.jsonb_encode(v)) == v


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, (1 << 60) - 1),
    st.integers(0, 10**6 - 1),
    st.booleans(),
)
def test_newdecimal_roundtrip_property(int_part, frac, neg):
    s = f"{int_part}.{frac:06d}"
    if neg and (int_part or frac):
        s = "-" + s
    b = bl.encode_newdecimal(s, 25, 6)
    out, _ = bl.decode_newdecimal(b, 0, 25, 6)
    assert out == s
