"""Round-2 hazard fixes: quorum replay accounting, nullable tx_end
batch/stream parity, multi-column exact-dedup encoding, `changed`
path-prefix handling, RFC 9562 UUIDv7 layout, per-db DDL registry
refresh."""

import re

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.functions import uuid7
from deltaforge_spark.operators import FilterSpec, apply_filter
from deltaforge_spark.operators.dedup import exact_dedup
from deltaforge_spark.sinks import CommitPolicy, OffsetStore, SinkSpec, fan_out_batch
from deltaforge_spark.sources import snapshot_events
from deltaforge_spark.streaming import assembled_transactions_batch


@pytest.fixture()
def events(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "name"])
    return snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )


def test_quorum_counts_already_committed_sinks(events, tmp_path):
    """Replay after a partial crash: 2 of 3 sinks committed pre-crash,
    the third fails again — quorum=2 must still pass (reference
    evaluates the policy over the full sink set, coordinator.rs:1043)."""
    offsets = OffsetStore(str(tmp_path / "offsets.json"))
    offsets.commit("s1", 5)
    offsets.commit("s2", 5)
    writes = []

    def boom(df):
        raise IOError("still down")

    out = fan_out_batch(
        events,
        5,
        [
            SinkSpec("s1", lambda df: writes.append("s1")),
            SinkSpec("s2", lambda df: writes.append("s2")),
            SinkSpec("s3", boom, required=False),
        ],
        policy=CommitPolicy("quorum", quorum=2),
        offsets=offsets,
        already_committed={"s1", "s2"},
    )
    assert out == {"s1": True, "s2": True, "s3": False}
    assert writes == []  # committed sinks are not re-written
    assert offsets.committed("s1") == 5  # and not re-committed


def test_tx_batch_complete_false_when_tx_end_all_null(spark):
    """bool_or over an all-NULL group is NULL; the batch twin must
    coalesce to False to match the streaming operator's contract."""
    df = spark.createDataFrame(
        [("t1", "c", 1, None), ("t1", "u", 2, None)],
        "tx string, op string, ts_ms long, tx_end boolean",
    ).select(F.struct(F.col("tx").alias("id")).alias("transaction"), "op", "ts_ms", "tx_end")
    row = assembled_transactions_batch(df).collect()[0]
    assert row["complete"] is False


def test_exact_dedup_multicol_no_boundary_collision(spark):
    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc"), (3, "a", None), (4, "a", "")],
        "doc_id long, x string, y string",
    )
    out = exact_dedup(df, ["x", "y"], "doc_id")
    # all four contents are distinct: no cross-boundary or NULL-vs-empty merge
    assert out.count() == 4


def test_changed_accepts_explicit_after_prefix(spark):
    rows = [
        ("u", {"v": 1}, {"v": 1}),
        ("u", {"v": 1}, {"v": 2}),
    ]
    df = spark.createDataFrame(rows, "op string, before struct<v:long>, after struct<v:long>")
    spec = FilterSpec(fields=[{"field": "after.v", "op": "changed"}])
    assert apply_filter(df, spec).count() == 1


UUID7_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)


def test_uuid7_rfc9562_layout_and_ordering(spark):
    df = spark.range(50).select(
        uuid7(F.lit(1704067200000) + F.col("id")).alias("u"), "id"
    )
    rows = df.collect()
    for r in rows:
        assert UUID7_RE.match(r["u"]), r["u"]
    # time-ordered: lexical sort of the uuid matches timestamp order
    by_uuid = [r["id"] for r in sorted(rows, key=lambda r: r["u"])]
    assert by_uuid == sorted(by_uuid)


def test_ddl_refresh_uses_row_db(spark):
    from deltaforge_spark.sources.ddl import refresh_registry_on_ddl

    class Reg:
        def __init__(self):
            self.calls = []

        def register(self, db, table, schema):
            self.calls.append((db, table))

    df = spark.createDataFrame(
        [("alter table t1 add c int", "db_a", "t1"), (None, "db_b", "t2")],
        "ddl string, db string, table string",
    ).select("ddl", F.struct(F.col("db"), F.col("table")).alias("source"))
    reg = Reg()
    refreshed = refresh_registry_on_ddl(df, reg, {"t1": "schema1"})
    assert refreshed == ["t1"]
    assert reg.calls == [("db_a", "t1")]


def test_read_table_pins_events_ts_to_epoch_nanos(spark):
    """Testdata vintages have shipped events.ts as TIMESTAMP(NANOS)
    (rounds 1-2) and TIMESTAMP(MICROS) (round 3+); read_table must
    surface a raw epoch-nanos LONG either way — the contract every
    downstream `ts div 1000000` and DuckDB `epoch_ms(ts)` oracle
    assumes."""
    import duckdb

    from deltaforge_spark.sources import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in ev.select("event_id", "ts").limit(50).collect()}
    want = dict(
        duckdb.sql(
            "SELECT event_id, epoch_ns(ts) FROM '/root/testdata/sf0.001/events.parquet' "
            "WHERE event_id IN ({})".format(",".join(map(str, got)))
        ).fetchall()
    )
    assert got == want
