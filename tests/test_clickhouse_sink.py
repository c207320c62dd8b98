"""ClickHouse sink: DDL generation (mirrors reference ddl.rs tests),
LSN version derivation (version.rs tests), writer round-trip with
dedup-token replay semantics."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from deltaforge_spark.sinks.clickhouse import (
    clickhouse_rows,
    create_table_ddl,
    file_ch_transport_factory,
    lsn_to_u64,
    map_spark_type,
    read_ch_rows,
    write_clickhouse,
)


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("email", T.StringType(), True),
        ]
    )


def test_upsert_uses_replacingmergetree_and_pk_order():
    sql = create_table_ddl("analytics", "orders", _schema(), ["id"], "upsert")
    assert "CREATE TABLE IF NOT EXISTS `analytics`.`orders`" in sql
    assert "`id` Int64" in sql
    assert "`email` Nullable(String)" in sql
    assert "`_version` UInt64" in sql
    assert "ENGINE = ReplacingMergeTree(_version, _deleted)" in sql
    assert "ORDER BY (`id`)" in sql, sql


def test_changelog_uses_mergetree_and_appends_version_to_order():
    sql = create_table_ddl("d", "t", _schema(), ["id"], "changelog")
    assert "ENGINE = MergeTree" in sql
    assert "ORDER BY (`id`, `_version`)" in sql, sql


def test_empty_pk_orders_by_tuple():
    sql = create_table_ddl("d", "t", _schema(), [], "upsert")
    assert "ORDER BY tuple()" in sql, sql


def test_type_mapping_matrix():
    # types.rs:34-60 over normalized Spark types
    assert map_spark_type(T.BooleanType()) == "UInt8"
    assert map_spark_type(T.ShortType()) == "Int16"
    assert map_spark_type(T.IntegerType()) == "Int32"
    assert map_spark_type(T.LongType()) == "Int64"
    assert map_spark_type(T.DoubleType()) == "Float64"
    assert map_spark_type(T.DecimalType(10, 2)) == "Decimal(10, 2)"
    assert map_spark_type(T.TimestampType()) == "DateTime64(3)"
    assert map_spark_type(T.StringType()) == "String"
    assert map_spark_type(T.ArrayType(T.LongType())) == "String"


def test_lsn_parses_to_monotonic_u64(spark):
    df = spark.createDataFrame(
        [("16/B374D848",), ("16/B374D849",), ("17/0",), ("not-an-lsn",), ("16",)],
        ["lsn"],
    ).select(lsn_to_u64(F.col("lsn")).alias("v"))
    vals = [r["v"] for r in df.collect()]
    assert vals[0] == (0x16 << 32) | 0xB374D848
    assert vals[1] > vals[0]
    assert vals[2] > vals[1]
    assert vals[3] is None and vals[4] is None  # fall back to ts_ms upstream


@pytest.fixture()
def feed(spark):
    rows = [
        # (op, ts_ms, before(id,email), after(id,email))
        ("c", 1000, None, (1, "a@x")),
        ("u", 2000, (1, "a@x"), (1, "a2@x")),
        ("c", 1500, None, (2, "b@x")),
        ("d", 3000, (2, "b@x"), None),
        ("c", 2500, None, (3, "c@x")),
    ]
    schema = (
        "op string, ts_ms long, before struct<id:long,email:string>, "
        "after struct<id:long,email:string>"
    )
    return spark.createDataFrame(rows, schema)


def test_writer_roundtrip_matches_upsert_state(feed, tmp_path):
    state = str(tmp_path / "ch")
    proj = clickhouse_rows(feed, ["id", "email"])
    ddl = write_clickhouse(
        proj,
        file_ch_transport_factory(state),
        database="analytics",
        table="users",
        mode="upsert",
        pk=["id"],
        batch_id=1,
    )
    assert "ReplacingMergeTree" in ddl
    with open(f"{state}/ddl.sql") as f:
        assert f.read().strip().rstrip(";") == ddl

    rows = read_ch_rows(state)
    assert len(rows) == 5  # changelog keeps every change

    # ReplacingMergeTree(_version, _deleted) final state: max _version per
    # pk wins, _deleted winners drop (what the server computes at merge)
    latest = {}
    for r in rows:
        k = r["id"]
        if k not in latest or r["_version"] > latest[k]["_version"]:
            latest[k] = r
    merged = {k: v["email"] for k, v in latest.items() if not v["_deleted"]}
    assert merged == {1: "a2@x", 3: "c@x"}  # id=2 deleted, id=1 updated


def test_insert_dedup_token_makes_replay_noop(feed, tmp_path):
    state = str(tmp_path / "ch")
    proj = clickhouse_rows(feed, ["id", "email"])
    factory = file_ch_transport_factory(state)
    kw = dict(database="d", table="t", mode="changelog", pk=["id"])
    write_clickhouse(proj, factory, batch_id=7, **kw)
    n1 = len(read_ch_rows(state))
    # micro-batch replay: same batch_id → identical tokens → no-op
    write_clickhouse(proj, factory, batch_id=7, **kw)
    assert len(read_ch_rows(state)) == n1
    # a genuinely new batch inserts
    write_clickhouse(proj, factory, batch_id=8, **kw)
    assert len(read_ch_rows(state)) == 2 * n1


def test_delete_takes_before_image(feed):
    proj = clickhouse_rows(feed, ["id", "email"])
    d = proj.filter(F.col("_op") == "d").collect()[0]
    assert d["id"] == 2 and d["email"] == "b@x"
    assert d["_deleted"] == 1


def test_projects_batch_isolates_bad_row_and_auto_creates(spark, tmp_path):
    """Reference sink.rs:124-173 / project.rs: one unprojectable row
    lands in the DLQ frame; the clean rows still insert, with auto-DDL
    issued once."""
    from deltaforge_spark.sinks.clickhouse import clickhouse_rows_with_dlq

    rows = [
        ("c", 1, {"id": 1, "v": "a"}, None),
        ("u", 2, {"id": None, "v": "b"}, {"id": None, "v": "old"}),  # no usable pk
        ("d", 3, None, {"id": 3, "v": "c"}),
    ]
    df = spark.createDataFrame(
        rows,
        "op string, ts_ms long, after struct<id:long,v:string>, "
        "before struct<id:long,v:string>",
    ).withColumn("event_id", F.col("ts_ms").cast("string"))
    ok, failed = clickhouse_rows_with_dlq(df, ["id", "v"], required=["id"])
    assert {r.id for r in ok.collect()} == {1, 3}
    bad = failed.collect()
    assert len(bad) == 1
    assert bad[0].event_id == "2" and bad[0].missing_columns == "id"
    assert bad[0].error_kind == "serialization"

    state = str(tmp_path / "ch")
    ddl = write_clickhouse(
        ok,
        file_ch_transport_factory(state),
        database="d",
        table="t",
        mode="upsert",
        pk=["id"],
        batch_id=7,
    )
    assert ddl and "ReplacingMergeTree" in ddl
    inserted = read_ch_rows(state)
    assert {r["id"] for r in inserted} == {1, 3}
