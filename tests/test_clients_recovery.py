"""Client sinks (partition-local, injectable transport) + restart
recovery (offset validity, schema reconciliation)."""

import json

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest
from pyspark.sql import Row

from deltaforge_spark.operators import envelope_native, with_routing
from deltaforge_spark.sinks.clients import (
    read_spool,
    spool_sink_factory,
    write_client_sink,
)
from deltaforge_spark.sources import snapshot_events
from deltaforge_spark.sources.recovery import (
    CheckpointUnreachable,
    check_resume_offset,
    reconcile_schema_on_restart,
)
from deltaforge_spark.schema import SchemaRegistry


def _events(spark):
    base = spark.createDataFrame([(i, f"n{i}") for i in range(10)], ["id", "name"])
    ev = snapshot_events(
        base, table="t1", event_id=F.col("id").cast("string"), ts_ms=F.lit(1704067200000)
    )
    return with_routing(
        envelope_native(ev), topic_template="s-${after.id}", key_template="${after.id}"
    )


def test_client_sink_routing_and_fields(spark, tmp_path):
    spool = str(tmp_path / "spool")
    write_client_sink(
        _events(spark), spool_sink_factory(spool), default_dest="fallback", batch_size=3
    )
    got = read_spool(spool)
    assert len(got) == 10
    by_key = {g["df-key"]: g for g in got}
    assert by_key["7"]["dest"] == "s-7"
    assert by_key["7"]["idempotency_key"].endswith("|7")  # {tenant}|{db.table}|{tx}|{event}
    assert "testdb.t1" in by_key["7"]["idempotency_key"]
    payload = json.loads(by_key["7"]["payload"])
    assert payload["after"]["id"] == 7 and payload["op"] == "r"


def test_client_sink_default_dest(spark, tmp_path):
    ev = envelope_native(
        snapshot_events(
            spark.createDataFrame([(1, "a")], ["id", "name"]),
            table="t1",
            event_id=F.col("id").cast("string"),
        )
    )  # no routing set -> default destination
    spool = str(tmp_path / "spool2")
    write_client_sink(ev, spool_sink_factory(spool), default_dest="the-default")
    got = read_spool(spool)
    assert got and all(g["dest"] == "the-default" for g in got)


def test_offset_validity_policies():
    ok = check_resume_offset(100, 50)
    assert (ok.offset, ok.replayed) == (100, False)
    with pytest.raises(CheckpointUnreachable, match="purged"):
        check_resume_offset(10, 50, policy="halt")
    adapted = check_resume_offset(10, 50, policy="adapt")
    assert (adapted.offset, adapted.replayed) == (50, True)


def test_schema_reconcile_on_restart(spark, tmp_path):
    reg = SchemaRegistry(spark, str(tmp_path / "reg"))
    declared = T.StructType([T.StructField("id", T.LongType()), T.StructField("name", T.StringType())])
    reg.register("db1", "t1", declared)

    same = spark.createDataFrame([Row(after=Row(id=1, name="x"))])
    assert reconcile_schema_on_restart(reg, same, "db1", "t1").count() == 0

    drifted = spark.createDataFrame([Row(after=Row(id=1, name="x", extra=2))])
    with pytest.raises(CheckpointUnreachable, match="drift"):
        reconcile_schema_on_restart(reg, drifted, "db1", "t1", policy="halt")
    report = reconcile_schema_on_restart(reg, drifted, "db1", "t1", policy="adapt")
    assert {r["issue"] for r in report.collect()} == {"undeclared_column"}
    assert reg.current("db1", "t1")["version"] == 2  # adapt registered v2
