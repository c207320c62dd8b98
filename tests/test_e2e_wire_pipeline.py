"""The reference's whole job as ONE Structured Streaming query with
wire protocols on BOTH ends: binlog segment files stream in through the
native `binlog_segments` format (file-count offsets), decode to typed
rows, envelope, and every micro-batch delivers through the REAL Kafka
transactional protocol to a loopback broker — per-batch committed
transactions, no loss, no duplicates across a checkpointed restart.
"""

import json
import os
import socket
import struct

import pytest
from pyspark.sql import functions as F

import deltaforge_spark.sinks.kafkawire as kw
from deltaforge_spark.sinks.kafka_eos import write_kafka_eos
from deltaforge_spark.sources.datasource import BinlogSegmentsDataSource


def _write_segment(path, rows, gno, xid, table_id=42):
    import deltaforge_spark.sources.binlog as bl

    w = bl.SegmentWriter(server_id=11)
    w.append(bl.FORMAT_DESCRIPTION_EVENT, bl.fde_payload())
    w.append(bl.GTID_LOG_EVENT, bl.gtid_payload(bytes(16), gno))
    types, metas = [bl.MYSQL_TYPE_LONG, bl.MYSQL_TYPE_VARCHAR], [0, 32]
    w.append(
        bl.TABLE_MAP_EVENT,
        bl.table_map_payload(table_id, "db1", "t1", types, metas, [False, True]),
    )
    w.append(bl.WRITE_ROWS_EVENT, bl.rows_payload(table_id, 2, rows, types, metas))
    w.append(bl.XID_EVENT, bl.xid_payload(xid))
    with open(path, "wb") as f:
        f.write(w.bytes())


def _run_stream(spark, src, ckpt, broker_port):
    """One availableNow pass: stream decode → kafka-shaped projection →
    transactional wire delivery per micro-batch."""

    def deliver(batch_df, batch_id):
        shaped = batch_df.select(
            F.lit("c").alias("op"),
            (F.col("ts_sec") * 1000).alias("ts_ms"),
            F.col("after").alias("value"),
            F.struct(
                F.col("db").alias("db"), F.col("table").alias("table")
            ).alias("source"),
            F.lit("t1").alias("tenant_id"),
            F.struct(F.col("xid").cast("string").alias("id")).alias("transaction"),
            F.struct(
                F.lit("cdc.events").alias("topic"),
                F.concat_ws(":", F.col("gtid_sid"), F.col("gno").cast("string"),
                            F.col("log_pos").cast("string")).alias("key"),
                F.lit(None).cast("map<string,string>").alias("headers"),
            ).alias("routing"),
            F.col("log_pos").cast("long").alias("event_id"),
        )
        write_kafka_eos(
            shaped,
            kw.kafka_wire_producer_factory("127.0.0.1", broker_port, num_partitions=2),
            pipeline="e2e",
            sink_id="kafka",
        )

    q = (
        spark.readStream.format("binlog_segments")
        .option("path", src)
        .option("columns_json", json.dumps({"db1.t1": ["id", "name"]}))
        .load()
        .writeStream.foreachBatch(deliver)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_binlog_stream_to_kafka_wire_across_restart(spark, tmp_path):
    spark.dataSource.register(BinlogSegmentsDataSource)
    src = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    broker = kw.LoopbackKafkaBroker(validate=True)
    try:
        # phase 1: two transactions arrive and stream through
        _write_segment(f"{src}/b1.binlog", [[1, "a"], [2, "b"]], gno=1, xid=901)
        _write_segment(f"{src}/b2.binlog", [[3, "c"]], gno=2, xid=902)
        _run_stream(spark, src, ckpt, broker.port)

        committed = [r for recs in broker.committed.values() for r in recs]
        assert len(committed) == 3
        ids = sorted(json.loads(r["value"])["id"] for r in committed)
        assert ids == [1, 2, 3]
        assert all(ok for _t, ok in broker.endtxns)

        # phase 2: restart from checkpoint; only the NEW segment flows
        _write_segment(f"{src}/b3.binlog", [[4, "d"]], gno=3, xid=903)
        _run_stream(spark, src, ckpt, broker.port)

        committed = [r for recs in broker.committed.values() for r in recs]
        assert len(committed) == 4  # no re-delivery of b1/b2
        ids = sorted(json.loads(r["value"])["id"] for r in committed)
        assert ids == [1, 2, 3, 4]
        # keys are GTID-scoped EVENT ids: rows of the same ROWS event
        # share one (tx-1's two inserts ride one event), so 3 events →
        # 3 distinct keys across the 4 rows
        keys = [r["key"] for r in committed]
        assert len(set(keys)) == 3
        assert sum(1 for k in keys if b":1:" in k) == 2
    finally:
        broker.close()
