"""Deterministic change-feed: turn the driver's ``events`` table into a
stream of c/u/d change events with before/after images and transaction
boundaries.

Stands in for the binlog/WAL decoders (reference:
crates/sources/src/mysql/mysql_event.rs:74-428,
crates/sources/src/postgres/postgres_event.rs:83-732) — native log
tailing is out of scope for a Spark engine (SURVEY.md §7.2); production
fronts Spark with a Kafka/Debezium topic, and tests/oracles use this
synthetic feed. The mapping is pure column algebra so DuckDB can
reproduce it exactly:

    event_type 'signup'            -> op 'c'  (insert: before = null)
    'purchase' | 'click' | 'view'  -> op 'u'  (update: before.value = value - 1)
    'error'                        -> op 'd'  (delete: after = null)

Transactions: 10 consecutive events per user form one transaction
(``tx_id = '<user_id>:<event_id/10>'``); ``tx_end`` marks the last event
of each transaction in the feed (reference tx_end: lib.rs:437-438).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..envelope import finish_envelope, source_col
from .snapshot import read_table, row_type_of


def change_feed(
    spark: SparkSession,
    sf_dir: str,
    *,
    db: str = "testdb",
    table: str = "events",
    pipeline: str = "cdc",
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")

    op = (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    row = F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    prev_row = F.struct(
        F.col("event_id"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        (F.col("value") - F.lit(1.0)).alias("value"),
        F.col("props"),
    )
    null_row = F.lit(None).cast(row_type_of(ev))
    tx_seq = F.floor(F.col("event_id") / F.lit(10)).cast("long")
    tx_id = F.concat_ws(":", F.col("user_id").cast("string"), tx_seq.cast("string"))
    w = Window.partitionBy(tx_seq, F.col("user_id")).orderBy(F.col("event_id"))
    # repartition on the WINDOW keys, not round-robin: read_table's
    # fan-out exchange would otherwise be immediately followed by the
    # window's hash exchange — same row count shuffled twice. Keying
    # the fan-out satisfies the window's required distribution, so the
    # plan carries exactly ONE exchange (pinned in test_plan_shape).
    # explicit partition count: AQE would coalesce this exchange for
    # its pre-serialization byte size, starving the downstream to_json
    # CPU work of cores (measured 0.91s vs 0.71s at sf0.1) — the same
    # row-inflating-operator rule as cdc_pipeline_xl's repartition
    ev = ev.repartition(
        spark.sparkContext.defaultParallelism, tx_seq, F.col("user_id")
    )

    out = ev.select(
        op.alias("op"),
        # ts arrives as raw nanos (nanosAsLong parquet read) → integer-divide
        F.expr("ts div 1000000").alias("ts_ms"),
        F.when(op != "c", prev_row).otherwise(null_row).alias("before"),
        F.when(op != "d", row).otherwise(null_row).alias("after"),
        source_col("changefeed", pipeline, db, table, sequence=F.col("event_id")).alias("source"),
        F.col("event_id").cast("string").alias("event_id"),
        F.lit(None).cast("string").alias("tenant_id"),
        F.struct(
            tx_id.alias("id"),
            F.row_number().over(w).cast("long").alias("total_order"),
            F.row_number().over(w).cast("long").alias("data_collection_order"),
        ).alias("transaction"),
        (F.row_number().over(w) == F.count("*").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))).alias("tx_end"),
    )
    return finish_envelope(out)
