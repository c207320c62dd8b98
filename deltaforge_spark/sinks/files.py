"""Lake sink: Hive-partitioned Parquet/JSONL writes.

Re-expresses the reference's S3 sink (reference: crates/sinks/src/s3/ —
router.rs:19-69 partition routing ``table=X/year=Y/month=M/day=D``,
rolling.rs:17-69 file rolling, parquet_writer.rs / jsonl_writer.rs).

In Spark nearly all of it is native:
- partition routing  → ``partitionBy("table","year","month","day")``
- atomic visibility  → task-commit protocol (no half-written files)
- size-based rolling → ``maxRecordsPerFile``
- ULID-ish names     → part-file UUIDs
Age/idle rolling (long-running streams, low-volume partitions) lives in
the sibling ``rolling.py`` writer pool — rolling.rs:17-69 semantics. At
scale, partition count × small-file pressure is the real concern:
callers should coalesce/repartition by the partition cols so each task
writes few, large files (AQE coalescing handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_partition_cols(df: DataFrame, ts_col: str = "ts_ms") -> DataFrame:
    """Derive the lake partition columns from the event timestamp
    (reference router.rs:19-69)."""
    ts = F.timestamp_millis(F.col(ts_col))
    return (
        df.withColumn("table", F.col("source.table"))
        .withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
    )


def write_lake(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
    mode: str = "append",
) -> None:
    """Write change events to the lake with hive partitioning.

    ``max_records_per_file`` mirrors the reference's 1M-event roll
    (rolling.rs:24-33); Spark also rolls on its own block size.
    """
    out = with_partition_cols(df)
    # one shuffle keyed by partition cols => each task owns whole
    # partitions and writes few large files instead of many tiny ones
    out = out.repartition("table", "year", "month", "day")
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("table", "year", "month", "day")
    )
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt in ("json", "jsonl"):
        writer.json(path)
    else:
        raise ValueError(f"unsupported lake format {fmt!r}")
