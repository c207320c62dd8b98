"""Timestamp conversions between source-native epochs and Unix ms.

Re-expresses the reference's time utilities
(reference: crates/common/src/time.rs:34-120 — PostgreSQL stores
timestamps as MICROSECONDS since 2000-01-01 while Unix counts from
1970-01-01; the offset is 946,684,800,000,000 µs = 10,957 days. MySQL
binlog timestamps are SECONDS since the Unix epoch).

Each conversion ships in two forms with identical semantics:
- a Python scalar (driver-side cursor/offset bookkeeping), and
- a Spark ``Column`` expression (executor-side event streams) — pure
  integer algebra inside whole-stage codegen, never a UDF.
"""

from __future__ import annotations

import time

from pyspark.sql import Column
from pyspark.sql import functions as F

# PostgreSQL epoch (2000-01-01) offset from Unix epoch, in microseconds
# (time.rs:34).
PG_EPOCH_OFFSET_MICROS = 946_684_800_000_000


def pg_timestamp_to_unix_ms(pg_micros: int) -> int:
    """PG µs-since-2000 → Unix ms (time.rs:60-62)."""
    return (pg_micros + PG_EPOCH_OFFSET_MICROS) // 1000


def unix_ms_to_pg_timestamp(unix_ms: int) -> int:
    """Unix ms → PG µs-since-2000 (time.rs:108-110)."""
    return (unix_ms * 1000) - PG_EPOCH_OFFSET_MICROS


def ts_sec_to_ms(ts_sec: int) -> int:
    """MySQL binlog seconds → Unix ms (time.rs:85-87)."""
    return int(ts_sec) * 1000


def now_ms() -> int:
    """Current Unix ms (time.rs:115-117)."""
    return int(time.time() * 1000)


def pg_timestamp_to_unix_ms_col(pg_micros: Column) -> Column:
    """Column form; ``floor`` matches the scalar's floor-div for
    negative (pre-2000) PG timestamps. The double intermediate is
    exact below 2^53 µs ≈ year 2255."""
    return F.floor((pg_micros + F.lit(PG_EPOCH_OFFSET_MICROS)) / F.lit(1000)).cast(
        "long"
    )


def unix_ms_to_pg_timestamp_col(unix_ms: Column) -> Column:
    return (unix_ms * 1000 - F.lit(PG_EPOCH_OFFSET_MICROS)).cast("long")


def ts_sec_to_ms_col(ts_sec: Column) -> Column:
    return (ts_sec.cast("long") * 1000).cast("long")
