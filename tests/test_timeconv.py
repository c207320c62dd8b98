"""Epoch conversions: scalar/Column parity with the reference's
documented values (time.rs doctests) and round-trips.
"""

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.functions.timeconv import (
    PG_EPOCH_OFFSET_MICROS,
    pg_timestamp_to_unix_ms,
    pg_timestamp_to_unix_ms_col,
    ts_sec_to_ms,
    ts_sec_to_ms_col,
    unix_ms_to_pg_timestamp,
    unix_ms_to_pg_timestamp_col,
)


def test_reference_doctest_values():
    # PG epoch (2000-01-01) → Unix ms
    assert pg_timestamp_to_unix_ms(0) == 946_684_800_000
    assert pg_timestamp_to_unix_ms(1_000_000) == 946_684_801_000
    # MySQL binlog seconds → ms
    assert ts_sec_to_ms(1) == 1000
    assert ts_sec_to_ms(1_704_067_200) == 1_704_067_200_000
    assert PG_EPOCH_OFFSET_MICROS == 946_684_800_000_000


def test_pg_roundtrip_including_pre_2000():
    for ms in [0, 946_684_800_000, 1_704_067_200_123, -1000, 123_456_789]:
        assert pg_timestamp_to_unix_ms(unix_ms_to_pg_timestamp(ms)) == ms


@pytest.mark.spark
def test_column_forms_agree_with_scalars(spark):
    micros = [0, 1_000_000, -1_500_000, 757_382_400_123_456, -946_684_800_000_000]
    ms_vals = [0, 946_684_800_000, 1_704_067_200_123, -1000]
    secs = [0, 1, 1_704_067_200]
    df = spark.createDataFrame(
        [(m,) for m in micros], "pg_micros long"
    ).select(
        "pg_micros",
        pg_timestamp_to_unix_ms_col(F.col("pg_micros")).alias("ms"),
    )
    for row in df.collect():
        assert row["ms"] == pg_timestamp_to_unix_ms(row["pg_micros"])

    df2 = spark.createDataFrame([(m,) for m in ms_vals], "ms long").select(
        "ms", unix_ms_to_pg_timestamp_col(F.col("ms")).alias("pg")
    )
    for row in df2.collect():
        assert row["pg"] == unix_ms_to_pg_timestamp(row["ms"])

    df3 = spark.createDataFrame([(s,) for s in secs], "s long").select(
        "s", ts_sec_to_ms_col(F.col("s")).alias("ms")
    )
    for row in df3.collect():
        assert row["ms"] == ts_sec_to_ms(row["s"])
