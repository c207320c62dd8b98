"""Bucketed-table ingest: the shuffle-free fact-fact join path.

The q3/q5-style lineitem⋈orders join shuffles BOTH fact tables on
orderkey every run. At 100 TB that shuffle is the dominant cost, and it
repeats for every query joining on the same key. The classic fix is to
pay the shuffle ONCE at ingest: write both tables bucketed (hash-
partitioned into N files) and sorted by the join key. Spark's scan then
reports the bucketing as its output partitioning, and the sort-merge
join needs no Exchange on either side — verified by plan assertion in
tests/test_bucketed_join.py.

Reference parity note: the reference is a streaming CDC engine and has
no analog — this is the Spark-native mechanism for the co-located-join
requirement its ClickHouse sink documentation assumes the OLAP store
provides (reference crates/sinks/src/clickhouse: ORDER BY key =
MergeTree's co-location). Here the lake itself provides it.

Scale shape: bucket count should be sized so one bucket of the LARGER
table fits an executor core's working memory at target scale (100 TB /
N buckets ≈ 128-512 MB compressed → N in the tens of thousands; local
tests use 8). Both tables MUST use the same N and key for the
exchange-free join; a mismatch silently falls back to shuffle — the
plan test exists precisely to catch that regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed+sorted managed table (parquet).

    ``sortBy(key)`` additionally makes the merge phase of a sort-merge
    join read-ordered, eliminating the per-task Sort as well on Spark
    versions that propagate scan ordering.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    *,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    buckets: int,
) -> tuple[DataFrame, DataFrame]:
    """Ingest two fact tables bucketed on their join keys and return the
    bucketed readers. One shuffle each at write time; every subsequent
    join on the key is exchange-free."""
    write_bucketed(left, left_table, key=left_key, buckets=buckets)
    write_bucketed(right, right_table, key=right_key, buckets=buckets)
    return spark.table(left_table), spark.table(right_table)
