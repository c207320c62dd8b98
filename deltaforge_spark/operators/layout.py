"""Z-order (Morton) lake layout — multi-dimensional data clustering
for scan pruning at 100 TB.

Hive partitioning (sinks/rolling.py, lake writer) prunes on ONE
dimension; queries that filter on a second dimension (user AND time,
tenant AND key range) still scan every file of the matched partitions.
Z-ordering interleaves the bits of two sort keys so that files written
in z-value ranges carry TIGHT min/max bounds on BOTH dimensions —
parquet row-group statistics then prune scans on either predicate.
(The same layout trick Delta/Iceberg OPTIMIZE ZORDER applies; computed
here as exact integer column algebra, no engine extension needed.)

Scale shape: the z-value is pure per-row bit math (5 shift/mask steps
per dimension, JVM-side, codegen-friendly); clustering is ONE
`repartitionByRange` on the z-value (Spark's range partitioner samples
— no global sort materializes) followed by an intra-partition
sortWithinPartitions, the standard write-layout idiom. Bucket
statistics for pruning audits are a map-only prefix extraction
(z >> k) + one counts-only groupBy.

Determinism: inputs clamp to 31 bits per dimension, so the interleave
fits 62 bits — always a non-negative BIGINT in any engine; every step
is the same <<|& expression string evaluated by Spark and the SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# bit-spreading magic numbers (Morton encode, 32->64 interleave)
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_sql(expr: str) -> str:
    """SQL for spreading a 31-bit value's bits to even positions —
    identical text runs on Spark (F.expr) and DuckDB."""
    s = f"(CAST({expr} AS BIGINT) & 2147483647)"
    for shift, mask in _SPREAD_STEPS:
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def morton_sql(x_expr: str, y_expr: str) -> str:
    """z = interleave(x, y): x takes even bits, y odd bits."""
    return f"({_spread_sql(x_expr)} | ({_spread_sql(y_expr)} << 1))"


def morton(x: str, y: str) -> Column:
    return F.expr(morton_sql(x, y))


def zorder_layout(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    *,
    n_files: int = 200,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-value of
    (x, y) into ``n_files`` write tasks, z-sorted within each — every
    output file then spans a compact z-range, i.e. a bounded rectangle
    in (x, y), and parquet min/max statistics prune on either column."""
    z = morton(x_expr, y_expr).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_bucket_stats(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    *,
    bucket_shift: int = 34,
) -> DataFrame:
    """Pruning audit: bucket rows by the z-value's high bits
    (``z >> bucket_shift`` — map-only prefix extraction, no sort, no
    window; pick the shift so the USED key range spans a handful of
    buckets) and report each bucket's row count and min/max bounds on BOTH
    dimensions. Tight per-bucket bounds on x AND y are exactly the
    property that makes row-group statistics prune two-dimensional
    predicates."""
    z = F.expr(f"{morton_sql(x_expr, y_expr)} >> {bucket_shift}")
    return (
        df.select(
            z.alias("z_bucket"),
            F.expr(x_expr).cast("long").alias("_x"),
            F.expr(y_expr).cast("long").alias("_y"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
    )


def zorder_bucket_stats_oracle_sql(
    table_expr: str,
    x_expr: str,
    y_expr: str,
    *,
    bucket_shift: int = 34,
) -> str:
    z = morton_sql(x_expr, y_expr)
    return f"""
        SELECT {z} >> {bucket_shift} AS z_bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(CAST({x_expr} AS BIGINT)) AS BIGINT) AS x_min,
               CAST(max(CAST({x_expr} AS BIGINT)) AS BIGINT) AS x_max,
               CAST(min(CAST({y_expr} AS BIGINT)) AS BIGINT) AS y_min,
               CAST(max(CAST({y_expr} AS BIGINT)) AS BIGINT) AS y_max
        FROM {table_expr}
        GROUP BY 1
    """
