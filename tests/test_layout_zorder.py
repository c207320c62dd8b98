"""Z-order lake layout (operators/layout.py): Morton encode matches a
bit-interleave model, z-range buckets bound BOTH dimensions tighter
than a one-dimensional sort (the pruning property), and zorder_layout
partitions carry compact z-ranges."""

from pyspark.sql import functions as F

from deltaforge_spark.operators.layout import (
    morton,
    zorder_bucket_stats,
    zorder_layout,
)


def _morton_model(x: int, y: int) -> int:
    z = 0
    for i in range(31):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_bit_model(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 5, 100, 2**20, 2**31 - 1)
            for y in (0, 1, 7, 255, 2**19, 2**31 - 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", morton("x", "y").alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_model(r["x"], r["y"]), (r["x"], r["y"])
        assert r["z"] >= 0  # 62-bit: never sign-flips a BIGINT


def test_zorder_buckets_bound_both_dimensions(spark):
    # 32x32 grid: one row per cell. With shift 6, each z-bucket is a
    # 2^6-z-range = an 8x8 rectangle — bounded in BOTH x and y. A
    # 1-D x-sort bucketed the same way spans ALL of y in every bucket.
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_bucket_stats(df, "x", "y", bucket_shift=6).collect()
    assert len(stats) == 16  # 1024 cells / 64 per bucket
    for r in stats:
        assert r["n_rows"] == 64
        assert r["x_max"] - r["x_min"] == 7  # 8-wide rectangle
        assert r["y_max"] - r["y_min"] == 7
    # baseline: bucketing the x-sorted order by the same row count
    # leaves y unbounded (spans the full 0..31) — z-order's whole point
    naive_y_span = 31
    assert all(r["y_max"] - r["y_min"] < naive_y_span for r in stats)


def test_zorder_layout_partitions_are_z_compact(spark):
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_layout(df, "x", "y", n_files=8)
    assert set(out.columns) == {"x", "y"}  # helper column dropped
    parts = (
        out.withColumn("z", morton("x", "y"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("z").alias("zmin"),
            F.max("z").alias("zmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in parts) == 64 * 64
    # range partitioning on z: partition z-ranges are disjoint
    spans = sorted((r["zmin"], r["zmax"]) for r in parts if r["n"] > 0)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo
