"""Snapshot source: a consistent full read of a table emitted as
``op='r'`` change events.

Models the reference's parallel consistent snapshot
(reference: crates/sources/src/mysql/mysql_snapshot.rs:1-18, 156-330 —
integer-PK range chunking, parallel workers, per-table resume). In Spark
the chunked-parallel-scan machinery is the data source itself:
``spark.read.parquet`` splits by file/rowgroup and
``spark.read.jdbc(partitionColumn=pk, numPartitions=N)`` does PK-range
chunking natively, so the operator reduces to a declarative projection —
Catalyst keeps column pruning / predicate pushdown through it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..envelope import finish_envelope, source_col


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def snapshot_events(
    df: DataFrame,
    *,
    db: str = "testdb",
    table: str,
    pipeline: str = "default",
    connector: str = "parquet",
    event_id: Column | None = None,
    ts_ms: Column | None = None,
    tenant_id: str | None = None,
) -> DataFrame:
    """Wrap a table DataFrame into snapshot (`op='r'`) change events.

    ``event_id`` / ``ts_ms`` default to deterministic derivations so the
    duckdb oracle can reproduce them; production would use uuid7 / now().
    ``after`` is the typed row struct; ``before`` is a typed null struct
    (same shape) so downstream operators see a stable schema.
    """
    row = F.struct(*[F.col(c) for c in df.columns])
    eid = event_id if event_id is not None else F.lit(None).cast("string")
    ts = ts_ms if ts_ms is not None else F.lit(0).cast("long")
    out = df.select(
        F.lit("r").alias("op"),
        ts.cast("long").alias("ts_ms"),
        F.lit(None).cast(row_type_of(df)).alias("before"),
        row.alias("after"),
        source_col(connector, pipeline, db, table, snapshot=True).alias("source"),
        eid.cast("string").alias("event_id"),
        F.lit(tenant_id).cast("string").alias("tenant_id"),
    )
    return finish_envelope(out)


def row_type_of(df: DataFrame):
    """The struct type of a full row of ``df``."""
    from pyspark.sql import types as T

    return T.StructType([T.StructField(f.name, f.dataType, True) for f in df.schema.fields])
