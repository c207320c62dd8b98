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

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..envelope import finish_envelope, source_col


def _staged_path(sf_dir: str, name: str) -> str:
    """Lazily stage a read-only testdata file onto tmpfs. The container
    disk stalls for minutes under other tenants' IO; the tables are tens
    of MB and immutable, so a RAM copy makes reads deterministic."""
    src = f"{sf_dir}/{name}.parquet"
    if not os.path.isdir("/dev/shm") or not src.startswith("/root/testdata/"):
        return src
    dst = f"/dev/shm/deltaforge-testdata{src[len('/root/testdata'):]}"
    if not os.path.exists(dst):
        try:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = dst + ".tmp"
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)
        except OSError:
            return src
    return dst


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, fanning out if the file is a single
    row group.

    The driver's parquet files have ONE row group each, so Spark gets a
    single scan split and every map-side operator (partial aggregation,
    hashing, JSON work) runs on one core. On a production lake there are
    thousands of splits and this is a non-issue; locally we insert one
    cheap round-robin shuffle (<= tens of MB) to spread compute across
    all cores. Filters/pruning still push to the scan — Catalyst moves
    them through Repartition."""
    try:
        # driver testdata uses TIMESTAMP(NANOS); set the read conf here so
        # library callers don't need to know (idempotent, runtime-settable)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the nanos→epoch normalization below must not depend on the
        # caller session's zone (NTZ→timestamp cast is session-tz-based)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = _staged_path(sf_dir, name)
    df = spark.read.parquet(path)
    df = _normalize_event_ts(df)
    target = spark.sparkContext.defaultParallelism
    # Estimate the scan's split count from file metadata instead of
    # df.rdd.getNumPartitions(): the RDD conversion forces plan
    # translation per read — needless work, and on a real lake it
    # defeats lazy catalog listing. Parquet can't split inside a row
    # group, so splits <= file count for single-row-group files; file
    # sizes come from a driver-side stat (local path, microseconds).
    if _estimated_splits(spark, path) < max(2, target // 2):
        df = df.repartition(target)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Pin the ``ts`` event-time column to raw epoch NANOS (long).

    Earlier driver testdata vintages wrote ``ts`` as TIMESTAMP(NANOS),
    which the ``nanosAsLong`` conf surfaces as a raw long; the current
    vintage writes TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ.
    The change-feed algebra (``ts div 1000000`` → ms) and its DuckDB
    oracles (``epoch_ns(ts)``/``epoch_ms(ts)``) are defined over the
    nanos contract, so both vintages must read identically. Session tz
    is pinned to UTC by ``read_table`` so the NTZ cast is zone-stable.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    f = next((f for f in df.schema.fields if f.name == "ts"), None)
    if f is not None and isinstance(f.dataType, (TimestampType, TimestampNTZType)):
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
        )
    return df


def _estimated_splits(spark: SparkSession, path: str) -> int:
    import glob as _glob
    import os

    files = (
        [path]
        if os.path.isfile(path)
        else _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    # driver testdata is single-row-group parquet: byte-range splits
    # beyond the first are empty, so effective parallelism = file count
    # (a conservative floor for multi-row-group files — worst case we
    # add one cheap repartition that wasn't strictly needed)
    return max(1, len(files))


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


class SnapshotProgress:
    """Per-table snapshot resume bookkeeping (reference
    crates/sources/src/mysql/mysql_snapshot.rs per-table resume: a
    restarted snapshot skips tables already completed and re-runs only
    the in-flight/remaining ones).

    A tiny JSON file of {table: "done"} — control-plane state like the
    OffsetStore; on a cluster this is a row per table in the checkpoint
    store. Parquet/JDBC reads are all-or-nothing per table here (the
    reference chunks by PK range *within* a table because its source
    reads row-by-row; Spark's partitioned reads restart a table's scan
    for free), so table granularity is the faithful resume unit.
    """

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        import json

        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def done(self, table: str) -> bool:
        return self._load().get(table) == "done"

    def mark_done(self, table: str) -> None:
        import json

        state = self._load()
        state[table] = "done"
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def pending(self, tables: list[str]) -> list[str]:
        return [t for t in tables if not self.done(t)]


def run_snapshot(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    *,
    progress: SnapshotProgress | None = None,
    sink=None,
    db: str = "testdb",
    pipeline: str = "default",
    event_id_cols: dict[str, str] | None = None,
    table_filter=None,
) -> list[str]:
    """Snapshot a table list with per-table resume: tables already
    marked done are skipped; each completed table is marked before the
    next starts, so a crash re-runs at most the in-flight table (the
    reference's resume contract, mysql_snapshot.rs:1-18). ``sink`` is
    called with each table's event DataFrame (defaults to a full
    materialization). ``table_filter`` (a ``patterns.TableFilter``)
    scopes the run the way the reference's config ``tables:``
    include/exclude does (common/patterns.rs:206-285). Returns the
    tables actually snapshotted."""
    ran: list[str] = []
    ids = event_id_cols or {}
    if table_filter is not None:
        tables = [t for t in tables if table_filter.matches(db, t)]
    todo = progress.pending(tables) if progress else list(tables)
    for t in todo:
        df = read_table(spark, sf_dir, t)
        ev = snapshot_events(
            df,
            db=db,
            table=t,
            pipeline=pipeline,
            event_id=F.col(ids[t]).cast("string") if t in ids else None,
        )
        if sink is not None:
            sink(t, ev)
        else:
            ev.write.format("noop").mode("overwrite").save()
        if progress:
            progress.mark_done(t)
        ran.append(t)
    return ran


# --------------------------------------------------- JDBC split planning


def pk_chunks(
    min_pk: int | None, max_pk: int | None, chunk_size: int
) -> list[tuple[int, int]]:
    """The reference's PK-range chunk plan, exactly (mysql_snapshot.rs
    :441-507 ``by_pk``): half-open ``[cursor, cursor+chunk)`` ranges
    from ``min_pk``, advancing by ``chunk_size`` while ``cursor <=
    max_pk``. An empty table (NULL bounds) plans zero chunks; the last
    chunk may extend past ``max_pk`` (the reference's loop does too —
    the WHERE range simply matches fewer rows)."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if min_pk is None or max_pk is None or min_pk > max_pk:
        return []
    chunks = []
    cursor = min_pk
    while cursor <= max_pk:
        chunks.append((cursor, cursor + chunk_size))
        cursor += chunk_size
    return chunks


def jdbc_chunk_predicates(
    pk_col: str, min_pk: int | None, max_pk: int | None, chunk_size: int
) -> list[str]:
    """The chunk plan as ``spark.read.jdbc(predicates=[...])`` WHERE
    clauses — one Spark partition per reference chunk, bit-identical
    boundaries (Spark's own partitionColumn/lowerBound/upperBound path
    uses equal STRIDES over the bound span, which differs from the
    reference's fixed-size chunks when the span isn't divisible)."""
    return [
        f"{pk_col} >= {lo} AND {pk_col} < {hi}"
        for lo, hi in pk_chunks(min_pk, max_pk, chunk_size)
    ]


def jdbc_snapshot_options(
    pk_col: str, min_pk: int, max_pk: int, chunk_size: int
) -> dict[str, str]:
    """The stride-based alternative: Spark-native
    partitionColumn/lowerBound/upperBound options sized so each stride
    is AT MOST ``chunk_size`` rows of PK space. upperBound is exclusive
    in spirit (Spark clamps the last stride with an unbounded ``>=``
    predicate, so coverage is total regardless); numPartitions =
    ceil(span / chunk). Prefer ``jdbc_chunk_predicates`` when chunk
    boundaries must match the reference's resume bookkeeping."""
    span = max_pk - min_pk + 1
    num = max(1, -(-span // chunk_size))
    return {
        "partitionColumn": pk_col,
        "lowerBound": str(min_pk),
        "upperBound": str(max_pk + 1),
        "numPartitions": str(num),
    }


def read_jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    pk_col: str,
    *,
    chunk_size: int = 50_000,
    properties: dict | None = None,
):
    """Chunk-parallel JDBC table read behind the same API as the
    parquet path (gated: no database in this container — the split
    PLANNING above is unit-tested; this assembles the actual reader).
    Bounds probe = the reference's ``SELECT MIN(pk), MAX(pk)`` (one
    1-row query), then one Spark partition per chunk predicate."""
    props = properties or {}
    bounds = spark.read.jdbc(
        url, f"(SELECT MIN({pk_col}) AS mn, MAX({pk_col}) AS mx FROM {table}) b",
        properties=props,
    ).first()
    preds = jdbc_chunk_predicates(
        pk_col,
        None if bounds is None else bounds["mn"],
        None if bounds is None else bounds["mx"],
        chunk_size,
    )
    if not preds:  # empty table: plain read preserves schema
        return spark.read.jdbc(url, table, properties=props)
    return spark.read.jdbc(url, table, predicates=preds, properties=props)
