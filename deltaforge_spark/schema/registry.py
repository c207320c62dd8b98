"""Durable schema registry: versioned, fingerprinted table schemas with
a global monotonic sequence for replay correlation.

Re-expresses the reference's registry (reference:
docs/src/architecture.md:111-173; crates/schema-registry/src/lib.rs —
SHA-256 fingerprints, monotonic sequence, storage-Log persistence).

Spark shape: a parquet-backed table of
``(tenant, db, table, fingerprint, version, sequence, schema_json, ts)``
— append-only; current schema = max(version) per (tenant, db, table).
On a cluster this would be a Delta table with a MERGE upsert; the
parquet append + read-side max keeps the same contract without the
Delta dependency.
"""

from __future__ import annotations

import hashlib
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("tenant", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("schema_json", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def fingerprint_schema(schema: T.StructType) -> str:
    """SHA-256 structural fingerprint (name:type pairs, order-insensitive)
    — reference fingerprint.rs:23-107 semantics."""
    canon = sorted((f.name, f.dataType.simpleString()) for f in schema.fields)
    return hashlib.sha256(json.dumps(canon).encode()).hexdigest()


class SchemaRegistry:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        try:
            return self.spark.read.schema(REGISTRY_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], REGISTRY_SCHEMA)

    def current(self, db: str, table: str, tenant: str = "") -> dict | None:
        rows = (
            self._read()
            .filter((F.col("db") == db) & (F.col("table") == table) & (F.col("tenant") == tenant))
            .orderBy(F.col("version").desc())
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def register(self, db: str, table: str, schema: T.StructType, tenant: str = "") -> dict:
        """Idempotent: same fingerprint → current entry unchanged;
        changed fingerprint → version+1 and a fresh global sequence."""
        fp = fingerprint_schema(schema)
        cur = self.current(db, table, tenant)
        if cur and cur["fingerprint"] == fp:
            return cur
        reg = self._read()
        max_seq = reg.agg(F.max("sequence")).collect()[0][0] or 0
        entry = {
            "tenant": tenant,
            "db": db,
            "table": table,
            "fingerprint": fp,
            "version": (cur["version"] + 1) if cur else 1,
            "sequence": max_seq + 1,
            "schema_json": schema.json(),
            "ts_ms": int(time.time() * 1000),
        }
        self.spark.createDataFrame([entry], REGISTRY_SCHEMA).write.mode("append").parquet(self.path)
        return entry

    def list_tables(self, tenant: str = "") -> list[dict]:
        """Current entry per (db, table) — GET /pipelines/{p}/schemas
        (reference rest-api/schemas.rs list_schemas)."""
        from pyspark.sql import Window

        w = Window.partitionBy("db", "table").orderBy(F.col("version").desc())
        rows = (
            self._read()
            .filter(F.col("tenant") == tenant)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk", "schema_json")
            .orderBy("db", "table")
            .collect()
        )
        return [r.asDict() for r in rows]

    def versions(self, db: str, table: str, tenant: str = "") -> list[dict]:
        """Full version history for one table — GET
        .../schemas/{db}/{table}/versions (schemas.rs get_schema_versions)."""
        rows = (
            self._read()
            .filter((F.col("db") == db) & (F.col("table") == table) & (F.col("tenant") == tenant))
            .orderBy("version")
            .collect()
        )
        return [r.asDict() for r in rows]

    def stamp(self, df: DataFrame, db: str, table: str, tenant: str = "") -> DataFrame:
        """Stamp schema_version/schema_sequence onto an event DataFrame
        (reference coordinator.rs:142-361 sensing enrich step)."""
        cur = self.current(db, table, tenant)
        if cur is None:
            return df
        return df.withColumn("schema_version", F.lit(cur["fingerprint"])).withColumn(
            "schema_sequence", F.lit(cur["sequence"]).cast("long")
        )
