"""DDL event capture: schema-change rows in the change stream.

Re-expresses the reference's MySQL DDL handling (reference:
crates/sources/src/mysql/mysql_event.rs:627-720 — QueryEvent
ALTER/CREATE/DROP/TRUNCATE/RENAME becomes an ``op='r'`` event with the
``ddl`` field set, plus a targeted schema-cache reload; table-name
extraction :525-626).

In the Spark engine the stream carries the same DDL rows (``ddl``
column non-null), and the "schema-cache reload" is a registry refresh
step inside ``foreachBatch``: detect DDL rows → re-register the table
schema (version+1, fresh sequence) → stamp subsequent events.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import finish_envelope, source_col

# the statement classes the reference captures (mysql_event.rs:627-720)
DDL_RE = r"(?i)^\s*(ALTER|CREATE|DROP|TRUNCATE|RENAME)\s"

# table-name extraction patterns (reduced from mysql_event.rs:525-626)
_TABLE_PATTERNS = [
    re.compile(r"(?i)(?:ALTER|CREATE|DROP)\s+TABLE\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?[`\"]?(\w+)[`\"]?"),
    re.compile(r"(?i)TRUNCATE\s+(?:TABLE\s+)?[`\"]?(\w+)[`\"]?"),
    re.compile(r"(?i)RENAME\s+TABLE\s+[`\"]?(\w+)[`\"]?"),
]


def extract_table_name(ddl: str) -> str | None:
    for pat in _TABLE_PATTERNS:
        m = pat.search(ddl)
        if m:
            return m.group(1)
    return None


def is_ddl(statement: Column) -> Column:
    return statement.rlike(DDL_RE)


def ddl_events(
    statements: DataFrame,
    *,
    stmt_col: str = "statement",
    db: str = "testdb",
    pipeline: str = "cdc",
    ts_ms: Column | None = None,
) -> DataFrame:
    """Turn a DataFrame of DDL statements into envelope rows
    (``op='r'``, ``ddl`` set, table extracted JVM-side via regexp)."""
    stmt = F.col(stmt_col)
    table = F.coalesce(
        *[
            F.nullif(F.regexp_extract(stmt, p.pattern, 1), F.lit(""))
            for p in _TABLE_PATTERNS
        ],
        F.lit("_unknown"),
    )
    out = statements.filter(is_ddl(stmt)).select(
        F.lit("r").alias("op"),
        (ts_ms if ts_ms is not None else F.lit(0)).cast("long").alias("ts_ms"),
        F.lit(None).cast("string").alias("before"),
        F.lit(None).cast("string").alias("after"),
        F.struct(
            F.lit("ddl").alias("connector"),
            F.lit(pipeline).alias("name"),
            F.lit(db).alias("db"),
            F.lit(None).cast("string").alias("schema"),
            table.alias("table"),
            F.lit(False).alias("snapshot"),
            F.lit(None).cast("long").alias("sequence"),
        ).alias("source"),
        F.lit(None).cast("string").alias("event_id"),
        F.lit(None).cast("string").alias("tenant_id"),
        stmt.alias("ddl"),
    )
    return finish_envelope(out)


def refresh_registry_on_ddl(batch_df: DataFrame, registry, live_schemas: dict) -> list[str]:
    """foreachBatch step: for each table named by a DDL row in this
    batch, re-register its (live) schema — the reference's targeted
    schema-cache reload. Returns the refreshed table names."""
    pairs = [
        (r["db"], r["table"])
        for r in batch_df.filter(F.col("ddl").isNotNull())
        .select(F.col("source.table").alias("table"), F.col("source.db").alias("db"))
        .distinct()
        .collect()
    ]
    refreshed = []
    for db, t in pairs:
        if t in live_schemas:
            registry.register(db, t, live_schemas[t])
            refreshed.append(t)
    return refreshed
