"""JDBC catalog bootstrap — the schema-loader front of the MySQL/PG
sources (reference mysql_schema_loader.rs:1-751,
postgres_schema_loader.rs:1-683): expand ``db.*`` / ``db.prefix%``
table patterns against INFORMATION_SCHEMA, fetch per-table column and
primary-key metadata, map native column types to Spark types, and
register the result in the ``SchemaRegistry``.

No live DB is required to exercise any of it: every catalog query is
BUILT here and executed through an injectable ``execute(sql) ->
list[dict]`` seam — ``jdbc_execute`` wires it to ``spark.read.jdbc``
in production; tests feed a recorded catalog dump (the same
fixture-seam pattern as ``jdbc_chunk_predicates`` in
sources/snapshot.py). The SQL text mirrors the reference loaders
verbatim-in-spirit: same INFORMATION_SCHEMA columns, same system-schema
exclusions, same LIKE-vs-equality pattern rules per dialect
(mysql_schema_loader.rs:560-599, postgres_schema_loader.rs:526-568).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import types as T

MYSQL_SYSTEM_SCHEMAS = ("mysql", "information_schema", "performance_schema", "sys")
PG_SYSTEM_SCHEMAS = ("pg_catalog", "information_schema", "pg_toast")


# ------------------------------------------------------------ patterns


def parse_pattern(pattern: str, dialect: str) -> tuple[str, str]:
    """``db.table`` → (db, table); a bare name matches any MySQL
    database (mysql_schema_loader.rs:560-567) but defaults to the
    ``public`` schema on PG (postgres_schema_loader.rs:526-531)."""
    if "." in pattern:
        db, table = pattern.split(".", 1)
        return db, table
    return ("%" if dialect == "mysql" else "public"), pattern


def _glob_to_like(s: str) -> str:
    # PG rule: '*' is the only wildcard; literal % and _ are escaped
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_").replace("*", "%")


def _esc(s: str) -> str:
    return s.replace("'", "''")


def build_pattern_query(pattern: str, dialect: str) -> str:
    """The table-expansion query for one pattern. Dialect rules match
    the reference exactly: MySQL treats ``%``/``_`` as LIKE triggers;
    PG treats only ``*`` as a glob (a literal underscore in a table
    name must NOT become a wildcard)."""
    db_pat, tb_pat = parse_pattern(pattern, dialect)
    if dialect == "mysql":
        if db_pat in ("*", "%"):
            db_clause = "TABLE_SCHEMA NOT IN " + repr(MYSQL_SYSTEM_SCHEMAS)
        elif "%" in db_pat or "_" in db_pat:
            db_clause = f"TABLE_SCHEMA LIKE '{_esc(db_pat)}'"
        else:
            db_clause = f"TABLE_SCHEMA = '{_esc(db_pat)}'"
        if tb_pat in ("*", "%"):
            tb_clause = "1=1"
        elif "%" in tb_pat or "_" in tb_pat:
            tb_clause = f"TABLE_NAME LIKE '{_esc(tb_pat)}'"
        else:
            tb_clause = f"TABLE_NAME = '{_esc(tb_pat)}'"
        return (
            "SELECT TABLE_SCHEMA, TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
            f"WHERE TABLE_TYPE = 'BASE TABLE' AND {db_clause} AND {tb_clause}"
        )
    if dialect == "postgres":
        if db_pat in ("*", "%"):
            db_clause = "table_schema NOT IN " + repr(PG_SYSTEM_SCHEMAS)
        elif "*" in db_pat:
            db_clause = f"table_schema LIKE '{_esc(_glob_to_like(db_pat))}'"
        else:
            db_clause = f"table_schema = '{_esc(db_pat)}'"
        if tb_pat in ("*", "%"):
            tb_clause = "1=1"
        elif "*" in tb_pat:
            tb_clause = f"table_name LIKE '{_esc(_glob_to_like(tb_pat))}'"
        else:
            tb_clause = f"table_name = '{_esc(tb_pat)}'"
        return (
            "SELECT table_schema AS \"TABLE_SCHEMA\", table_name AS \"TABLE_NAME\" "
            "FROM information_schema.tables "
            f"WHERE table_type = 'BASE TABLE' AND {db_clause} AND {tb_clause}"
        )
    raise ValueError(f"dialect must be mysql|postgres, got {dialect!r}")


def columns_query(db: str, table: str, dialect: str) -> str:
    """Per-table column metadata (the reference's fetch_schema column
    query: mysql_schema_loader.rs:397-414 / postgres :326-336)."""
    if dialect == "mysql":
        return (
            "SELECT COLUMN_NAME, COLUMN_TYPE, DATA_TYPE, IS_NULLABLE, "
            "ORDINAL_POSITION, CHARACTER_MAXIMUM_LENGTH, NUMERIC_PRECISION, "
            "NUMERIC_SCALE FROM INFORMATION_SCHEMA.COLUMNS "
            f"WHERE TABLE_SCHEMA = '{_esc(db)}' AND TABLE_NAME = '{_esc(table)}' "
            "ORDER BY ORDINAL_POSITION"
        )
    return (
        "SELECT column_name AS \"COLUMN_NAME\", data_type AS \"DATA_TYPE\", "
        "udt_name AS \"UDT_NAME\", is_nullable AS \"IS_NULLABLE\", "
        "ordinal_position AS \"ORDINAL_POSITION\", "
        "character_maximum_length AS \"CHARACTER_MAXIMUM_LENGTH\", "
        "numeric_precision AS \"NUMERIC_PRECISION\", numeric_scale AS \"NUMERIC_SCALE\" "
        "FROM information_schema.columns "
        f"WHERE table_schema = '{_esc(db)}' AND table_name = '{_esc(table)}' "
        "ORDER BY ordinal_position"
    )


def primary_key_query(db: str, table: str, dialect: str) -> str:
    """PK columns in key order (mysql_schema_loader.rs:458-466;
    postgres_schema_loader.rs:356-361 uses pg_index, but the form here
    keeps to information_schema so one JDBC seam serves both engines)."""
    if dialect == "mysql":
        return (
            "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE "
            f"WHERE TABLE_SCHEMA = '{_esc(db)}' AND TABLE_NAME = '{_esc(table)}' "
            "AND CONSTRAINT_NAME = 'PRIMARY' ORDER BY ORDINAL_POSITION"
        )
    return (
        "SELECT kcu.column_name AS \"COLUMN_NAME\" "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON tc.constraint_name = kcu.constraint_name "
        "AND tc.table_schema = kcu.table_schema "
        f"WHERE tc.table_schema = '{_esc(db)}' AND tc.table_name = '{_esc(table)}' "
        "AND tc.constraint_type = 'PRIMARY KEY' ORDER BY kcu.ordinal_position"
    )


# ---------------------------------------------------------- type rules


def to_spark_type(
    data_type: str,
    *,
    column_type: str = "",
    precision: int | None = None,
    scale: int | None = None,
    dialect: str = "mysql",
) -> T.DataType:
    """Native column type → Spark type, following the repo's existing
    decode rules (functions/typerules.py: unsigned bigint → decimal(20,0),
    JSON stays string, binary stays binary)."""
    dt = data_type.lower()
    unsigned = "unsigned" in column_type.lower()
    if dialect == "mysql":
        if dt in ("tinyint", "smallint", "mediumint"):
            return T.IntegerType()
        if dt == "int":
            return T.LongType() if unsigned else T.IntegerType()
        if dt == "bigint":
            return T.DecimalType(20, 0) if unsigned else T.LongType()
        if dt in ("decimal", "numeric"):
            return T.DecimalType(int(precision or 10), int(scale or 0))
        if dt == "float":
            return T.FloatType()
        if dt == "double":
            return T.DoubleType()
        if dt in ("date",):
            return T.DateType()
        if dt in ("datetime", "timestamp"):
            return T.TimestampType()
        if dt in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob", "bit"):
            return T.BinaryType()
        if dt == "year":
            return T.IntegerType()
        # char/varchar/text*/enum/set/json/time → string
        return T.StringType()
    # postgres (dt here is udt_name when available, else data_type)
    if dt.startswith("_"):
        return T.ArrayType(to_spark_type(dt[1:], dialect="postgres"))
    if dt in ("int2", "smallint"):
        return T.IntegerType()
    if dt in ("int4", "integer"):
        return T.IntegerType()
    if dt in ("int8", "bigint"):
        return T.LongType()
    if dt in ("numeric", "decimal"):
        return T.DecimalType(int(precision or 38), int(scale or 0))
    if dt in ("float4", "real"):
        return T.FloatType()
    if dt in ("float8", "double precision"):
        return T.DoubleType()
    if dt in ("bool", "boolean"):
        return T.BooleanType()
    if dt == "bytea":
        return T.BinaryType()
    if dt == "date":
        return T.DateType()
    if dt in ("timestamp", "timestamptz"):
        return T.TimestampType()
    # text/varchar/bpchar/uuid/json/jsonb/time/interval → string
    return T.StringType()


# ------------------------------------------------------------- loader


@dataclass
class TableCatalog:
    db: str
    table: str
    schema: T.StructType
    primary_key: list[str] = field(default_factory=list)


Execute = Callable[[str], list[dict[str, Any]]]


def jdbc_execute(spark, url: str, properties: dict[str, str] | None = None) -> Execute:
    """Production seam: run a catalog query through spark.read.jdbc
    (one tiny single-partition read per query — catalog metadata is
    O(columns), never data-sized)."""

    def run(sql: str) -> list[dict[str, Any]]:
        df = spark.read.jdbc(url, f"({sql}) AS t", properties=properties or {})
        return [r.asDict() for r in df.collect()]

    return run


def expand_patterns(execute: Execute, patterns: list[str], dialect: str) -> list[tuple[str, str]]:
    """Patterns → deduped (db, table) list, stable order (reference
    expand_patterns, mysql_schema_loader.rs:183-227)."""
    seen: dict[tuple[str, str], None] = {}
    for p in patterns:
        for row in execute(build_pattern_query(p, dialect)):
            key = (str(row["TABLE_SCHEMA"]), str(row["TABLE_NAME"]))
            seen.setdefault(key, None)
    return list(seen)


def load_catalog(
    execute: Execute, patterns: list[str], dialect: str = "mysql"
) -> list[TableCatalog]:
    """Expand patterns and fetch each table's schema + PK. Raises on a
    table with no columns (the reference's loud not-found path,
    mysql_schema_loader.rs:419-425)."""
    out: list[TableCatalog] = []
    for db, table in expand_patterns(execute, patterns, dialect):
        cols = execute(columns_query(db, table, dialect))
        if not cols:
            raise ValueError(f"table {db}.{table} not found or has no columns")
        fields = []
        for c in sorted(cols, key=lambda r: int(r["ORDINAL_POSITION"])):
            spark_t = to_spark_type(
                str(c.get("UDT_NAME") or c["DATA_TYPE"]),
                column_type=str(c.get("COLUMN_TYPE") or ""),
                precision=c.get("NUMERIC_PRECISION"),
                scale=c.get("NUMERIC_SCALE"),
                dialect=dialect,
            )
            fields.append(
                T.StructField(
                    str(c["COLUMN_NAME"]), spark_t, str(c["IS_NULLABLE"]).upper() == "YES"
                )
            )
        pk = [str(r["COLUMN_NAME"]) for r in execute(primary_key_query(db, table, dialect))]
        out.append(TableCatalog(db=db, table=table, schema=T.StructType(fields), primary_key=pk))
    return out


def bootstrap_registry(registry, catalog: list[TableCatalog]) -> int:
    """Register every catalog table's schema; returns how many were
    (newly) registered. The registry's own fingerprinting dedupes
    re-bootstraps of an unchanged catalog."""
    n = 0
    for tc in catalog:
        registry.register(tc.db, tc.table, tc.schema)
        n += 1
    return n
