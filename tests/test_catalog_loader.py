"""JDBC schema-loader front (schema/catalog.py) against a RECORDED
catalog fixture — the no-live-DB seam (VERDICT r4 Next-round #8):
pattern expansion (`db.*`, `db.prefix%`, bare table), per-table column
and PK fetch, native→Spark type mapping, and registry bootstrap, all
value-checked without a server, mirroring reference
mysql_schema_loader.rs / postgres_schema_loader.rs behavior.
"""

import re

import pytest
from pyspark.sql import types as T

from deltaforge_spark.schema.catalog import (
    TableCatalog,
    bootstrap_registry,
    build_pattern_query,
    columns_query,
    expand_patterns,
    load_catalog,
    parse_pattern,
    primary_key_query,
    to_spark_type,
)

# ---------------------------------------------------------------- fixture
# A recorded MySQL INFORMATION_SCHEMA dump: 3 user tables in `shop`,
# one in `audit`, plus system tables that must never match.

MYSQL_TABLES = [
    ("shop", "orders"),
    ("shop", "order_items"),
    ("shop", "customers"),
    ("audit", "events"),
    ("mysql", "user"),
    ("information_schema", "TABLES"),
]

MYSQL_COLUMNS = {
    ("shop", "orders"): [
        {"COLUMN_NAME": "id", "COLUMN_TYPE": "bigint unsigned", "DATA_TYPE": "bigint",
         "IS_NULLABLE": "NO", "ORDINAL_POSITION": 1, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": 20, "NUMERIC_SCALE": 0},
        {"COLUMN_NAME": "total", "COLUMN_TYPE": "decimal(18,2)", "DATA_TYPE": "decimal",
         "IS_NULLABLE": "YES", "ORDINAL_POSITION": 2, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": 18, "NUMERIC_SCALE": 2},
        {"COLUMN_NAME": "placed_at", "COLUMN_TYPE": "datetime(6)", "DATA_TYPE": "datetime",
         "IS_NULLABLE": "NO", "ORDINAL_POSITION": 3, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": None, "NUMERIC_SCALE": None},
        {"COLUMN_NAME": "meta", "COLUMN_TYPE": "json", "DATA_TYPE": "json",
         "IS_NULLABLE": "YES", "ORDINAL_POSITION": 4, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": None, "NUMERIC_SCALE": None},
    ],
    ("shop", "order_items"): [
        {"COLUMN_NAME": "order_id", "COLUMN_TYPE": "bigint", "DATA_TYPE": "bigint",
         "IS_NULLABLE": "NO", "ORDINAL_POSITION": 1, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": 19, "NUMERIC_SCALE": 0},
        {"COLUMN_NAME": "sku", "COLUMN_TYPE": "varchar(64)", "DATA_TYPE": "varchar",
         "IS_NULLABLE": "NO", "ORDINAL_POSITION": 2, "CHARACTER_MAXIMUM_LENGTH": 64,
         "NUMERIC_PRECISION": None, "NUMERIC_SCALE": None},
    ],
    ("shop", "customers"): [
        {"COLUMN_NAME": "id", "COLUMN_TYPE": "int", "DATA_TYPE": "int",
         "IS_NULLABLE": "NO", "ORDINAL_POSITION": 1, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": 10, "NUMERIC_SCALE": 0},
        {"COLUMN_NAME": "avatar", "COLUMN_TYPE": "mediumblob", "DATA_TYPE": "mediumblob",
         "IS_NULLABLE": "YES", "ORDINAL_POSITION": 2, "CHARACTER_MAXIMUM_LENGTH": 16777215,
         "NUMERIC_PRECISION": None, "NUMERIC_SCALE": None},
    ],
    ("audit", "events"): [
        {"COLUMN_NAME": "seq", "COLUMN_TYPE": "bigint", "DATA_TYPE": "bigint",
         "IS_NULLABLE": "NO", "ORDINAL_POSITION": 1, "CHARACTER_MAXIMUM_LENGTH": None,
         "NUMERIC_PRECISION": 19, "NUMERIC_SCALE": 0},
    ],
}

MYSQL_PKS = {
    ("shop", "orders"): ["id"],
    ("shop", "order_items"): ["order_id", "sku"],
    ("shop", "customers"): ["id"],
    ("audit", "events"): ["seq"],
}


def mysql_execute(sql: str):
    """Tiny recorded-catalog SQL engine: answers exactly the query
    shapes catalog.py emits (anything else is a test failure)."""
    if "INFORMATION_SCHEMA.TABLES" in sql:
        rows = [t for t in MYSQL_TABLES]
        m = re.search(r"TABLE_SCHEMA = '([^']+)'", sql)
        if m:
            rows = [t for t in rows if t[0] == m.group(1)]
        m = re.search(r"TABLE_SCHEMA LIKE '([^']+)'", sql)
        if m:
            rx = "^" + m.group(1).replace("%", ".*").replace("_", ".") + "$"
            rows = [t for t in rows if re.match(rx, t[0])]
        if "TABLE_SCHEMA NOT IN" in sql:
            rows = [t for t in rows if t[0] not in
                    ("mysql", "information_schema", "performance_schema", "sys")]
        m = re.search(r"TABLE_NAME = '([^']+)'", sql)
        if m:
            rows = [t for t in rows if t[1] == m.group(1)]
        m = re.search(r"TABLE_NAME LIKE '([^']+)'", sql)
        if m:
            rx = "^" + m.group(1).replace("%", ".*").replace("_", ".") + "$"
            rows = [t for t in rows if re.match(rx, t[1])]
        return [{"TABLE_SCHEMA": d, "TABLE_NAME": t} for d, t in rows]
    if "INFORMATION_SCHEMA.COLUMNS" in sql:
        m = re.search(r"TABLE_SCHEMA = '([^']+)' AND TABLE_NAME = '([^']+)'", sql)
        return list(MYSQL_COLUMNS.get((m.group(1), m.group(2)), []))
    if "KEY_COLUMN_USAGE" in sql:
        m = re.search(r"TABLE_SCHEMA = '([^']+)' AND TABLE_NAME = '([^']+)'", sql)
        return [{"COLUMN_NAME": c} for c in MYSQL_PKS.get((m.group(1), m.group(2)), [])]
    raise AssertionError(f"unexpected catalog query: {sql}")


# ----------------------------------------------------------------- tests


class TestPatternRules:
    def test_bare_table_matches_any_mysql_db(self):
        assert parse_pattern("events", "mysql") == ("%", "events")

    def test_bare_table_defaults_to_public_on_pg(self):
        assert parse_pattern("events", "postgres") == ("public", "events")

    def test_mysql_underscore_triggers_like(self):
        q = build_pattern_query("shop.order_items", "mysql")
        assert "TABLE_NAME LIKE 'order_items'" in q  # mysql: _ IS a wildcard

    def test_pg_underscore_stays_literal(self):
        q = build_pattern_query("public.order_items", "postgres")
        assert "table_name = 'order_items'" in q  # pg: only * globs

    def test_pg_glob_escapes_literal_percent(self):
        q = build_pattern_query("public.r*te%", "postgres")
        assert "LIKE 'r%te\\%'" in q

    def test_wildcard_db_excludes_system_schemas(self):
        q = build_pattern_query("*.*", "mysql")
        assert "NOT IN" in q and "performance_schema" in q

    def test_quote_escaping(self):
        q = build_pattern_query("a'b.t", "mysql")
        assert "a''b" in q


class TestExpansion:
    def test_db_star_expands_all_user_tables(self):
        got = expand_patterns(mysql_execute, ["shop.*"], "mysql")
        assert got == [("shop", "orders"), ("shop", "order_items"), ("shop", "customers")]

    def test_prefix_percent(self):
        got = expand_patterns(mysql_execute, ["shop.order%"], "mysql")
        assert got == [("shop", "orders"), ("shop", "order_items")]

    def test_bare_name_searches_all_dbs_excluding_system(self):
        got = expand_patterns(mysql_execute, ["events"], "mysql")
        assert got == [("audit", "events")]

    def test_overlapping_patterns_dedupe_stable_order(self):
        got = expand_patterns(mysql_execute, ["shop.orders", "shop.order%"], "mysql")
        assert got == [("shop", "orders"), ("shop", "order_items")]


class TestLoadCatalog:
    def test_schema_and_pk(self):
        cat = load_catalog(mysql_execute, ["shop.orders"], "mysql")
        assert len(cat) == 1
        tc = cat[0]
        assert tc.primary_key == ["id"]
        assert tc.schema == T.StructType([
            T.StructField("id", T.DecimalType(20, 0), False),   # unsigned bigint
            T.StructField("total", T.DecimalType(18, 2), True),
            T.StructField("placed_at", T.TimestampType(), False),
            T.StructField("meta", T.StringType(), True),        # json → string
        ])

    def test_composite_pk_order_preserved(self):
        tc = load_catalog(mysql_execute, ["shop.order_items"], "mysql")[0]
        assert tc.primary_key == ["order_id", "sku"]

    def test_blob_maps_to_binary(self):
        tc = load_catalog(mysql_execute, ["shop.customers"], "mysql")[0]
        assert tc.schema["avatar"].dataType == T.BinaryType()

    def test_missing_table_is_loud(self):
        with pytest.raises(ValueError, match="not found"):
            load_catalog(
                lambda sql: ([{"TABLE_SCHEMA": "shop", "TABLE_NAME": "ghost"}]
                             if "INFORMATION_SCHEMA.TABLES" in sql else []),
                ["shop.ghost"], "mysql",
            )


class TestPgTypeRules:
    @pytest.mark.parametrize("udt,expected", [
        ("int4", T.IntegerType()),
        ("int8", T.LongType()),
        ("bool", T.BooleanType()),
        ("bytea", T.BinaryType()),
        ("timestamptz", T.TimestampType()),
        ("uuid", T.StringType()),
        ("jsonb", T.StringType()),
        ("_int8", T.ArrayType(T.LongType())),
        ("_text", T.ArrayType(T.StringType())),
    ])
    def test_udt_mapping(self, udt, expected):
        assert to_spark_type(udt, dialect="postgres") == expected

    def test_numeric_precision(self):
        assert to_spark_type("numeric", precision=12, scale=4, dialect="postgres") == \
            T.DecimalType(12, 4)


class TestRegistryBootstrap:
    def test_bootstrap_registers_and_stamps(self, spark, tmp_path):
        from deltaforge_spark.schema.registry import SchemaRegistry

        reg = SchemaRegistry(spark, str(tmp_path / "registry"))
        cat = load_catalog(mysql_execute, ["shop.*"], "mysql")
        n = bootstrap_registry(reg, cat)
        assert n == 3
        cur = reg.current("shop", "orders")
        assert cur is not None
        import json as _json

        round_tripped = T.StructType.fromJson(_json.loads(cur["schema_json"]))
        assert round_tripped["id"].dataType == T.DecimalType(20, 0)
        tables = {(t["db"], t["table"]) for t in reg.list_tables()}
        assert ("shop", "orders") in tables and ("shop", "customers") in tables

    def test_rebootstrap_is_idempotent(self, spark, tmp_path):
        from deltaforge_spark.schema.registry import SchemaRegistry

        reg = SchemaRegistry(spark, str(tmp_path / "registry2"))
        cat = load_catalog(mysql_execute, ["shop.orders"], "mysql")
        bootstrap_registry(reg, cat)
        v1 = reg.versions("shop", "orders")
        bootstrap_registry(reg, cat)
        v2 = reg.versions("shop", "orders")
        assert len(v1) == len(v2)  # unchanged schema: no new version
