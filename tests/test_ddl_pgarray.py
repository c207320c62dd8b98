"""DDL event capture + PG array-literal parsing."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Row

from deltaforge_spark.functions.pgarray import parse_pg_array
from deltaforge_spark.schema import SchemaRegistry
from deltaforge_spark.sources.ddl import ddl_events, extract_table_name, refresh_registry_on_ddl


def test_ddl_event_rows(spark):
    stmts = spark.createDataFrame(
        [
            Row(statement="ALTER TABLE orders ADD COLUMN note TEXT"),
            Row(statement="CREATE TABLE IF NOT EXISTS audit (id INT)"),
            Row(statement="TRUNCATE TABLE sessions"),
            Row(statement="INSERT INTO orders VALUES (1)"),  # not DDL
            Row(statement="SELECT 1"),  # not DDL
        ]
    )
    out = ddl_events(stmts).collect()
    assert len(out) == 3
    by_table = {r["source"]["table"]: r for r in out}
    assert set(by_table) == {"orders", "audit", "sessions"}
    assert by_table["orders"]["ddl"].startswith("ALTER TABLE orders")
    assert by_table["orders"]["op"] == "r"
    assert by_table["orders"]["after"] is None


def test_extract_table_name():
    assert extract_table_name("ALTER TABLE `foo` DROP COLUMN x") == "foo"
    assert extract_table_name('DROP TABLE IF EXISTS "bar"') == "bar"
    assert extract_table_name("RENAME TABLE a TO b") == "a"
    assert extract_table_name("GRANT ALL ON x TO y") is None


def test_registry_refresh_on_ddl(spark, tmp_path):
    reg = SchemaRegistry(spark, str(tmp_path / "reg"))
    s1 = T.StructType([T.StructField("id", T.LongType())])
    reg.register("testdb", "orders", s1)
    s2 = T.StructType([T.StructField("id", T.LongType()), T.StructField("note", T.StringType())])

    batch = ddl_events(
        spark.createDataFrame([Row(statement="ALTER TABLE orders ADD COLUMN note TEXT")])
    )
    refreshed = refresh_registry_on_ddl(batch, reg, {"orders": s2})
    assert refreshed == ["orders"]
    assert reg.current("testdb", "orders")["version"] == 2


def test_pg_array_basic(spark):
    df = spark.createDataFrame(
        [
            Row(a="{1,2,3}"),
            Row(a="{}"),
            Row(a=None),
            Row(a="{a,NULL,c}"),
        ]
    )
    got = [r["arr"] for r in df.select(parse_pg_array(F.col("a")).alias("arr")).collect()]
    assert got[0] == ["1", "2", "3"]
    assert got[1] == []
    assert got[2] is None
    assert got[3] == ["a", None, "c"]


def test_pg_array_quotes_escapes(spark):
    df = spark.createDataFrame(
        [
            Row(a='{simple,"with,comma","with\\"quote","back\\\\slash"}'),
            Row(a='{"NULL",NULL}'),  # quoted NULL is a literal string
        ]
    )
    got = [r["arr"] for r in df.select(parse_pg_array(F.col("a")).alias("arr")).collect()]
    assert got[0] == ["simple", "with,comma", 'with"quote', "back\\slash"]
    assert got[1] == ["NULL", None]
