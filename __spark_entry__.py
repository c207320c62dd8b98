"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC pipeline on sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``— DuckDB-equivalent SQL per query.

Every computed column is aliased identically on both sides; aggregates
over doubles are cast to DECIMAL before summing so both engines do exact
arithmetic and hash-match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deltaforge_spark.session import apply_runtime_conf
from deltaforge_spark.sources import change_feed, read_table, snapshot_events
from deltaforge_spark.operators import (
    FilterSpec,
    apply_filter,
    flatten_events,
)

SF1K = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- helpers
def _prep(spark: SparkSession) -> SparkSession:
    return apply_runtime_conf(spark)


# ---------------------------------------------------------------- queries
def q_snapshot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot source: orders table → op='r' events (flattened view)."""
    _prep(spark)
    df = snapshot_events(
        read_table(spark, sf_dir, "orders"),
        db="testdb",
        table="orders",
        event_id=F.col("o_orderkey").cast("string"),
    )
    return df.select(
        F.col("op"),
        F.col("event_id"),
        F.col("source.db").alias("src_db"),
        F.col("source.table").alias("src_table"),
        F.col("source.snapshot").alias("src_snapshot"),
        F.col("after.o_orderkey").alias("o_orderkey"),
        F.col("after.o_custkey").alias("o_custkey"),
        F.col("after.o_totalprice").alias("o_totalprice"),
    )


def q_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed decode: events table → c/u/d events with tx metadata."""
    _prep(spark)
    df = change_feed(spark, sf_dir)
    return df.select(
        F.col("op"),
        F.col("ts_ms"),
        F.col("event_id"),
        F.col("before.value").alias("before_value"),
        F.col("after.value").alias("after_value"),
        F.col("transaction.id").alias("tx_id"),
        F.col("transaction.total_order").alias("tx_order"),
        F.col("tx_end"),
    )


def q_filter_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter processor: op gate + field predicates (gte/in/regex, all)."""
    _prep(spark)
    df = change_feed(spark, sf_dir)
    spec = FilterSpec(
        ops=["c", "u"],
        fields=[
            {"field": "value", "op": "gte", "value": 100},
            {"field": "event_type", "op": "in", "value": ["signup", "purchase", "view"]},
            {"field": "props", "op": "regex", "value": '"k": [0-9]?[0-9]\\}'},
        ],
        match="all",
    )
    out = apply_filter(df, spec)
    return out.select(
        F.col("op"),
        F.col("event_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
    )


def q_filter_any_changed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter processor: match=any + `changed` predicate semantics."""
    _prep(spark)
    df = change_feed(spark, sf_dir)
    spec = FilterSpec(
        fields=[
            {"field": "value", "op": "changed"},
            {"field": "event_type", "op": "eq", "value": "error"},
        ],
        match="any",
    )
    out = apply_filter(df, spec)
    return out.groupBy("op").agg(F.count("*").alias("n")).orderBy("op")


def q_filter_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table gate: include/exclude glob patterns over db.table."""
    _prep(spark)
    orders = snapshot_events(read_table(spark, sf_dir, "orders"), table="orders",
                             event_id=F.col("o_orderkey").cast("string"))
    cust = snapshot_events(read_table(spark, sf_dir, "customer"), table="customer",
                           event_id=F.col("c_custkey").cast("string"))
    sup = snapshot_events(read_table(spark, sf_dir, "supplier"), table="supplier",
                          event_id=F.col("s_suppkey").cast("string"))
    keyed = [
        df.select(F.col("event_id"), F.col("source.db").alias("db"), F.col("source.table").alias("tbl"))
        for df in (orders, cust, sup)
    ]
    union = keyed[0].unionByName(keyed[1]).unionByName(keyed[2])
    # re-wrap minimal envelope for the gate
    evdf = union.select(
        F.lit("r").alias("op"),
        F.struct(F.col("db"), F.col("tbl").alias("table")).alias("source"),
        F.col("event_id"),
        F.col("tbl"),
    )
    spec = FilterSpec(include_tables=["testdb.*"], exclude_tables=["%.supplier"])
    out = apply_filter(evdf, spec)
    return out.groupBy("tbl").agg(F.count("*").alias("n")).orderBy("tbl")


def q_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten processor: nested before/after structs → parent__child."""
    _prep(spark)
    df = change_feed(spark, sf_dir)
    flat = flatten_events(df)
    return flat.select(
        "op",
        "event_id",
        "before__value",
        "after__value",
        "after__event_type",
        "transaction",
    ).select(
        "op",
        "event_id",
        "before__value",
        "after__value",
        "after__event_type",
        F.col("transaction.id").alias("tx_id"),
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational layer (beyond-reference): TPC-H Q1-style aggregation."""
    _prep(spark)
    li = read_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(38,4)").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("decimal(38,4)").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast(
                    "decimal(38,8)"
                )
            ).cast("decimal(38,8)").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "snapshot_orders": q_snapshot_orders,
    "cdc_changefeed": q_changefeed,
    "cdc_filter_fields": q_filter_fields,
    "cdc_filter_any_changed": q_filter_any_changed,
    "cdc_filter_tables": q_filter_tables,
    "cdc_flatten": q_flatten,
    "q1_pricing_summary": q1_pricing_summary,
}


CHANGEFEED_SQL = """
    SELECT CASE WHEN event_type = 'signup' THEN 'c'
                WHEN event_type = 'error' THEN 'd'
                ELSE 'u' END AS op,
           epoch_ms(ts) AS ts_ms,
           CAST(event_id AS VARCHAR) AS event_id,
           CASE WHEN event_type IN ('signup') THEN NULL ELSE value - 1.0 END AS before_value,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS after_value,
           event_type,
           value,
           props,
           CAST(user_id AS VARCHAR) || ':' || CAST(CAST(floor(event_id / 10) AS BIGINT) AS VARCHAR) AS tx_id,
           CAST(row_number() OVER w AS BIGINT) AS tx_order,
           row_number() OVER w = count(*) OVER (PARTITION BY CAST(floor(event_id / 10) AS BIGINT), user_id) AS tx_end
    FROM events
    WINDOW w AS (PARTITION BY CAST(floor(event_id / 10) AS BIGINT), user_id ORDER BY event_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "snapshot_orders": """
            SELECT 'r' AS op,
                   CAST(o_orderkey AS VARCHAR) AS event_id,
                   'testdb' AS src_db, 'orders' AS src_table, TRUE AS src_snapshot,
                   o_orderkey, o_custkey, o_totalprice
            FROM orders
        """,
        "cdc_changefeed": f"""
            SELECT op, ts_ms, event_id, before_value, after_value, tx_id, tx_order, tx_end
            FROM ({CHANGEFEED_SQL})
        """,
        "cdc_filter_fields": f"""
            SELECT op, event_id, event_type, value
            FROM ({CHANGEFEED_SQL})
            WHERE op IN ('c','u')
              AND value >= 100
              AND event_type IN ('signup','purchase','view')
              AND regexp_matches(props, '"k": [0-9]?[0-9]}}')
        """,
        "cdc_filter_any_changed": f"""
            SELECT op, count(*) AS n
            FROM ({CHANGEFEED_SQL})
            WHERE (CASE WHEN op IN ('c','d') THEN TRUE
                        ELSE before_value IS DISTINCT FROM after_value END)
               OR event_type = 'error'
            GROUP BY op ORDER BY op
        """,
        "cdc_filter_tables": """
            SELECT tbl, count(*) AS n FROM (
                SELECT 'orders' AS tbl FROM orders
                UNION ALL SELECT 'customer' FROM customer
            ) GROUP BY tbl ORDER BY tbl
        """,
        "cdc_flatten": f"""
            SELECT op, event_id, before_value AS before__value,
                   after_value AS after__value,
                   CASE WHEN op = 'd' THEN NULL ELSE event_type END AS after__event_type,
                   tx_id
            FROM ({CHANGEFEED_SQL})
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_base_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,8)))
                        AS DECIMAL(38,8)) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC pipeline — change feed → filter → flatten on sf0.001."""
    _prep(spark)
    df = change_feed(spark, SF1K)
    spec = FilterSpec(ops=["c", "u", "d"], fields=[{"field": "value", "op": "gte", "value": 10}])
    out = flatten_events(apply_filter(df, spec))
    return out.select(
        "op", "ts_ms", "event_id", "before__value", "after__value",
        "after__event_type", "tx_end",
    )
