"""Bucketed ingest → exchange-free fact-fact join (the q3/q5 100 TB
fix, SCALE.md): plan-asserted, not just documented."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.bucketing import bucketed_pair
from deltaforge_spark.sources.snapshot import read_table


@pytest.fixture()
def plain_join_confs(spark):
    """Force a sort-merge join (no broadcast) and disable AQE plan
    rewrites so the static plan shows the exchange story unambiguously."""
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _exchanges_in(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path, plain_join_confs):
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    # baseline: the un-bucketed join shuffles both sides
    base = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    assert _exchanges_in(base) >= 2

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    try:
        b_orders, b_lineitem = bucketed_pair(
            spark,
            orders,
            lineitem,
            left_table="bktest.orders_b",
            right_table="bktest.lineitem_b",
            left_key="o_orderkey",
            right_key="l_orderkey",
            buckets=8,
        )
        joined = b_lineitem.join(
            b_orders, b_lineitem.l_orderkey == b_orders.o_orderkey
        ).groupBy("o_orderdate").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,4)"
                )
            ).alias("revenue")
        )
        # the join itself must have NO exchange on either side; the only
        # allowed exchange is the one feeding the final groupBy
        assert _exchanges_in(joined) <= 1

        # and it computes the same result as the shuffled join
        expect = (
            base.groupBy("o_orderdate")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,4)"
                    )
                ).alias("revenue")
            )
        )
        got = {r["o_orderdate"]: r["revenue"] for r in joined.collect()}
        want = {r["o_orderdate"]: r["revenue"] for r in expect.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucket_count_mismatch_falls_back_to_shuffle(spark, sf_dir, plain_join_confs):
    """The regression the plan gate exists for: mismatched bucket counts
    silently reintroduce the shuffle."""
    from deltaforge_spark.operators.bucketing import write_bucketed

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkmis")
    try:
        write_bucketed(orders, "bkmis.o4", key="o_orderkey", buckets=4)
        write_bucketed(lineitem, "bkmis.l8", key="l_orderkey", buckets=8)
        j = spark.table("bkmis.l8").join(
            spark.table("bkmis.o4"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # one side re-shuffles (Spark shuffles the smaller bucket count
        # side or both depending on version) — at least one exchange
        assert _exchanges_in(j) >= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS bkmis.o4")
        spark.sql("DROP TABLE IF EXISTS bkmis.l8")
        spark.sql("DROP DATABASE IF EXISTS bkmis")
