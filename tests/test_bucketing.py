"""Bucketed-write co-located join: the zero-shuffle join path SCALE.md
promises for the big fact⋈fact case (orders⋈lineitem at 100 TB).

Writing both sides bucketed on the join key (same bucket count) lets
Spark join them with NO Exchange on either side — the shuffle happened
once at write time and is amortized over every subsequent join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    from odoo_batch_processing_spark.sources.loader import load_table

    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    (
        orders.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("lineitem_bkt")
    )
    yield "orders_bkt", "lineitem_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_li = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles,
    # not about the small fixture fitting in a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_li).join(spark.table(t_orders), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        n = joined.count()
        expected = (
            spark.table(t_li)
            .join(F.broadcast(spark.table(t_orders)), "o_orderkey")
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join over plain parquet (no bucketing) needs
    at least one Exchange — proving the bucketing is what removed it."""
    from odoo_batch_processing_spark.sources.loader import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
        li = (
            load_table(spark, SF_SMOKE, "lineitem")
            .select("l_orderkey", "l_quantity")
            .withColumnRenamed("l_orderkey", "o_orderkey")
        )
        plan = li.join(orders, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
