"""Runtime bloom-filter (semi-join reduction) injection.

At 100 TB the shuffle before a selective join is the cost center:
Catalyst's `InjectRuntimeFilter` builds a bloom filter from the
selective (dimension) side and applies `might_contain` on the fact
side BELOW its shuffle, so rows that cannot survive the join never
get shuffled. This is free — no engine code — but only fires under
specific conditions; this test pins them so a refactor that silently
loses the filter (e.g. collapsing the pre-join aggregate) is caught:

* the application side must carry a shuffle-inducing node (agg/join/
  window) below the join — the filter's payoff is reducing THAT
  exchange's input;
* the creation side must have a selective predicate over a scan;
* the join must not be planned as broadcast (a BHJ already prunes at
  build time, so Spark skips injection — which is why the engine's
  own broadcast-first plans don't need bloom filters on top).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def _revenue_join(spark):
    from odoo_batch_processing_spark.sources.loader import load_table

    li = load_table(spark, SF_CORRECT, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("rev")
    )
    od = load_table(spark, SF_CORRECT, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        rev.join(od, rev.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rev").cast("double").alias("urgent_rev"),
        )
    )


def test_bloom_filter_injected_on_shuffle_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = _revenue_join(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:3000]
        filtered_rows = {tuple(r) for r in df.collect()}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    # with defaults restored the join broadcasts and no filter is
    # injected — and the result is identical (the filter only prunes
    # rows the join would drop anyway)
    df2 = _revenue_join(spark)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan2.lower()
    assert {tuple(r) for r in df2.collect()} == filtered_rows
