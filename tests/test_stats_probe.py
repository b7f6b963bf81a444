"""Footer-statistics aggregate probe: COUNT/MIN/MAX from parquet
metadata (DSv2 aggregate pushdown), matching the data-scan answer
exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_stats_probe_matches_scan_and_pushes(spark):
    from odoo_batch_processing_spark.sources.loader import load_table, stats_probe

    got = stats_probe(spark, SF_SMOKE, "lineitem", "l_quantity", "l_shipdate")
    li = load_table(spark, SF_SMOKE, "lineitem")
    want = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_quantity").alias("min_l_quantity"),
        F.max("l_quantity").alias("max_l_quantity"),
        F.min("l_shipdate").alias("min_l_shipdate"),
        F.max("l_shipdate").alias("max_l_shipdate"),
    ).first().asDict()
    assert got == want

    # the probe's plan really is metadata-only (PushedAggregation)
    key = "spark.sql.sources.useV1SourceList"
    prev = spark.conf.get(key)
    spark.conf.set(key, "")
    try:
        plan = (
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .agg(F.count(F.lit(1)), F.min("l_quantity"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(key, prev)
    assert "PushedAggregation" in plan

    # the V1 toggle is restored — the engine's default path unchanged
    assert spark.conf.get(key) == prev
