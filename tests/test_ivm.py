"""Incremental view maintenance: merge correctness + retractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_ivm_retraction_restores_base_state(spark):
    """Applying a delta then its negation must land back on the
    standing state — the additive-state property retractions rely on."""
    from odoo_batch_processing_spark.operators.ivm import (
        additive_state,
        merge_states,
    )
    from odoo_batch_processing_spark.sources.loader import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    base = additive_state(
        ev.filter(F.col("event_id") % 10 != 0), ["event_type"], "value"
    )
    delta = additive_state(
        ev.filter(F.col("event_id") % 10 == 0), ["event_type"], "value"
    )
    retraction = delta.select(
        "event_type", (-F.col("n")).alias("n"), (-F.col("sum_v")).alias("sum_v")
    )
    round_trip = merge_states(
        merge_states(base, delta, ["event_type"]), retraction, ["event_type"]
    )
    # groups fully retracted net to n=0; drop them like a real view would
    round_trip = round_trip.filter(F.col("n") > 0)
    assert round_trip.exceptAll(base).count() == 0
    assert base.exceptAll(round_trip).count() == 0


def test_ivm_new_group_in_delta(spark):
    from odoo_batch_processing_spark.operators.ivm import merge_states

    standing = spark.createDataFrame(
        [("a", 2, 10.0)], "k string, n bigint, sum_v double"
    ).withColumn("sum_v", F.col("sum_v").cast("decimal(18,6)"))
    delta = spark.createDataFrame(
        [("b", 1, 5.0)], "k string, n bigint, sum_v double"
    ).withColumn("sum_v", F.col("sum_v").cast("decimal(18,6)"))
    out = {r["k"]: (r["n"], float(r["sum_v"])) for r in merge_states(standing, delta, ["k"]).collect()}
    assert out == {"a": (2, 10.0), "b": (1, 5.0)}
