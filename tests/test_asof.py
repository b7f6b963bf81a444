"""As-of join edge semantics: inclusive ties, no-match → NULL,
key isolation; range join window boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_inclusive_tie_and_no_match(spark):
    from odoo_batch_processing_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(10)), (3, 2, _ts(10))],
        "id bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(5))], "k bigint, ts timestamp"
    )
    out = {r["id"]: r["asof_ts"] for r in asof_join(left, right, ["k"]).collect()}
    assert out[1] == _ts(0)    # tie at same instant is INCLUSIVE (≥)
    assert out[2] == _ts(5)    # latest at-or-before
    assert out[3] is None      # other key: no match → NULL (left join)


def test_range_join_window_boundaries(spark):
    from odoo_batch_processing_spark.operators.asof import range_join_bucketed

    purchases = spark.createDataFrame([(10, 1, _ts(0))], "pid bigint, k bigint, p_ts timestamp")
    events = spark.createDataFrame(
        [(100, 1, _ts(0)), (101, 1, _ts(29)), (102, 1, _ts(30)), (103, 2, _ts(5))],
        "eid bigint, k bigint, f_ts timestamp",
    )
    pairs = range_join_bucketed(purchases, events, ["k"], "p_ts", "f_ts", 1800)
    eids = sorted(r["eid"] for r in pairs.collect())
    # [t, t+30min): start inclusive (100), inside (101), end exclusive (102 out), wrong key (103 out)
    assert eids == [100, 101]
