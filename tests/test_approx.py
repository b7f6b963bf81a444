"""X8 approximate aggregates: the driver's rows-only check cannot see
accuracy, so these tests bound the sketches against their exact twins
in-engine — HLL++ within its configured relative standard deviation
(with slack: rsd is a standard deviation, not a hard bound) and the GK
quantile sketch within rank tolerance of the exact percentile."""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def test_approx_distinct_within_rsd(spark):
    from odoo_batch_processing_spark.operators.approx import (
        _q_x8_exact_distinct,
        _x8_approx_distinct_raw,
    )

    exact = {
        r["l_returnflag"]: (r["n_parts"], r["n_supps"])
        for r in _q_x8_exact_distinct(spark, SF_CORRECT).collect()
    }
    approx = {
        r["l_returnflag"]: (r["n_parts_approx"], r["n_supps_approx"])
        for r in _x8_approx_distinct_raw(spark, SF_CORRECT).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, (np_e, ns_e) in exact.items():
        np_a, ns_a = approx[flag]
        assert abs(np_a - np_e) / np_e < 0.10  # rsd=0.02, 5σ slack
        assert abs(ns_a - ns_e) / ns_e < 0.10


def test_approx_percentiles_within_rank_tolerance(spark):
    from pyspark.sql import functions as F

    from odoo_batch_processing_spark.operators.approx import (
        _x8_approx_percentiles_raw,
    )
    from odoo_batch_processing_spark.sources.loader import load_table

    approx = {
        r["o_orderpriority"]: (r["p50_approx"], r["p90_approx"])
        for r in _x8_approx_percentiles_raw(spark, SF_CORRECT).collect()
    }
    orders = load_table(spark, SF_CORRECT, "orders")
    for prio, (p50a, p90a) in approx.items():
        grp = orders.filter(F.col("o_orderpriority") == prio)
        n = grp.count()
        for target, value in ((0.5, p50a), (0.9, p90a)):
            # rank of the approximate answer must sit near the target
            # quantile: |rank/n - q| <= 1/accuracy (=1e-4) + discreteness
            rank = grp.filter(F.col("o_totalprice") <= value).count()
            assert abs(rank / n - target) <= 1e-4 + 2.0 / n


def test_tolerance_boolean_forms_all_ok(spark):
    """The catalog forms (VERDICT r12 #5) must emit every ``*_ok``
    boolean TRUE on the fixtures — the same invariant the DuckDB
    oracle hash-gates at sf0.01, asserted here at value level."""
    from odoo_batch_processing_spark.operators.approx import (
        _q_x8_approx_distinct,
        _q_x8_approx_percentiles,
    )

    for rows in (
        _q_x8_approx_distinct(spark, SF_CORRECT).collect(),
        _q_x8_approx_percentiles(spark, SF_CORRECT).collect(),
    ):
        assert rows
        for r in rows:
            d = r.asDict()
            oks = {k: v for k, v in d.items() if k.endswith("_ok")}
            assert oks and all(oks.values()), d
