"""M0: the flagship star query runs end-to-end and matches its oracle."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_registry_consistency():
    from odoo_batch_processing_spark.registry import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    assert set(oracles) <= set(queries)
    assert len(queries) >= 1


def test_analytics_match_oracle(spark, duck):
    from odoo_batch_processing_spark.oracle import compare
    from odoo_batch_processing_spark.plans import analytics

    for name, fn in analytics.QUERIES.items():
        result = compare(name, fn(spark, SF_SMOKE), duck, analytics.ORACLES[name])
        assert result.ok, str(result)
