"""R21 sink roundtrips: parquet/csv/json write→read preserves the
relation (the engine's commit-then-verify contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip_preserves_relation(spark, tmp_path, fmt):
    from odoo_batch_processing_spark.sources.loader import load_table
    from odoo_batch_processing_spark.sources.sinks import write_roundtrip

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    back = write_roundtrip(orders, fmt, out_dir=str(tmp_path / fmt))
    assert back.schema == orders.schema
    a = sorted(tuple(r) for r in orders.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy layout → a filter on the partition column reads only
    that partition's files (PartitionFilters in the scan)."""
    from odoo_batch_processing_spark.sources.loader import load_table
    from odoo_batch_processing_spark.sources.sinks import write_roundtrip

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "part")
    write_roundtrip(orders, "parquet", partition_by=["o_orderstatus"], out_dir=out)
    pruned = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus" in plan
    n_expected = orders.filter(F.col("o_orderstatus") == "O").count()
    assert pruned.count() == n_expected


def test_table_format_stubbed():
    from odoo_batch_processing_spark.sources.sinks import require_table_format

    with pytest.raises(NotImplementedError, match="table format"):
        require_table_format()
