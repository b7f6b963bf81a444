"""Focused equivalence tests for the r18 optimization internals:

- ``pruned_shingle_postings(with_tf=False)`` must return exactly the
  (doc_id, shingle) set of the tf form — the graph queries' oracle
  contract rides on the distinct-postings rewrite being row-identical.
- ``loader.table_row_count`` (parquet-footer count) must equal the
  Spark count for every fixture table — the df caps / idf / subcell
  depth scalars ride on it.
- ``pagerank``'s single-aggregate scalars (|E| = Σ deg, |V| = #deg
  rows) must reproduce the two counts they replaced, including the
  empty-graph path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_distinct_postings_equal_tf_postings(spark):
    from odoo_batch_processing_spark.operators.text import (
        GRAPH_DF_CAP,
        pruned_shingle_postings,
    )

    with_tf, n1 = pruned_shingle_postings(spark, SF_SMOKE, abs_cap=GRAPH_DF_CAP)
    no_tf, n2 = pruned_shingle_postings(
        spark, SF_SMOKE, abs_cap=GRAPH_DF_CAP, with_tf=False
    )
    assert n1 == n2
    a = with_tf.select("doc_id", "shingle")
    b = no_tf.select("doc_id", "shingle")
    # row-identical both ways (each side is distinct by construction,
    # so exceptAll in both directions is the full multiset equality)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_footer_row_count_matches_spark_count(spark):
    from odoo_batch_processing_spark.schemas import TABLE_NAMES
    from odoo_batch_processing_spark.sources.loader import (
        load_table,
        table_row_count,
    )

    for name in TABLE_NAMES:
        assert table_row_count(SF_SMOKE, name) == load_table(
            spark, SF_SMOKE, name
        ).count(), name


def test_pagerank_budget_guard_still_fires(spark):
    import pytest

    from odoo_batch_processing_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1)], "src int, dst int"
    )
    # |E|·iters = 4·3 = 12 > 11 must still raise with the measured size
    with pytest.raises(ValueError, match=r"4·3"):
        pagerank(edges, iters=3, edge_budget=11)
    # and exactly at the budget it must run (scalars from the one agg)
    out = pagerank(edges, iters=3, edge_budget=12)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["deg"] == 2 and rows[2]["deg"] == 1 and rows[3]["deg"] == 1


def test_pagerank_empty_graph_still_typed(spark):
    from odoo_batch_processing_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src int, dst int")
    out = pagerank(edges, iters=3)
    assert out.columns == ["id", "deg", "rank"]
    assert out.count() == 0
