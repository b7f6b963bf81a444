"""int8 quantization quality: the 8x-smaller representation must keep
near-perfect neighbor recall on the fixture embeddings (random 64-d
vectors — the hard case for quantization, no cluster structure to
hide behind)."""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def test_int8_topk_recall_vs_exact(spark):
    from odoo_batch_processing_spark.registry import all_queries

    q = all_queries(extended=True)
    exact = q["x4_cosine_topk"](spark, SF_CORRECT).collect()
    quant = q["x4_int8_topk"](spark, SF_CORRECT).collect()
    by_query_exact: dict = {}
    by_query_quant: dict = {}
    for r in exact:
        by_query_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        by_query_quant.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_query_exact.keys() == by_query_quant.keys()
    recalls = [
        len(by_query_exact[k] & by_query_quant[k]) / len(by_query_exact[k])
        for k in by_query_exact
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, f"int8 recall@10 collapsed: {avg:.2f} ({recalls})"
