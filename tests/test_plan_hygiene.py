"""Plan hygiene over the WHOLE query catalog: no accidental
nested-loop/cartesian joins, scans carry pushed filters where the
query filters a scanned column. Physical plans only — nothing
executes, so the sweep is cheap and runs on every build.

This is the codified form of the engine rule: '.explain every
operator until it's the plan you'd want' — regressions (a join
condition typo turning an equi-join into BNLJ, a cast blocking
pushdown) fail here, not in a 100 TB run.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

#: streaming queries execute on invocation (they run a bounded stream);
#: the batch sweep below covers everything else.
_SKIP_PREFIXES = ("s_",)
#: sink/source roundtrip queries write on plan construction —
#: cheap but not plan-only; keep them out of the pure-planning sweep.
_SKIP = {"r21_sink_roundtrip", "r21_merge", "src_jsonl_roundtrip", "src_csv_roundtrip"}
#: queries where a nested-loop join is the INTENDED plan:
#: - brute-force ANN has no equi-key — a deliberate
#:   broadcast(query-batch) × corpus scan (similarity.py docstring);
#:   the IVF twin (x4_ivf_topk) is the keyed, hash-joined scale path.
#: - q22/q11/q15's scalar-subquery (one-row aggregate relation)
#:   cross-joins by construction; a BNLJ whose build side is exactly
#:   ONE row is free at any scale.
#: - x4_kmeans_cells cross-joins the k-row (k=8, fixed) centroid
#:   table per iteration — bounded by construction, like the 1-row
#:   scalar aggregates.
_ALLOWED_NESTED_LOOP = {
    "x4_cosine_topk",
    "q22_inactive_customers",
    "q11_important_parts",
    "q15_top_supplier",
    "x4_kmeans_cells",
    # composes x4_cosine_topk (the deliberate BNLJ above) with the IVF
    # probe — inherits both allow-listed shapes
    "x4_ivf_recall",
    # composes x4_cosine_topk with x4_ivf_trained_topk — inherits the
    # same two allow-listed bounded broadcasts (5-row query batch,
    # k-row centroid table)
    "x4_ivf_trained_recall",
    # the new-batch threshold is a ONE-row aggregate (same free scalar
    # shape as q22/q11/q15)
    "x3_incremental_neardup",
    "x3_incremental_embedding_neardup",
    # trains via the same bounded k-row centroid cross-join as
    # x4_kmeans_cells, then probes with a bounded query batch
    "x4_ivf_trained_topk",
    # same deliberate broadcast(5-row query batch) BNLJ as
    # x4_cosine_topk, over the quantized relation
    "x4_int8_topk",
    # corpus totals (N tokens / N docs + avgdl) ride as ONE-row
    # aggregates — the same free scalar shape as q22/q11/q15
    "x5_unigram_surprisal",
    "x5_bm25_topk",
    # composes x5_unigram_surprisal — inherits its 1-row total join
    "x9_difficulty_deciles",
    # global sketch-union estimate + exact global distinct are ONE-row
    # aggregates cross-joined onto the (event-type-bounded) per-part rows
    "x8_hll_merge",
}


def _batch_queries():
    from odoo_batch_processing_spark.registry import all_queries

    # hygiene applies to the WHOLE catalog, extended tier included
    return {
        name: fn
        for name, fn in all_queries(extended=True).items()
        if not name.startswith(_SKIP_PREFIXES) and name not in _SKIP
    }


def test_no_nested_loop_or_cartesian_anywhere(spark):
    offenders = {}
    for name, fn in sorted(_batch_queries().items()):
        if name in _ALLOWED_NESTED_LOOP:
            continue
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        bad = [
            marker
            for marker in ("BroadcastNestedLoopJoin", "CartesianProduct")
            if marker in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalable join strategies in: {offenders}"


@pytest.mark.parametrize(
    ("name", "expect"),
    [
        ("q05_revenue_by_nation", "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
        # plan strings truncate long filter lists at 100 chars — match a prefix
        ("q06_forecast_revenue", "GreaterThanOrEqual(l_shipda"),
        ("r02_visibility_filter", "EqualTo(o_orderstatus,O)"),
    ],
)
def test_filters_reach_the_scan(spark, name, expect):
    from odoo_batch_processing_spark.registry import all_queries

    plan = (
        all_queries(extended=True)[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert expect in plan, f"{name}: filter not pushed to parquet scan"


#: queries allowed to carry a broadcast HINT on a relation derived
#: from an SF-scaling base table, because the hinted relation's
#: cardinality is bounded by construction:
#: - q22 broadcasts a ONE-row scalar aggregate (avg balance);
#: - x4_* broadcast the ANN query batch or the k-row centroid table,
#:   both filtered to a fixed small set (vec_id < N_QUERIES / < k,
#:   then one row per cell) before the hint.
_ALLOWED_HINTED = {
    "q22_inactive_customers",
    "x4_cosine_topk",
    "x4_ivf_topk",
    "x4_ivf_multiprobe",  # same bounded query batch, exploded ×nprobe
    "x4_ivf_probe4",  # same bounded query batch, exploded ×nprobe=4
    "x4_ivf_indexed",
    "x4_ivf_indexed_multiprobe",
    "x4_ivf_trained_topk",
    "x4_kmeans_cells",
    "x4_ivf_recall",
    "x4_ivf_trained_recall",  # composes the two audited chains above
    "x4_int8_topk",  # same bounded query batch, int8-quantized
}


def _iter_jnodes(jnode):
    stack = [jnode]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def test_no_broadcast_hints_on_sf_scaling_relations(spark):
    """A broadcast *hint* is honored unconditionally — AQE cannot demote
    it — so a hint on any relation that grows with the scale factor is
    a guaranteed driver OOM at 100 TB. Only fixed-cardinality tables
    (schemas.BROADCAST_DIMS: region 5 rows, nation 25) may be hinted.

    Detection: walk each query's analyzed logical plan; for every
    ResolvedHint node, classify the hinted subtree's leaf relations by
    their column names (via schemas.SCHEMAS) and flag any leaf whose
    base table is not in BROADCAST_DIMS.
    """
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.schemas import BROADCAST_DIMS, SCHEMAS

    col_to_table = {
        field.name: table for table, schema in SCHEMAS.items() for field in schema.fields
    }
    offenders = {}
    for name, fn in sorted(_batch_queries().items()):
        if name in _ALLOWED_HINTED:
            continue
        analyzed = fn(spark, SF_SMOKE)._jdf.queryExecution().analyzed()
        bad_tables = set()
        for node in _iter_jnodes(analyzed):
            if node.nodeName() != "ResolvedHint":
                continue
            for sub in _iter_jnodes(node):
                if sub.children().size() != 0:
                    continue
                out = sub.output()
                for i in range(out.size()):
                    table = col_to_table.get(out.apply(i).name())
                    if table is not None and table not in BROADCAST_DIMS:
                        bad_tables.add(table)
        if bad_tables:
            offenders[name] = sorted(bad_tables)
    assert not offenders, f"broadcast hints on SF-scaling relations: {offenders}"


def test_core_positional_queries_have_no_global_data_sort(spark):
    """Round-4 certification (VERDICT r3 #1): the driver-checked r09/r10
    ride the scale-safe ordinal — no global (single-partition) sort
    over row-bearing columns anywhere in the physical plan. The only
    unpartitioned sort distributed_ordinal plans is the n_parts-row
    offsets branch, which carries no data columns; ordered top-N must
    plan TakeOrderedAndProject (per-partition top-n), not a full sort."""
    import re

    from odoo_batch_processing_spark.registry import all_queries

    qs = all_queries()
    for name in ("r09_zip_join_update", "r10_limit"):
        plan = qs[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        global_data_sorts = re.findall(
            r"Sort \[[^\]]*(?:l_orderkey|l_linenumber|p_partkey)[^\]]*\], true", plan
        )
        assert not global_data_sorts, (
            f"{name}: global sort on the data path\n{plan[:3000]}"
        )
    top_n_plan = (
        qs["r10_limit"](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in top_n_plan, top_n_plan[:2000]


def test_star_joins_broadcast(spark):
    from odoo_batch_processing_spark.registry import all_queries

    plan = (
        all_queries()["q05_revenue_by_nation"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
