"""Catalog of every implemented query and its DuckDB oracle.

``__spark_entry__.py`` (the driver contract) is a thin shim over this
module. Each operator/plan module exports a ``QUERIES`` dict
(name → callable(spark, sf_dir) → DataFrame) and an ``ORACLES`` dict
(name → ANSI SQL for DuckDB); ops that are not SQL-expressible appear
in ``QUERIES`` only and get the driver's weaker rows-only check.

Two tiers:

* **core** (``QUERIES``/``ORACLES``) — the driver-facing catalog,
  capped at :data:`CORE_CAP` entries so the driver's bounded
  correctness run (first 50 queries) covers EVERY operator family.
  One representative query per operator; merged queries note which
  ops they fold in.
* **extended** (``QUERIES_EXT``/``ORACLES_EXT``) — redundant variants
  and micro-queries kept oracle-checkable locally
  (``tools/oracle_check.py --extended``) and exercised by tests, but
  outside the driver's window by design.

Invariants enforced by tests/test_registry.py:
* every oracle key has a query key;
* names are unique across modules AND across tiers;
* the core tier has at most CORE_CAP entries;
* every query returns a DataFrame with at least one column, and
  column names match between the Spark result and the oracle result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "odoo_batch_processing_spark.plans.analytics",
    "odoo_batch_processing_spark.plans.advanced",
    "odoo_batch_processing_spark.plans.tpch_rest",
    "odoo_batch_processing_spark.operators.asof",
    "odoo_batch_processing_spark.operators.scd",
    "odoo_batch_processing_spark.operators.bulk_update",
    "odoo_batch_processing_spark.operators.dedup",
    "odoo_batch_processing_spark.operators.similarity",
    "odoo_batch_processing_spark.operators.text",
    "odoo_batch_processing_spark.operators.curation",
    "odoo_batch_processing_spark.operators.jsonops",
    "odoo_batch_processing_spark.operators.windows",
    "odoo_batch_processing_spark.operators.approx",
    "odoo_batch_processing_spark.operators.setops",
    "odoo_batch_processing_spark.operators.skew",
    "odoo_batch_processing_spark.operators.grouped",
    "odoo_batch_processing_spark.operators.graph",
    "odoo_batch_processing_spark.operators.pyapi",
    "odoo_batch_processing_spark.operators.multimodal",
    "odoo_batch_processing_spark.operators.profile",
    "odoo_batch_processing_spark.operators.ivm",
    "odoo_batch_processing_spark.sources.sinks",
    "odoo_batch_processing_spark.sources.pyds",
    "odoo_batch_processing_spark.sources.layout",
    "odoo_batch_processing_spark.streaming.queries",
)


#: The driver's correctness run records exactly the first 50 catalog
#: entries; the core tier must fit inside that window.
CORE_CAP = 50

#: Round-14 core-window rotation (VERDICT r13 #1): the driver's DuckDB
#: harness is the only verification not built by this repo, and it had
#: audited the same 50 queries for several rounds. Eight long-stable
#: core representatives moved to the extended tier (still DuckDB-
#: oracle-checked locally every round via tools/oracle_check.py
#: --extended) and their strongest extended-tier siblings took their
#: core slots, so the independent harness now audits queries previously
#: verified only by the repo's own tooling. Every SURVEY §2 family
#: keeps at least one core row (X1: q01/q03/q09/expr_breadth; X3:
#: five others + the promoted containment; X4: cosine/trained_recall/
#: trained_topk; X5: text_features + bm25; X7: sessionize +
#: interval_sweep; X8: hll_merge; X9: curation/pack_shards/
#: weighted_sample), and graph + profiling gain first-ever driver rows.
ROTATION_R14 = {
    "q05_revenue_by_nation": "g_pagerank_simgraph",
    "q22_inactive_customers": "profile_checksum",
    "x3_ngram_jaccard": "x3_containment",
    "x4_ivf_topk": "x4_ivf_trained_topk",
    "x5_tfidf_top_terms": "x5_bm25_topk",
    "x9_source_mix": "x9_weighted_sample",
    "x7_sliding_windows": "w_interval_sweep",
    "x8_approx_aggs": "x8_hll_merge",
}

#: Round-15 rotation (VERDICT r14 #4/#5), second tranche of the same
#: discipline: nine more long-stable core representatives trade places
#: with extended-tier siblings the external harness has never audited.
#: Notable slots: the standing MinHash INDEX path (its hot-bucket cap
#: is now the scan-local bucket_n filter landed this round) replaces
#: the recompute LSH; the SCD2 history build and the exact triangle
#: counter give the slowly-changing-dimension and graph families new
#: external coverage; and ``s_r22_manifest_counts`` — the manifest-fed
#: Python DataSource twin of the R22 counts — is the round's one NEW
#: catalog entry (187 total), giving the newest subsystem (manifest
#: ingest, zero prior driver coverage) a driver-window row. Everything
#: rotated out stays DuckDB-checked locally per round via
#: tools/oracle_check.py --extended.
ROTATION_R15 = {
    "x3_minhash_lsh": "x3_minhash_indexed",
    "x3_simhash": "g_triangle_counts",
    "x4_cosine_topk": "x4_int8_topk",
    "x5_text_features": "x5_unigram_surprisal",
    "x9_pack_shards": "x9_group_sample",
    "x6_json_grouped": "x6_variant_shred",
    "x7_sessionize": "w_gap_fill_ffill",
    "q03_top_orders": "scd2_user_tiers",
    "s_r22_change_counts": "s_r22_manifest_counts",
}


#: Round-16 rotation (VERDICT r15 #1/#2), third tranche: eight more
#: long-stable core representatives trade places with never-audited
#: extended-tier siblings. Two swaps do double duty: the exact
#: triangle counter (14.95 s = 34% of the r15 batch headline) vacates
#: the window — its seat goes to ``ivm_refresh``, the incremental-
#: view-maintenance subsystem's FIRST driver row (the r15-manifest
#: precedent), NOT to ``g_doulion_triangles``, whose catalog form
#: embeds the exact pass for its est_ok certification and measured
#: ~1.35× the exact counter at sf0.1 (see graph.py) — and the batch
#: incremental near-dup hands its slot to the streaming twin
#: ``s_x3_stream_incremental_neardup``, the X3 family's first
#: streaming driver row. ``pit_tier_at_purchase`` gives the SCD family
#: its point-in-time probe next to the history build;
#: ``x4_ivf_indexed_multiprobe`` audits the standing-IVF-index probe
#: path (the ANN analogue of x3_minhash_indexed). Everything rotated
#: out stays DuckDB-checked locally per round via
#: tools/oracle_check.py --extended.
ROTATION_R16 = {
    "g_triangle_counts": "ivm_refresh",
    "x5_bm25_topk": "x5_gopher_repetition",
    "w_interval_sweep": "w_rolling_median5",
    "x4_ivf_trained_topk": "x4_ivf_indexed_multiprobe",
    "x3_incremental_neardup": "s_x3_stream_incremental_neardup",
    "asof_last_purchase": "pit_tier_at_purchase",
    "x9_weighted_sample": "x9_difficulty_deciles",
    "x2_dedup_survivors": "x7_event_transitions",
}


#: Round-17 rotation (VERDICT r16 #2), fourth tranche, drawn entirely
#: from the never-audited set the external-coverage debt accounting
#: names: GROUPING SETS, the recursive-CTE hierarchy, the funnel-step
#: sequence matcher, the MAD robust-outlier profile, the DQ
#: expectations engine and the GDPR crypto-shred each face the
#: driver's independent DuckDB harness for the first time, and the
#: storage-layout (``lake_*``) and non-parquet-source (``src_*``)
#: families get their first driver rows ever (the compaction rewrite
#: — NEW this round — and the JSONL roundtrip). Seats come from
#: long-stable representatives: three R-rows audited every round
#: since round 1 (r06/r13_r14/r20 — the bulk family keeps five core
#: rows), expr_breadth (stable since round 2), and the twice-audited
#: r15 promotions w_gap_fill_ffill / x9_group_sample /
#: scd2_user_tiers (the SCD seat stays with pit_tier_at_purchase,
#: which composes the same history build). profile_checksum hands the
#: profiling seat to the robust-outlier profile directly. Everything
#: rotated out stays DuckDB-checked locally per round via
#: tools/oracle_check.py --extended.
ROTATION_R17 = {
    "x9_group_sample": "x9_crypto_shred",
    "w_gap_fill_ffill": "x7_funnel_steps",
    "expr_breadth": "agg_grouping_sets",
    "r06_counts": "sql_recursive_hierarchy",
    "r13_r14_coerce_clamp": "dq_expectations",
    "profile_checksum": "profile_robust_outliers",
    "r20_coalesce_cascade": "lake_compact_roundtrip",
    "scd2_user_tiers": "src_jsonl_roundtrip",
}


def _collect(extended: bool = False) -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    q_attrs = ("QUERIES", "QUERIES_EXT") if extended else ("QUERIES",)
    o_attrs = ("ORACLES", "ORACLES_EXT") if extended else ("ORACLES",)
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError as exc:
            # Skip ONLY when the module itself is absent (not built yet
            # in an incremental round). A ModuleNotFoundError raised by
            # an import *inside* an existing module (missing transitive
            # dep, typo'd import) must fail loudly — swallowing it would
            # silently drop a whole query family from the catalog.
            if exc.name != modname:
                raise
            continue
        for attr in q_attrs:
            for name, fn in getattr(mod, attr, {}).items():
                if name in queries:
                    raise ValueError(f"duplicate query name {name!r} in {modname}")
                queries[name] = fn
        for attr in o_attrs:
            for name, sql in getattr(mod, attr, {}).items():
                if name in oracles:
                    raise ValueError(f"duplicate oracle name {name!r} in {modname}")
                oracles[name] = sql
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracles without queries: {sorted(missing)}")
    return queries, oracles


def all_queries(extended: bool = False) -> dict[str, QueryFn]:
    return _collect(extended)[0]


def all_oracles(extended: bool = False) -> dict[str, str]:
    return _collect(extended)[1]
