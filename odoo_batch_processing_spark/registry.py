"""Catalog of every implemented query and its DuckDB oracle.

``__spark_entry__.py`` (the driver contract) is a thin shim over this
module. Each operator/plan module exports a ``QUERIES`` dict
(name → callable(spark, sf_dir) → DataFrame) and an ``ORACLES`` dict
(name → ANSI SQL for DuckDB); ops that are not SQL-expressible appear
in ``QUERIES`` only and get the driver's weaker rows-only check.

Invariants enforced by tests/test_registry.py:
* every oracle key has a query key;
* names are unique across modules;
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
    "odoo_batch_processing_spark.operators.asof",
    "odoo_batch_processing_spark.operators.bulk_update",
    "odoo_batch_processing_spark.operators.dedup",
    "odoo_batch_processing_spark.operators.similarity",
    "odoo_batch_processing_spark.operators.text",
    "odoo_batch_processing_spark.operators.jsonops",
    "odoo_batch_processing_spark.operators.windows",
    "odoo_batch_processing_spark.operators.approx",
    "odoo_batch_processing_spark.operators.setops",
    "odoo_batch_processing_spark.operators.skew",
    "odoo_batch_processing_spark.operators.grouped",
    "odoo_batch_processing_spark.operators.multimodal",
    "odoo_batch_processing_spark.sources.sinks",
    "odoo_batch_processing_spark.streaming.queries",
)


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

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
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle name {name!r} in {modname}")
            oracles[name] = sql
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracles without queries: {sorted(missing)}")
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
