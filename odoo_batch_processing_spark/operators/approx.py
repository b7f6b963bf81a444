"""Approximate + exact distributive aggregates (X8 — 100 TB posture).

At 100 TB, COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(distinct needs a full re-partition by value; exact percentile needs a
sort); the approximate forms are single-pass sketches that merge
map-side (HyperLogLog++ for distinct, KLL/GK for quantiles) — constant
memory, one shuffle of sketch bytes, not rows.

The approx queries have NO oracle entry on purpose: DuckDB's sketches
(different algorithm/seeds) produce different estimates, so the driver
records its weaker rows-only check for them; the exact twins next to
them ARE hash-checked, pinning the semantics the sketches approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odoo_batch_processing_spark.sources.loader import load_table


def _q_x8_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


def _q_x8_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimate (rows-only check; exact twin above)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_supps_approx"),
    )


def _q_x8_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
    )


def _q_x8_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch quantiles (rows-only check; exact twin above)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
    )


def _q_x8_exact_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) + exact percentiles in one per-priority
    aggregation — the hash-checked semantics that x8_approx_aggs
    approximates (same grouping, same measures)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
    )


def _q_x8_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch forms of x8_exact_aggs: HLL++ distinct + GK
    quantiles. Single pass, map-side mergeable, constant memory — the
    100 TB substitutes for the exact twin's distinct re-shuffle + sort.
    Rows-only check by design: sketch estimates are engine-specific."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_custs_approx"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
    )


QUERIES = {
    "x8_exact_aggs": _q_x8_exact_aggs,
    "x8_approx_aggs": _q_x8_approx_aggs,
}

QUERIES_EXT = {
    "x8_exact_distinct": _q_x8_exact_distinct,
    "x8_approx_distinct": _q_x8_approx_distinct,
    "x8_exact_percentiles": _q_x8_exact_percentiles,
    "x8_approx_percentiles": _q_x8_approx_percentiles,
}

ORACLES = {
    "x8_exact_aggs": """
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS n_custs,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90
        FROM orders GROUP BY o_orderpriority
    """,
    # x8_approx_aggs intentionally omitted → driver rows-only check
    # (sketch estimates are engine-specific).
}

ORACLES_EXT = {
    "x8_exact_distinct": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
    "x8_exact_percentiles": """
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90
        FROM orders GROUP BY o_orderpriority
    """,
}
