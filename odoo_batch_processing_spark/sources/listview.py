"""Synthesized ``listview`` fixture — the Odoo list view as a DataFrame.

Models what the reference operates on (SURVEY.md §1, FIXTURES.md §B):
rows with a load-bearing position, visibility (UI filter), per-cell
editability/read-only flags, and typed widget columns. Used by the
unit tests to assert *exact reference semantics* (R9 truncation, R13
coercion, R14 clamp) that the DuckDB oracles — which only prove SQL
equivalence — can't pin down.

Generation is fully deterministic WITHOUT an RNG: every attribute is
derived from xxhash64 of the row id, so the fixture is identical across
runs/partitions and the generator itself is a distributed Spark plan
(spark.range scales to any row count with no driver-side data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _bucket(seed: str, mod: int):
    return F.pmod(F.xxhash64(F.lit(seed), F.col("row_id")), F.lit(mod))


def make_listview(spark: SparkSession, n_rows: int = 1000) -> DataFrame:
    """~30% hidden, ~10% readonly, ~5% non-editable (FIXTURES.md §B)."""
    return (
        spark.range(n_rows)
        .select(
            (F.col("id") + 1).alias("row_ord"),
            (F.col("id") * 7 + 13).alias("row_id"),
        )
        .withColumn("visible", _bucket("vis", 10) < 7)
        .withColumn("editable", _bucket("edit", 20) < 19)
        .withColumn("readonly", _bucket("ro", 10) < 1)
        .withColumn("name", F.concat(F.lit("rec_"), F.col("row_id")))
        .withColumn("qty", _bucket("qty", 100).cast("int"))
        .withColumn("active", _bucket("act", 2) == 0)
        .withColumn("partner_id", _bucket("ptn", 50).cast("bigint"))
    )


def make_partner_dim(spark: SparkSession) -> DataFrame:
    """The many2one target (user.js:645-648): a 50-row dimension."""
    return spark.range(50).select(
        F.col("id").alias("partner_id"),
        F.concat(F.lit("partner_"), F.col("id")).alias("partner_name"),
    )
