"""Grouped-map Pandas operator (applyInPandas) — the per-group custom
transform shape.

Built-ins cover everything the reference computes; this operator
exists for the pipeline cases that genuinely need per-group Python
(model scoring, scipy stats, learned filters). The example computes
per-customer order-value ranks + min-max normalization — chosen
because its outputs are exactly reproducible (rank is integral;
min-max uses one subtraction and one division on the group's own
values).

Plan shape: one shuffle on the grouping key, Arrow batch per group.
Groups must fit in a worker's memory — at 100 TB that means grouping
on keys with bounded fan-in (customer, not country); unbounded groups
want salting + a two-phase merge like operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from odoo_batch_processing_spark.sources.loader import load_table

OUT_SCHEMA = (
    "o_custkey bigint, o_orderkey bigint, value_rank int, value_normed double"
)


def _per_customer(pdf):
    pdf = pdf.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    lo, hi = float(pdf["o_totalprice"].min()), float(pdf["o_totalprice"].max())
    span = hi - lo
    return pdf.assign(
        value_rank=(pdf.index + 1).astype("int32"),
        value_normed=(pdf["o_totalprice"] - lo) / span if span > 0 else 0.0,
    )[["o_custkey", "o_orderkey", "value_rank", "value_normed"]]


def customer_order_ranks(orders: DataFrame) -> DataFrame:
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(_per_customer, OUT_SCHEMA)
    )


def _q_grouped_pandas_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_order_ranks(load_table(spark, sf_dir, "orders"))


QUERIES = {"grouped_pandas_ranks": _q_grouped_pandas_ranks}

ORACLES = {
    # the pandas per-group logic restated in SQL: rank by (price, key),
    # min-max normalize within customer (single-op float arithmetic)
    "grouped_pandas_ranks": """
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS value_rank,
               CASE WHEN MAX(o_totalprice) OVER g = MIN(o_totalprice) OVER g THEN 0.0
                    ELSE (o_totalprice - MIN(o_totalprice) OVER g)
                         / (MAX(o_totalprice) OVER g - MIN(o_totalprice) OVER g)
               END AS value_normed
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
               g AS (PARTITION BY o_custkey)
    """,
}
