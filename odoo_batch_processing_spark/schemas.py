"""Explicit StructType schemas for every source table.

The reference discovers types dynamically from DOM editor widgets at
write time (Odoo-Batch-Processing.user.js:586-590, 624-664); the engine
inverts that into schema-on-read: every parquet scan declares its
schema so a bad file fails fast and the scan never pays an inference
pass (at 100 TB an inference pass is a full extra read of the footer
set). Column types verified against the driver fixtures' parquet
footers (FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
#: across fixture generations. NANOS Spark 4 cannot read natively — with
#: spark.sql.legacy.parquet.nanosAsLong=true it arrives as int64
#: nanoseconds and the loader floor-converts; MICROS reads straight into
#: TimestampType. The loader probes the parquet footer (one driver-side
#: metadata read, no data scan) and picks the matching read schema via
#: :func:`events_schema` — never trust a constant over the footer.


def events_schema(ts_unit: str) -> T.StructType:
    """events read schema for the probed ``ts`` physical unit
    (``'ns'`` → int64-nanos via nanosAsLong, else TimestampType)."""
    ts_type: T.DataType = T.LongType() if ts_unit == "ns" else T.TimestampType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # Default events shape (MICROS ts). Actual reads go through
    # loader.load_table / streaming.change_source, which probe the
    # footer and may swap in events_schema("ns") instead.
    "events": events_schema("us"),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(SCHEMAS)

#: Tables whose cardinality is FIXED regardless of scale factor
#: (region: 5 rows, nation: 25) — the only relations that may carry an
#: explicit ``F.broadcast()`` hint, because a hint is honored
#: unconditionally (AQE cannot demote it). Everything SF-scaling
#: (customer, supplier, part, orders, derived per-key aggregates) must
#: stay hint-free and rely on spark.sql.autoBroadcastJoinThreshold +
#: AQE, which broadcast them while small and fall back to shuffled
#: joins at 100 TB. Enforced by tests/test_plan_hygiene.py.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation"})

#: The reference treats DOM row order as load-bearing (SURVEY.md §1.1);
#: DataFrames are unordered, so positional operators (R1/R9/R10) derive
#: an ordinal with row_number() over these per-table sort keys.
ORDINAL_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
