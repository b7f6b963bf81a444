"""bench.drain — the value-forcing evaluation used by the bench loop
and every scale ladder (round 8). These pin the three contracts that
make it a trustworthy measurement drain; if any regresses, the bench
silently goes back to timing pruned plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bench import drain


def test_drain_forces_pruned_projections(spark):
    """count() lets Catalyst prune a projection's expressions (the
    round-8 finding: from_json absent from the count() plan); drain's
    plan must retain them."""
    df = spark.range(100).select(
        "id",
        F.from_json(
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}")),
            "k int",
        ).alias("parsed"),
    )
    count_plan = df.groupBy().count()._jdf.queryExecution().executedPlan().toString()
    assert "from_json" not in count_plan

    forced = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(df["id"], df["parsed"])).alias("h"),
    )
    forced_plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "from_json" in forced_plan
    assert drain(df) == 100


def test_drain_forces_left_join_subtrees(spark):
    """A row-count-preserving LEFT join lets count() delete the join
    AND its right subtree (the g_triangle_counts finding). drain must
    keep it."""
    left = spark.range(50).select(F.col("id"))
    right = spark.range(10).select(
        "id", F.sha2(F.col("id").cast("string"), 256).alias("fp")
    )
    joined = left.join(right, "id", "left")
    count_plan = (
        joined.groupBy().count()._jdf.queryExecution().executedPlan().toString()
    )
    assert "sha2" not in count_plan  # join eliminated under count()
    forced = joined.select(
        F.bit_xor(F.xxhash64(joined["id"], joined["fp"])).alias("h")
    )
    forced_plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "sha2" in forced_plan
    assert drain(joined) == 50


def test_drain_handles_maps_and_dotted_names(spark):
    """Map columns aren't xxhash64-able (routed through to_json), and
    auto-generated column names contain dots that F.col() would parse
    as field access — drain must survive both."""
    df = spark.range(5).select(
        F.create_map(F.lit("a"), F.col("id")).alias("m"),
        F.col("id").alias("percentile(id, 0.5)"),
    )
    assert drain(df) == 5


def test_drain_handles_nested_maps(spark):
    """xxhash64 rejects MapType at ANY nesting depth (ADVICE r9):
    array<map>, struct-containing-map, and map-valued-map columns must
    all be routed through to_json, not just top-level maps — otherwise
    a catalog query emitting one would bench as failed (-1)."""
    m = F.create_map(F.lit("a"), F.col("id"))
    df = spark.range(5).select(
        F.array(m).alias("arr_of_map"),
        F.struct(F.col("id").alias("k"), m.alias("inner")).alias("struct_with_map"),
        F.create_map(F.lit("outer"), m).alias("map_of_map"),
        F.array(F.struct(m.alias("deep"))).alias("arr_struct_map"),
        F.col("id"),
    )
    assert drain(df) == 5
