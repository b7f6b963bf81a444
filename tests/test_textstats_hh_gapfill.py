"""Unit tests for the round-4 additions the oracle gate can't stress
directly: the Misra–Gries guarantee on an adversarial stream, the
n-gram empty-array guards, and gap-fill forward-fill semantics on a
hand-built stream with known gaps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_heavy_hitters_exact_on_adversarial_stream(spark):
    """Many distinct rare items try to evict the heavy ones from the
    per-partition summaries; the recount still returns EXACTLY the
    items with count > n/k (and their exact counts)."""
    from odoo_batch_processing_spark.operators.approx import heavy_hitters

    rows = (
        [("hot",)] * 100
        + [("warm",)] * 40
        + [(f"rare{i}",) for i in range(200)]
    )
    # n = 340, k = 8 → threshold n/k = 42.5: only 'hot' qualifies
    df = spark.createDataFrame(rows, "token string").repartition(7)
    out = heavy_hitters(df, "token", k=8).collect()
    assert [(r["token"], r["cnt"]) for r in out] == [("hot", 100)]


def test_heavy_hitters_all_below_threshold_is_empty(spark):
    from odoo_batch_processing_spark.operators.approx import heavy_hitters

    df = spark.createDataFrame(
        [(f"t{i % 20}",) for i in range(100)], "token string"
    ).repartition(4)
    # uniform 20-way split, k=40 → threshold 2.5 < 5 — all qualify;
    # with k=10 → threshold 10 > 5 — none do
    assert heavy_hitters(df, "token", k=10).count() == 0
    assert heavy_hitters(df, "token", k=40).count() == 20


def test_ngram_guards_short_docs(spark):
    """sequence(1, 0) would count DOWN in Spark — the <n guard must
    yield an EMPTY array, not a bogus descending-index bigram."""
    from odoo_batch_processing_spark.operators.text import _bigrams, _trigrams, tokens

    df = spark.createDataFrame(
        [("one",), ("two words",), ("now three words",)], "text string"
    )
    rows = df.select(
        _bigrams(tokens(F.col("text"))).alias("bg"),
        _trigrams(tokens(F.col("text"))).alias("tg"),
    ).collect()
    assert [r["bg"] for r in rows] == [
        [],
        ["two words"],
        ["now three", "three words"],
    ]
    assert [r["tg"] for r in rows] == [[], [], ["now three words"]]


def test_gap_fill_forward_fills_through_gaps(spark, tmp_path):
    """User with events in hours 0 and 3: hours 1-2 are synthesized,
    unobserved, and carry hour 0's value forward."""

    base = dt.datetime(2024, 1, 1, 0, 30, 0, tzinfo=dt.timezone.utc)

    def ns(hours: float) -> int:  # fixture stores ts as int64 nanoseconds
        return int((base + dt.timedelta(hours=hours)).timestamp() * 1_000_000_000)

    rows = [
        (1, ns(0.0), 100, "click", 10.0, "{}"),
        (2, ns(0.2), 100, "click", 2.5, "{}"),
        (3, ns(3.0), 100, "click", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    sf_dir = str(tmp_path / "sf")
    df.write.parquet(f"{sf_dir}/events.parquet")

    from odoo_batch_processing_spark.operators import windows as W

    out = sorted(
        W._q_gap_fill_ffill(spark, sf_dir).collect(), key=lambda r: r["hour"]
    )
    assert len(out) == 4  # hours 0..3 inclusive
    assert [r["observed"] for r in out] == [True, False, False, True]
    assert [r["hour_value"] for r in out] == [12.5, None, None, 7.0]
    assert [r["filled_value"] for r in out] == [12.5, 12.5, 12.5, 7.0]


def test_pagerank_hub_outranks_leaves(spark):
    """Star graph (hub 0 ↔ leaves 1..5, symmetrized): the hub
    concentrates rank, leaves tie exactly, and total mass stays ≈ 1
    (no dangling loss — every vertex has an out-edge)."""
    from odoo_batch_processing_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)],
        "src bigint, dst bigint",
    )
    out = {r["id"]: (r["deg"], r["rank"]) for r in pagerank(edges, iters=3).collect()}
    assert out[0][0] == 5
    leaf_ranks = {out[i][1] for i in range(1, 6)}
    assert len(leaf_ranks) == 1  # exact tie — fixed-point arithmetic
    assert out[0][1] > 3 * out[1][1]
    total = sum(r for _, r in out.values())
    assert abs(total - 1.0) < 1e-6  # quantization loss ≤ deg·1e-12·iters


def test_table_checksum_order_and_partition_invariant(spark):
    """Same content in any row order / partitioning → same checksum;
    any single-row change flips it."""
    from odoo_batch_processing_spark.operators.profile import table_checksum

    rows = [(i, f"text-{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id bigint, text string").coalesce(1)
    ca = table_checksum(a, ("doc_id", "text")).first()
    cb = table_checksum(b, ("doc_id", "text")).first()
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])

    mutated = [(i, f"text-{i}" if i != 50 else "TAMPERED") for i in range(100)]
    c = spark.createDataFrame(mutated, "doc_id bigint, text string")
    cc = table_checksum(c, ("doc_id", "text")).first()
    assert cc["checksum"] != ca["checksum"]


def test_pagerank_keeps_source_only_vertices(spark):
    """A vertex with out-edges but no in-edges (allowed by the
    precondition) must appear in the output with base-mass rank and
    keep contributing its own mass — not be silently dropped."""
    from odoo_batch_processing_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    out = {r["id"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    assert set(out) == {1, 2, 3}
    base = 0.15 / 3
    assert abs(out[1] - base) < 1e-9  # no in-edges → base mass only
    assert out[2] > out[3] > out[1]  # 2 receives from both 1 and 3
