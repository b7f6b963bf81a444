"""Curation operators: PII scrub, quality gates, deterministic
sampling — edge cases the sf fixtures don't cover (empty docs,
all-PII strings, engine-stable sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_scrub_pii_replaces_all_occurrences(spark):
    from odoo_batch_processing_spark.operators.curation import scrub_pii

    df = spark.createDataFrame(
        [("a@b.com text c@d.org call 555-123-4567 and 555-999-0000",)], "text string"
    )
    out = df.select(scrub_pii(F.col("text")).alias("s")).head()["s"]
    assert out == "<EMAIL> text <EMAIL> call <PHONE> and <PHONE>"


def test_quality_gate_empty_doc_fails_first_rule(spark):
    from odoo_batch_processing_spark.operators.curation import (
        _gate_columns,
        quality_gate,
    )

    df = spark.createDataFrame([("",), ("   ",)], "text string")
    passes, reason = quality_gate(_gate_columns())
    rows = df.select(passes.alias("p"), reason.alias("r")).collect()
    for row in rows:
        assert row["p"] is False
        assert row["r"] == "token_count"  # first failing rule wins


def test_hash_sample_is_deterministic_and_partition_independent(spark):
    from odoo_batch_processing_spark.operators.curation import SAMPLE_PCT, hash_bucket

    ids = spark.range(0, 10_000)
    kept1 = {r["id"] for r in ids.filter(hash_bucket(F.col("id")) < SAMPLE_PCT).collect()}
    kept2 = {
        r["id"]
        for r in ids.repartition(13)
        .filter(hash_bucket(F.col("id")) < SAMPLE_PCT)
        .collect()
    }
    assert kept1 == kept2  # membership depends only on the key
    assert 0.05 < len(kept1) / 10_000 < 0.15  # roughly the target rate


def test_top_token_ratio_matches_count_form(spark):
    """The sorted-run fold must equal the count-per-distinct-token
    definition on real corpus text plus crafted edges (ties, all-same,
    single token, empty)."""
    from pyspark.sql import functions as F

    from odoo_batch_processing_spark.operators.curation import top_token_ratio
    from odoo_batch_processing_spark.operators.text import tokens
    from odoo_batch_processing_spark.sources.loader import load_table

    def count_form(text):
        toks = tokens(text)
        counts = F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
        return F.array_max(counts).cast("double") / F.when(
            F.size(toks) > 0, F.size(toks)
        )

    edges = spark.createDataFrame(
        [("a b a b",), ("x x x",), ("solo",), ("",), ("  ",), ("b a a b b",)],
        "text string",
    )
    corpus = load_table(spark, "/root/testdata/sf0.001", "documents").select("text")
    for df in (edges, corpus):
        rows = df.select(
            top_token_ratio(F.col("text")).alias("fast"),
            count_form(F.col("text")).alias("slow"),
        ).collect()
        assert rows, "fixture should not be empty"
        for r in rows:
            assert r["fast"] == r["slow"], (r["fast"], r["slow"])


def test_epoch_shuffle_is_a_deterministic_permutation(spark):
    """Positions are exactly 1..N; the same seed reproduces the epoch;
    the bucketed plan equals the one-window definition; a different
    seed yields a genuinely different order."""
    from pyspark.sql import Window, functions as F

    from odoo_batch_processing_spark.operators.curation import (
        _q_x9_epoch_shuffle,
        epoch_shuffle_key,
    )

    sf = "/root/testdata/sf0.001"
    got = _q_x9_epoch_shuffle(spark, sf)
    rows = {r["doc_id"]: r["shuffle_pos"] for r in got.collect()}
    n = len(rows)
    assert sorted(rows.values()) == list(range(1, n + 1))

    again = {r["doc_id"]: r["shuffle_pos"] for r in _q_x9_epoch_shuffle(spark, sf).collect()}
    assert rows == again

    # one-window reference form (fine at test scale)
    from odoo_batch_processing_spark.sources.loader import load_table

    docs = load_table(spark, sf, "documents")
    w = Window.orderBy(epoch_shuffle_key(F.col("doc_id")), "doc_id")
    ref = {
        r["doc_id"]: r["pos"]
        for r in docs.select(
            "doc_id", F.row_number().over(w).cast("bigint").alias("pos")
        ).collect()
    }
    assert rows == ref

    other = {
        r["doc_id"]: r["pos"]
        for r in docs.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(epoch_shuffle_key(F.col("doc_id"), seed=99), "doc_id"))
            .cast("bigint")
            .alias("pos"),
        ).collect()
    }
    assert other != rows  # an independent permutation, not a relabeling


def test_fixed_size_group_sample_exact_k_and_deterministic(spark):
    """Every group yields exactly min(k, |group|) rows, the draw is
    identical across runs, and a different seed draws a different
    (same-sized) sample."""
    from odoo_batch_processing_spark.operators.curation import (
        fixed_size_group_sample,
    )

    df = spark.createDataFrame(
        [(i, "big" if i % 3 else "small") for i in range(90)], "id bigint, grp string"
    )
    a = fixed_size_group_sample(df, "grp", "id", 10, seed=7)
    sizes = {r["grp"]: r["n"] for r in a.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 10, "small": 10}
    b = fixed_size_group_sample(df, "grp", "id", 10, seed=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = fixed_size_group_sample(df, "grp", "id", 10, seed=8)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))
    # k larger than the group: the whole group comes back
    tiny = fixed_size_group_sample(df.filter("id < 4"), "grp", "id", 10, seed=7)
    assert tiny.count() == 4


def test_observed_metrics_fill_from_the_same_action(spark):
    """observe() counters must match a separately-computed aggregate
    while costing zero extra jobs — the curation pipeline's keep/drop
    health counters ride the action that materializes the keep-set."""
    from pyspark.sql import functions as F

    from odoo_batch_processing_spark.operators.curation import observed

    from tests.conftest import SF_SMOKE
    from odoo_batch_processing_spark.sources.loader import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    kept = docs.filter(F.col("n_chars") >= 100)
    gated, obs = observed(
        kept,
        "keepset",
        F.count(F.lit(1)).alias("rows_kept"),
        F.sum(F.col("n_chars").cast("bigint")).alias("chars_kept"),
        F.min("doc_id").alias("first_doc"),
    )
    n_action = gated.count()  # the ONE action; metrics fill as a side effect
    m = obs.get
    assert m["rows_kept"] == n_action
    expected = kept.agg(
        F.sum(F.col("n_chars").cast("bigint")), F.min("doc_id")
    ).first()
    assert m["chars_kept"] == expected[0]
    assert m["first_doc"] == expected[1]
