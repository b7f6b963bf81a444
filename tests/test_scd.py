"""SCD Type-2 build invariants and point-in-time join semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _toy_changes(spark):
    # user 1: a->a (no-op collapse) ->b, with a same-instant tie at t=20
    # (ids 4 then 5: highest id wins); user 2: single state.
    rows = [
        (1, 1, _ts(0), "a"),
        (2, 1, _ts(10), "a"),   # no-op: collapses into the first interval
        (3, 1, _ts(20), "b"),
        (4, 1, _ts(20), "a"),   # same instant, lower id than 5
        (5, 1, _ts(20), "b"),   # last writer at the instant wins
        (6, 2, _ts(5), "x"),
    ]
    return spark.createDataFrame(
        rows, "change_id bigint, user_id bigint, ts timestamp, attr string"
    )


def test_scd2_collapse_ties_and_versions(spark):
    from odoo_batch_processing_spark.operators.scd import scd2_build

    out = scd2_build(
        _toy_changes(spark), ["user_id"], "ts", "attr", "change_id"
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["version"])
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in u1] == [
        ("a", _ts(0), _ts(20)),   # no-op at t=10 collapsed
        ("b", _ts(20), None),     # max_by tie-break: id 5 ('b') wins id 4
    ]
    assert [r["is_current"] for r in u1] == [False, True]
    assert len(by_user[2]) == 1 and by_user[2][0]["is_current"]


def test_scd2_intervals_partition_time(spark):
    """On the real fixture: per user, intervals are disjoint, adjacent
    (valid_to == next valid_from), exactly one open, and never carry
    two consecutive equal tiers."""
    from odoo_batch_processing_spark.operators.scd import _q_scd2_user_tiers

    hist = _q_scd2_user_tiers(spark, SF_SMOKE)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    checked = hist.select(
        "user_id",
        "tier",
        "valid_from",
        "valid_to",
        "is_current",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("tier").over(w).alias("next_tier"),
    )
    bad_adjacency = checked.filter(
        F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert bad_adjacency == 0
    bad_collapse = checked.filter(
        F.col("next_tier").isNotNull() & (F.col("tier") == F.col("next_tier"))
    ).count()
    assert bad_collapse == 0
    open_per_user = (
        hist.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert open_per_user == 0


def test_pit_matches_interval_containment(spark):
    """The union-window PIT join must equal the naive interval
    equi-join (key + BETWEEN) it replaces."""
    from odoo_batch_processing_spark.operators.scd import (
        _q_pit_tier_at_purchase,
        _q_scd2_user_tiers,
    )
    from odoo_batch_processing_spark.sources.loader import load_table

    fast = _q_pit_tier_at_purchase(spark, SF_SMOKE)
    hist = _q_scd2_user_tiers(spark, SF_SMOKE)
    purchases = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    naive = purchases.join(hist, "user_id").filter(
        (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    ).select(
        "event_id",
        F.col("tier").alias("tier_at_purchase"),
        F.col("version").alias("tier_version"),
    )
    assert fast.count() == purchases.count()
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


def test_scd2_single_shuffle(spark):
    """All three window steps share (user_id → ts) partitioning; the
    physical plan must contain exactly ONE shuffle exchange (plus the
    max_by partial-agg pair collapsing into it)."""
    from odoo_batch_processing_spark.operators.scd import _q_scd2_user_tiers

    plan = (
        _q_scd2_user_tiers(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan[:3000]


def test_asof_carry_hostile_column_names(spark):
    """Dotted carry-column names must survive the struct pack/unpack
    (getField + backticked struct build — the ADVICE-r11 hazard class
    fixed in deterministic_dedup, applied here)."""
    import datetime as dt

    from odoo_batch_processing_spark.operators.scd import asof_join_carry

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t + dt.timedelta(days=2), "f1")], ["k", "ts", "fact"]
    )
    right = spark.createDataFrame(
        [(1, t, "gold", "x")], ["k", "rts", "tier.name", "other"]
    )
    out = asof_join_carry(
        left, right, ["k"], "ts", "rts", ["tier.name"]
    ).collect()
    assert len(out) == 1
    assert out[0].asDict()["tier.name"] == "gold"


def test_asof_carry_hostile_keys_timestamps_and_left_columns(spark):
    """ADVICE r12: the r11 hardening was partial — keys, timestamp
    columns, and pass-through LEFT columns also dot-parse when passed
    as bare strings. All four name positions must survive dots."""
    import datetime as dt

    from odoo_batch_processing_spark.operators.scd import asof_join_carry

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t + dt.timedelta(days=2), "f1"), (2, t, "f2")],
        ["user.id", "event.ts", "fact.col"],
    )
    right = spark.createDataFrame(
        [(1, t, "gold"), (1, t + dt.timedelta(days=1), "silver")],
        ["user.id", "valid.from", "tier.name"],
    )
    rows = {
        r.asDict()["user.id"]: r.asDict()
        for r in asof_join_carry(
            left,
            right,
            ["user.id"],
            "event.ts",
            "valid.from",
            ["tier.name"],
        ).collect()
    }
    assert rows[1]["tier.name"] == "silver"  # latest ≤ left ts
    assert rows[1]["fact.col"] == "f1"  # dotted left column passed through
    assert rows[2]["tier.name"] is None  # key 2 has no dim history
