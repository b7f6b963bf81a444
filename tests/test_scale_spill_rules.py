"""The spill ladder's certification rules (tools/scale_spill.judge):
exactness under spill, engagement at the bottom rung, graceful
degradation, and rung failures."""

from __future__ import annotations

from tools.scale_spill import GRACE_RATIO, judge


def _rung(mem, agg_sec, sort_sec, agg_spill=0, sort_spill=0,
          agg_hash=11, sort_hash=22):
    return {
        "mem": mem,
        "workloads": {
            "agg": {"sec": agg_sec, "rows": 100, "hash": agg_hash,
                    "memoryBytesSpilled": agg_spill * 4,
                    "diskBytesSpilled": agg_spill},
            "sort": {"sec": sort_sec, "rows": 200, "hash": sort_hash,
                     "memoryBytesSpilled": sort_spill * 4,
                     "diskBytesSpilled": sort_spill},
        },
    }


def test_round12_measured_shape_passes():
    rungs = [
        _rung("8g", 1.24, 4.59),
        _rung("2g", 1.38, 4.10),
        _rung("512m", 1.50, 4.35, agg_spill=152_006_696, sort_spill=390_735_229),
    ]
    assert judge(rungs) == []


def test_results_differ_under_spill_is_flagged():
    rungs = [
        _rung("8g", 1.0, 1.0),
        _rung("512m", 1.2, 1.2, agg_spill=1, agg_hash=999),
    ]
    assert "agg:results_differ_under_spill" in judge(rungs)


def test_no_spill_at_bottom_is_ladder_invalid():
    rungs = [_rung("8g", 1.0, 1.0), _rung("512m", 1.1, 1.1)]
    assert "ladder_invalid:no_spill_at_bottom_rung" in judge(rungs)


def test_cliff_is_not_graceful():
    rungs = [
        _rung("8g", 1.0, 1.0),
        _rung("512m", GRACE_RATIO * 1.0 + 1, 1.1, agg_spill=1),
    ]
    assert "agg:degradation_not_graceful" in judge(rungs)


def test_failed_rung_flags_and_does_not_crash_judge():
    rungs = [
        _rung("8g", 1.0, 1.0),
        {"mem": "512m", "workloads": {}, "error": "OOM"},
    ]
    flags = judge(rungs)
    assert "agg:rung_failed" in flags and "sort:rung_failed" in flags


def test_ordered_digest_is_order_sensitive_and_boundary_invariant(spark):
    """ADVICE r12: the sort receipt must detect a wrong row order. The
    positional polynomial digest must (a) be identical for the same
    sorted output regardless of how many partitions the range
    partitioner used (rung-to-rung boundary placement differs), and
    (b) CHANGE when the key order changes."""
    from tools.scale_spill import _ordered_digest

    df = spark.range(0, 2000).selectExpr(
        "id", "cast(id * 7 % 2000 as string) as v"
    )
    asc_2 = df.repartition(2).orderBy("id")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    n2, d2 = _ordered_digest(asc_2, ["id"])
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    n5, d5 = _ordered_digest(df.repartition(4).orderBy("id"), ["id"])
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert (n2, d2) == (n5, d5)  # boundary/partition-count invariant
    n_desc, d_desc = _ordered_digest(df.orderBy("id", ascending=False), ["id"])
    assert n_desc == n2 and d_desc != d2  # wrong order → different digest


def test_ordered_digest_tie_invariant_but_content_sensitive(spark):
    """Round-13 scope fix: with DUPLICATE sort keys the spill-merge may
    legitimately permute ties (the 512m rung did — orderBy promises no
    stable tie order, and the synthetic lineitem has ~945k duplicate
    key pairs), so the key-sequence component must be tie-invariant;
    row corruption is still caught by the multiset component."""
    from pyspark.sql import functions as F

    from tools.scale_spill import _ordered_digest

    spark.conf.set("spark.sql.shuffle.partitions", "4")
    df = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("payload")
    )
    # two different tie orders of the same sort: secondary order flips
    a = _ordered_digest(df.orderBy("k", F.col("payload").asc()), ["k"])
    b = _ordered_digest(df.orderBy("k", F.col("payload").desc()), ["k"])
    assert a == b  # tie permutation → same receipt
    # corrupt one row's payload: key sequence identical, multiset differs
    corrupt = df.withColumn(
        "payload", F.when(F.col("payload") == 7, F.lit(-1)).otherwise(F.col("payload"))
    )
    c = _ordered_digest(corrupt.orderBy("k", "payload"), ["k"])
    assert c != a  # content change → different receipt


def test_committed_artifact_agrees_with_judge():
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALE_SPILL.json")
    if not os.path.exists(path):
        return
    with open(path) as fh:
        d = json.load(fh)
    assert judge(d["rungs"]) == d["flagged"], judge(d["rungs"])
