"""tools/scale_batches flag rules + committed-artifact consistency."""

from __future__ import annotations

from tools.scale_batches import DRIFT_FACTOR, TAIL, WARM, judge


def _rung(k, durs, rows=100000):
    return {"k": k, "wall_sec": sum(durs), "rows": rows, "batch_secs": durs}


def test_flat_history_passes():
    rungs = [
        _rung(8, [0.22] * 8),
        _rung(32, [0.19] * 32),
        _rung(128, [0.17] * 99),
    ]
    assert judge(rungs) == []


def test_late_batch_drift_flagged():
    durs = [0.2] * (WARM + TAIL) + [0.2 + 0.01 * i for i in range(80)]
    rungs = [_rung(8, [0.2] * 8), _rung(128, durs)]
    assert "late_batch_drift" in judge(rungs)


def test_per_batch_superlinear_flagged():
    # per-batch data SHRINKS 1/K, so a top-rung mean above
    # DRIFT_FACTOR x the bottom's means history-scaling overhead
    rungs = [_rung(8, [0.1] * 8), _rung(128, [0.1 * DRIFT_FACTOR + 0.05] * 99)]
    assert "per_batch_superlinear" in judge(rungs)


def test_row_mismatch_flagged():
    rungs = [_rung(8, [0.2] * 8), _rung(128, [0.2] * 99, rows=99999)]
    assert "rows_differ_across_rungs" in judge(rungs)


def test_committed_artifact_agrees_with_judge():
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALE_BATCHES.json")
    if not os.path.exists(path):
        return
    with open(path) as fh:
        d = json.load(fh)
    assert judge(d["results"]) == d["flagged"]
