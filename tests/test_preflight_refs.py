"""tools/preflight_refs.assess — mis-based-vs-degraded distinction."""

from __future__ import annotations

from tools.preflight_refs import assess

REFS = {
    "cpu_calibration_sec": 0.19,
    "io_calibration_sec": 0.12,
    "floor_single_append": 0.86,
    "floor_2file_append_ckpt": 1.35,
}


def test_matching_refs_on_healthy_window_suggest_nothing():
    trials = [dict(REFS), {k: v * 1.1 for k, v in REFS.items()}]
    out = assess(trials, REFS, 1.2)
    assert out["cpu_io_healthy_window"] is True
    assert out["misbased_probes"] == []
    assert out["suggested_refs"] == {}


def test_round12_floor_shape_is_misbased_on_healthy_window():
    # the pre-re-base shape: cpu/io at ref, floors x1.6 — mis-based
    old_refs = dict(REFS, floor_single_append=0.52, floor_2file_append_ckpt=1.08)
    trials = [
        {
            "cpu_calibration_sec": 0.191,
            "io_calibration_sec": 0.103,
            "floor_single_append": 0.862,
            "floor_2file_append_ckpt": 1.344,
        }
    ]
    out = assess(trials, old_refs, 1.2)
    assert out["cpu_io_healthy_window"] is True
    assert set(out["misbased_probes"]) == {
        "floor_single_append",
        "floor_2file_append_ckpt",
    }
    assert out["suggested_refs"]["floor_single_append"] == 0.862


def test_degraded_host_never_suggests_rebase():
    # EVERYTHING elevated x1.5 including cpu/io: degraded host, not
    # bad refs — no suggestions
    trials = [{k: v * 1.5 for k, v in REFS.items()}]
    out = assess(trials, REFS, 1.2)
    assert out["cpu_io_healthy_window"] is False
    assert out["misbased_probes"] == []


def test_best_of_trials_is_used():
    trials = [
        {k: v * 3 for k, v in REFS.items()},  # one stalled trial
        dict(REFS),                            # one clean trial
    ]
    out = assess(trials, REFS, 1.2)
    assert out["cpu_io_healthy_window"] is True
    assert out["misbased_probes"] == []
