"""The state-volume ladder's flag rules (tools/scale_state.judge):
wall superlinearity gated by an absolute floor, ladder validity
(the knob must actually move state), and the watermark bound."""

from __future__ import annotations

from tools.scale_state import BOUND_FRACTION, SHAPES, judge

N_ROWS = 100_000


def _res(shape_overrides):
    """Healthy defaults for every shape, overridden per test."""
    base = {
        "dedup_wm": ([3.0, 3.1, 3.4], [1700, 6700, 27000]),
        "ss_join": ([4.0, 4.2, 4.8], [2500, 10000, 40000]),
        "totals": ([3.0, 3.1, 3.2], [2000, 8000, 32000]),
        "hourly_complete": ([3.0, 3.2, 3.6], [720, 2880, 11520]),
        "hourly_wm": ([3.0, 3.0, 3.1], [3, 3, 4]),
    }
    base.update(shape_overrides)
    return {
        shape: [
            {"sec": s, "state": {"numRowsTotal": st}}
            for s, st in zip(secs, states)
        ]
        for shape, (secs, states) in base.items()
    }


def test_healthy_shapes_unflagged():
    flags = judge(_res({}), N_ROWS)
    assert all(f == [] for f in flags.values()), flags


def test_wall_superlinear_needs_ratio_and_floor():
    # ratio 4x but growth under the 1s floor: cheap-stage misfire guard
    flags = judge(_res({"totals": ([0.2, 0.3, 0.9], [2000, 8000, 32000])}), N_ROWS)
    assert flags["totals"] == []
    # ratio and floor both cleared: flagged
    flags = judge(_res({"totals": ([2.0, 4.0, 9.0], [2000, 8000, 32000])}), N_ROWS)
    assert flags["totals"] == ["wall_superlinear"]


def test_ladder_invalid_when_knob_does_not_move_state():
    flags = judge(_res({"dedup_wm": ([3.0, 3.0, 3.0], [1700, 1800, 1900])}), N_ROWS)
    assert flags["dedup_wm"] == ["ladder_invalid"]


def test_hourly_wm_flat_state_is_not_ladder_invalid():
    # hourly_wm is DESIGNED flat (growth_expected=False): flat ≠ invalid
    flags = judge(_res({}), N_ROWS)
    assert flags["hourly_wm"] == []
    assert SHAPES["hourly_wm"][2] is False


def test_state_unbounded_on_watermark_shapes():
    too_much = int(BOUND_FRACTION * N_ROWS) + 1
    flags = judge(
        _res({"dedup_wm": ([3.0, 3.1, 3.4], [1700, 6700, too_much])}), N_ROWS
    )
    assert flags["dedup_wm"] == ["state_unbounded"]
    # unbounded-by-design shapes (hourly_complete) are exempt
    flags = judge(
        _res({"hourly_complete": ([3.0, 3.2, 3.6], [720, 2880, too_much])}),
        N_ROWS,
    )
    assert flags["hourly_complete"] == []


def test_committed_artifacts_agree_with_judge():
    """Re-derive flags from the committed SCALE_STATE artifacts: the
    recorded verdict and the current rule implementation must agree
    (guards against editing one without the other)."""
    import json
    import os

    from tools.scale_state import judge as state_judge

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("SCALE_STATE.json", "SCALE_STATE_rocksdb.json"):
        path = os.path.join(repo, name)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            d = json.load(fh)
        results = {s: v["rungs"] for s, v in d["shapes"].items()}
        flags = state_judge(results, d["n_input_rows"])
        recorded = {s: v["flags"] for s, v in d["shapes"].items()}
        assert flags == recorded, (name, flags, recorded)
        assert sorted(s for s, f in flags.items() if f) == d["flagged"]
