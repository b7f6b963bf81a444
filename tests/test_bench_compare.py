"""tools/bench_compare.py — replay the r8→r9→r10 adjudications.

The tool exists so perf adjudication stops being narrative (VERDICT
r10 #2); this test pins that the mechanized rules reproduce the three
adjudications those rounds actually made:

* r8→r9: `x3_minhash_lsh` ×1.77 is flagged (it was the r9 watch item)
  and nothing else is;
* r9→r10: the streaming jitter (×1.15–1.19) is NOT flagged and the
  minhash recovery shows as improvement — i.e. r10's "host noise"
  verdict;
* raw reps make the rule sharper: the r9 minhash rep spread
  (2.36/11.45/7.98/2.27/2.79, SCALE.md) OVERLAPS the r10 reps, so
  all-reps separation calls it "improved", not a coin-flip;
* unlabeled or mismatched `drain` refuses; a calibration_boundary
  crossing needs the recorded 1.4157 bridge and then reproduces the
  retroactive "r9 passed the r8 gate" finding (bridged ratio ≈1.11).
"""

from __future__ import annotations

import json
import os

import pytest

from tools.bench_compare import (
    IncomparableError,
    NOISE_FACTOR,
    compare_artifacts,
    load_artifact,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _art(name):
    return load_artifact(os.path.join(REPO, name))


def test_r8_to_r9_flags_exactly_the_minhash_blip():
    res = compare_artifacts(
        _art("BENCH_r08.json"),
        _art("BENCH_r09.json"),
        assume={"old_drain": "forcing-v2"},
        calibration_bridge=1.4157,
    )
    assert res["flagged"] == ["x3_minhash_lsh"]
    assert res["verdicts"]["x3_minhash_lsh"]["ratio"] > NOISE_FACTOR
    # the retroactive r9 finding: bridged yardstick ratio ~1.11, i.e.
    # r9 PASSED the r8 gate once the boundary change is bridged
    assert res["calibration"]["bridged"]
    assert res["calibration"]["ratio"] == pytest.approx(1.111, abs=0.01)


def test_r9_to_r10_streaming_jitter_not_flagged():
    res = compare_artifacts(_art("BENCH_r09.json"), _art("BENCH_r10.json"))
    assert res["flagged"] == []  # ×1.15–1.19 streaming swings pass
    assert "x3_minhash_lsh" in res["improved"]  # the blip reverted
    # boundary: r9 predates the field → calibration context withheld
    assert not res["calibration"]["comparable"]
    res2 = compare_artifacts(
        _art("BENCH_r09.json"),
        _art("BENCH_r10.json"),
        assume={"old_boundary": "hoisted-v2"},
    )
    assert res2["calibration"]["comparable"]


def _mk(queries, runs=None, **meta):
    meta.setdefault("drain", "forcing-v2")
    return {"queries": queries, "runs": runs, "meta": meta}


def test_all_reps_separation_rule():
    # the r9 minhash reps overlap the r10 reps → improved, not flagged
    r9 = {"x3_minhash_lsh": [2.36, 11.45, 7.98, 2.27, 2.79]}
    r10 = {"x3_minhash_lsh": [1.87, 1.54, 1.69, 1.44, 1.30]}
    res = compare_artifacts(
        _mk({q: min(r) for q, r in r9.items()}, r9),
        _mk({q: min(r) for q, r in r10.items()}, r10),
    )
    assert res["mode"] == "all-reps"
    assert res["verdicts"]["x3_minhash_lsh"]["verdict"] == "improved"

    # separation: best new rep worse than worst old rep → flagged
    res = compare_artifacts(
        _mk({"q": 1.0}, {"q": [1.0, 1.1, 1.2]}),
        _mk({"q": 1.3}, {"q": [1.3, 1.35, 1.4]}),
    )
    assert res["flagged"] == ["q"]

    # overlap in either direction → same, even at a 1.4x min ratio
    res = compare_artifacts(
        _mk({"q": 1.0}, {"q": [1.0, 1.5]}),
        _mk({"q": 1.4}, {"q": [1.4, 1.6]}),
    )
    assert res["verdicts"]["q"]["verdict"] == "same"


def test_one_sided_reps_use_old_spread():
    # new side is a min only; it sits inside the old spread → same
    res = compare_artifacts(
        _mk({"q": 1.0}, {"q": [1.0, 1.8]}), _mk({"q": 1.6})
    )
    assert res["mode"] == "one-sided-reps"
    assert res["verdicts"]["q"]["verdict"] == "same"
    res = compare_artifacts(
        _mk({"q": 1.0}, {"q": [1.0, 1.2]}), _mk({"q": 1.3})
    )
    assert res["flagged"] == ["q"]


def test_drain_gate():
    with pytest.raises(IncomparableError, match="unlabeled"):
        compare_artifacts(_mk({"q": 1.0}, drain=None), _mk({"q": 1.0}))
    with pytest.raises(IncomparableError, match="drain mismatch"):
        compare_artifacts(
            _mk({"q": 1.0}, drain="count-v1"), _mk({"q": 1.0})
        )
    # an assume flag must not overrule a labeled artifact
    with pytest.raises(IncomparableError, match="assume"):
        compare_artifacts(
            _mk({"q": 1.0}),
            _mk({"q": 1.0}),
            assume={"old_drain": "count-v1"},
        )


def test_io_yardstick_is_context_only():
    # both sides carry the same probe → io_ratio reported as context;
    # a mismatched or absent probe stays silent; verdicts unaffected
    res = compare_artifacts(
        _mk(
            {"q": 1.0},
            io_calibration_sec=0.2,
            io_calibration_probe="smallfile-fsync-v1",
        ),
        _mk(
            {"q": 1.0},
            io_calibration_sec=0.5,
            io_calibration_probe="smallfile-fsync-v1",
        ),
    )
    assert res["calibration"]["io_ratio"] == 2.5
    assert res["flagged"] == []
    res2 = compare_artifacts(
        _mk({"q": 1.0}, io_calibration_sec=0.2, io_calibration_probe="v1"),
        _mk({"q": 1.0}, io_calibration_sec=0.5, io_calibration_probe="v2"),
    )
    assert "io_ratio" not in res2["calibration"]


def test_boundary_assume_must_not_overrule_label():
    # same conflict rule as drain: a labeled boundary beats --assume
    with pytest.raises(IncomparableError, match="assume"):
        compare_artifacts(
            _mk(
                {"q": 1.0},
                calibration_sec=0.3,
                calibration_boundary="hoisted-v2",
            ),
            _mk({"q": 1.0}, calibration_sec=0.25),
            assume={"old_boundary": "per-rep-v1"},
        )


def test_boundary_gate_is_context_only():
    # boundary mismatch never blocks the raw comparison, only the
    # calibration context line
    res = compare_artifacts(
        _mk({"q": 1.0}, calibration_sec=0.3, calibration_boundary="per-rep-v1"),
        _mk({"q": 1.0}, calibration_sec=0.25, calibration_boundary="hoisted-v2"),
    )
    assert res["headline_ratio"] == 1.0
    assert not res["calibration"]["comparable"]
    assert "bridge" in res["calibration"]["reason"]


def test_load_artifact_shapes(tmp_path):
    # bare bench line
    p = tmp_path / "bare.json"
    p.write_text(json.dumps({"queries": {"q": 1.0}, "drain": "forcing-v2"}))
    a = load_artifact(str(p))
    assert a["queries"] == {"q": 1.0} and a["runs"] is None
    # raw-reps artifact: min derived from reps
    p2 = tmp_path / "raw.json"
    p2.write_text(json.dumps({"reps": 2, "runs": {"q": [2.0, 1.5]}}))
    a2 = load_artifact(str(p2))
    assert a2["queries"] == {"q": 1.5} and a2["runs"] == {"q": [2.0, 1.5]}
    # real driver wrapper
    a3 = _art("BENCH_r10.json")
    assert a3["meta"]["drain"] == "forcing-v2"
    assert len(a3["queries"]) == 50


def _raw(tmp_path, name, runs, **meta):
    p = tmp_path / name
    p.write_text(json.dumps({"reps": 5, "runs": runs, **meta}))
    return str(p)


def test_pooled_all_reps_separation(tmp_path):
    """VERDICT r11 #1: the pooled rule spans every rep of every pooled
    run. One new run alone separates from the old reps; pooling a
    second run whose best rep overlaps the old spread dissolves the
    separation — the by-hand round-11 adjudication shape."""
    from tools.bench_compare import merge_pool

    old = {
        "queries": {"q": 1.0},
        "runs": {"q": [1.0, 1.1, 1.2]},
        "meta": {"drain": "forcing-v2"},
    }

    def _new(pool_paths):
        art = {
            "queries": {"q": 2.0},
            "runs": {"q": [2.0, 2.2]},  # min 2.0 > max(old) 1.2: separated
            "meta": {"drain": "forcing-v2"},
        }
        merge_pool(art, pool_paths, "new")
        return compare_artifacts(old, art)

    assert _new([])["flagged"] == ["q"]
    overlap_run = _raw(
        tmp_path, "run2.json", {"q": [1.15, 2.5]}, drain="forcing-v2"
    )
    assert _new([overlap_run])["flagged"] == []


def test_pooled_old_side_and_min_rederivation(tmp_path):
    from tools.bench_compare import merge_pool

    old = {
        "queries": {"q": 3.0},
        "runs": {"q": [3.0, 3.2]},
        "meta": {"drain": "forcing-v2"},
    }
    fast_old = _raw(tmp_path, "old2.json", {"q": [0.9, 3.1]})
    merge_pool(old, [fast_old], "old")
    assert old["queries"]["q"] == 0.9  # pooled min re-derived
    new = {
        "queries": {"q": 1.0},
        "runs": {"q": [1.0, 1.05]},
        "meta": {"drain": "forcing-v2"},
    }
    res = compare_artifacts(old, new)
    # new reps sit INSIDE the pooled old spread: neither flag nor improve
    assert res["flagged"] == [] and res["improved"] == []


def test_pooled_drain_mismatch_refuses(tmp_path):
    from tools.bench_compare import merge_pool

    art = {"queries": {}, "runs": {}, "meta": {"drain": "forcing-v2"}}
    bad = _raw(tmp_path, "bad.json", {"q": [1.0]}, drain="count-v1")
    with pytest.raises(IncomparableError, match="drain"):
        merge_pool(art, [bad], "new")


def test_pooled_sentinel_reps_dropped(tmp_path):
    from tools.bench_compare import merge_pool

    art = {
        "queries": {"q": 1.0},
        "runs": {"q": [1.0]},
        "meta": {"drain": "forcing-v2"},
    }
    failed = _raw(tmp_path, "failed.json", {"q": [-1.0], "r": [-1.0]})
    merge_pool(art, [failed], "new")
    assert art["runs"]["q"] == [1.0]  # sentinel not pooled
    assert "r" not in art["runs"]  # all-sentinel query not introduced


def test_pooled_rederive_ignores_sentinel_primary_min(tmp_path):
    """Review r13: a failed-query sentinel recorded as the PRIMARY's
    min (bench writes -1.0) must not survive min re-derivation when
    good pooled reps exist — min(2.5, -1.0) would keep the sentinel
    and corrupt every downstream ratio."""
    from tools.bench_compare import merge_pool

    art = {
        "queries": {"q": -1.0},
        "runs": {"q": [-1.0]},
        "meta": {"drain": "forcing-v2"},
    }
    good = _raw(tmp_path, "good.json", {"q": [2.5, 2.7]})
    merge_pool(art, [good], "new")
    assert art["queries"]["q"] == 2.5
    assert art["runs"]["q"] == [2.5, 2.7]


def test_window_labels_surface_as_context():
    old = {
        "queries": {"q": 1.0},
        "runs": None,
        "meta": {"drain": "forcing-v2", "window": "healthy"},
    }
    new = {
        "queries": {"q": 1.1},
        "runs": None,
        "meta": {"drain": "forcing-v2", "window": "degraded"},
    }
    res = compare_artifacts(old, new)
    assert res["windows"] == {"old": "healthy", "new": "degraded"}
    # context only: labels never change verdicts
    assert res["flagged"] == []


def test_window_labels_absent_on_old_artifacts():
    art = {"queries": {"q": 1.0}, "runs": None, "meta": {"drain": "forcing-v2"}}
    res = compare_artifacts(art, dict(art))
    assert res["windows"] == {}


def test_merge_pool_noop_without_pool_flags():
    """ADVICE r12 (medium): with no --pool flags, merge_pool must not
    touch the artifact — the unconditional re-derive changed --old-raw
    behavior and let a -1 sentinel rep become the query min."""
    from tools.bench_compare import merge_pool

    art = {
        "queries": {"q": 2.0},
        # attached via --old-raw; carries a failed-rep sentinel
        "runs": {"q": [2.0, -1.0, 2.2]},
        "meta": {"drain": "forcing-v2"},
    }
    before = json.loads(json.dumps(art))
    assert merge_pool(art, [], "old") == []
    assert art == before  # untouched: min stays 2.0, runs unmodified


def test_pooled_min_rederive_filters_sentinels(tmp_path):
    """Sentinel reps (≤0) must never become the re-derived min even
    when they arrived on the primary side via --old-raw."""
    from tools.bench_compare import merge_pool

    art = {
        "queries": {"q": 2.0},
        "runs": {"q": [2.0, -1.0]},
        "meta": {"drain": "forcing-v2"},
    }
    extra = _raw(tmp_path, "extra.json", {"q": [2.5]})
    merge_pool(art, [extra], "old")
    assert art["queries"]["q"] == 2.0  # -1 sentinel never the min
    assert all(r > 0 for r in art["runs"]["q"])


def test_mins_only_primary_seeds_its_min_as_rep(tmp_path):
    """ADVICE r12: a mins-only primary's min is a real observation —
    pooling must include it in the all-reps separation rule, not let
    the pooled raws alone declare a separation the full evidence
    doesn't support."""
    from tools.bench_compare import merge_pool

    old = {
        "queries": {"q": 1.0},
        "runs": {"q": [1.0, 1.2]},
        "meta": {"drain": "forcing-v2"},
    }
    # primary new artifact is mins-only with min 1.1 (inside old
    # spread); the pooled raw alone would separate (min 1.5 > 1.2)
    new = {"queries": {"q": 1.1}, "runs": None, "meta": {"drain": "forcing-v2"}}
    slow_run = _raw(tmp_path, "slow.json", {"q": [1.5, 1.6]})
    merge_pool(new, [slow_run], "new")
    assert 1.1 in new["runs"]["q"]  # primary min participates
    res = compare_artifacts(old, new)
    assert res["flagged"] == []  # 1.1 overlaps old spread → no separation


def test_high_variance_ledger_widens_mins_only_threshold():
    """VERDICT r12 #1: x9_pack_shards/x9_source_mix carry a measured
    per-query noise factor (X9_AB.json) so their routine ~1.6x
    mins-only swings stop reappearing in adjudications — while a
    swing beyond the measured spread, or a true all-reps separation,
    still flags."""
    from tools.bench_compare import HIGH_VARIANCE

    f = HIGH_VARIANCE["x9_pack_shards"]
    # the r11→r12 committed swing (x1.62) no longer flags mins-only
    res = compare_artifacts(
        _mk({"x9_pack_shards": 0.478, "q": 1.0}),
        _mk({"x9_pack_shards": 0.774, "q": 1.0}),
    )
    assert res["flagged"] == []
    assert res["verdicts"]["x9_pack_shards"]["high_variance_factor"] == f
    # beyond the measured spread still flags
    res = compare_artifacts(
        _mk({"x9_pack_shards": 0.478}), _mk({"x9_pack_shards": 0.478 * (f + 0.1)})
    )
    assert res["flagged"] == ["x9_pack_shards"]
    # all-reps separation ignores the ledger: a real regression with
    # fully separated reps flags even inside the scalar band
    res = compare_artifacts(
        _mk({"x9_pack_shards": 0.45}, {"x9_pack_shards": [0.45, 0.50]}),
        _mk({"x9_pack_shards": 0.55}, {"x9_pack_shards": [0.55, 0.60]}),
    )
    assert res["flagged"] == ["x9_pack_shards"]
    # a non-ledger query keeps the global band
    res = compare_artifacts(_mk({"q": 1.0}), _mk({"q": 1.62}))
    assert res["flagged"] == ["q"]


def test_high_variance_ledger_is_receipt_backed():
    """Every ledger entry must cite a committed A/B artifact whose
    measured healthy-window spread the factor actually covers."""
    from tools.bench_compare import HIGH_VARIANCE

    path = os.path.join(REPO, "X9_AB.json")
    assert os.path.exists(path), "ledger without its receipt artifact"
    with open(path) as fh:
        ab = json.load(fh)
    assert ab["window"] == "healthy"
    for q, factor in HIGH_VARIANCE.items():
        assert ab["verdicts"][q]["noise_confirmed"], q
        assert factor >= ab["stats"][q]["spread"], (
            f"{q}: ledger factor {factor} below measured spread "
            f"{ab['stats'][q]['spread']}"
        )


def test_pooled_sf_cpus_mismatch_refuses(tmp_path):
    """ADVICE r12: self-describing sf/cpus fields must match — reps at
    a different scale factor or core count are incomparable."""
    from tools.bench_compare import merge_pool

    art = {
        "queries": {"q": 1.0},
        "runs": {"q": [1.0]},
        "meta": {"drain": "forcing-v2", "sf": 0.1, "cpus": 32},
    }
    bad_sf = _raw(tmp_path, "sf.json", {"q": [1.0]}, sf=0.01, cpus=32)
    with pytest.raises(IncomparableError, match="sf"):
        merge_pool(dict(art, runs=dict(art["runs"])), [bad_sf], "new")
    bad_cpus = _raw(tmp_path, "cpus.json", {"q": [1.0]}, sf=0.1, cpus=8)
    with pytest.raises(IncomparableError, match="cpus"):
        merge_pool(dict(art, runs=dict(art["runs"])), [bad_cpus], "new")
    # unlabeled pooled raws (pre-r12 archive) still accepted
    unlabeled = _raw(tmp_path, "old.json", {"q": [1.1]})
    assert merge_pool(art, [unlabeled], "new") == [unlabeled]
