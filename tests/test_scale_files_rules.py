"""The file-count ladder's additive-axis flag rule (tools/scale_files).

The FILE axis is additive (per-file listing/footer cost), so the
shared ratio-divergence rule mis-fires on cheap stages; the additive
rule flags only per-file overhead that GROWS with K. These replays pin
the calibration: the measured round-11 shapes (linear overhead, and
the pre-fix double-scan's 2× CONSTANT) stay unflagged, synthetic
superlinear shapes flag.
"""

from __future__ import annotations

from tools.scale_files import RUNGS, filecount_superlinear


def test_linear_per_file_overhead_not_flagged():
    # measured post-fix x2 shape (round 11): base 0.40, +0.6 s at
    # K=1024 — linear footer/listing cost on a small base
    secs = {"x2": [0.40, 0.53, 0.73, 1.02], "x5": [0.82, 0.95, 0.65, 0.83]}
    flagged, detail = filecount_superlinear(secs, RUNGS)
    assert flagged == []
    assert not detail["x2"]["superlinear"]


def test_constant_factor_cost_not_flagged():
    # the PRE-fix double-scan x2 shape: 2x the per-file constant of
    # its peers — a real inefficiency (caught by the informational
    # watch rule, fixed via min_by) but LINEAR, so not a superlinearity
    secs = {"x2": [0.56, 0.67, 0.89, 1.41], "q01": [1.28, 0.77, 0.56, 1.08]}
    flagged, _ = filecount_superlinear(secs, RUNGS)
    assert flagged == []


def test_quadratic_listing_flagged():
    # cost = base + b*K^2 with delta(1024) = 16 * delta(256): the
    # O(K^2) shape an accidental per-file relisting would produce
    secs = {
        "bad": [0.5, 0.5 + 0.001 * 16**2, 0.5 + 0.001 * 256**2 / 100, 0.5 + 0.001 * 1024**2 / 100],
        "ok": [0.5, 0.55, 0.6, 0.8],
    }
    flagged, detail = filecount_superlinear(secs, RUNGS)
    assert flagged == ["bad"]
    assert detail["bad"]["superlinear"]


def test_subfloor_overhead_never_flags():
    # overhead below the noise floor is not a scale signal, however
    # its per-file ratio looks
    secs = {"tiny": [0.10, 0.10, 0.11, 0.20], "peer": [1.0, 1.0, 1.0, 1.0]}
    flagged, _ = filecount_superlinear(secs, RUNGS)
    assert flagged == []


def test_absolute_rule_requires_absolute_floor():
    # the r11-ADVICE misfire: base 0.1 s, perfectly linear per-file
    # overhead reaching +0.5 s at K=1024 — ratio 6 but a healthy
    # additive shape; must NOT trip the exit-code flag
    from tools.scale_files import absolute_blowup

    secs = {"cheap_linear": [0.10, 0.11, 0.22, 0.60]}
    assert absolute_blowup(secs) == []


def test_absolute_rule_flags_true_blowup():
    # a stage that truly blows up clears both the ratio and the floor
    from tools.scale_files import absolute_blowup

    secs = {
        "blowup": [0.5, 0.7, 2.5, 9.0],
        "flat": [1.0, 1.0, 1.1, 1.2],
    }
    assert absolute_blowup(secs) == ["blowup"]
