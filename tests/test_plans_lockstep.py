"""PLANS.md lockstep (VERDICT r8 item 1): the committed plan dump must
match a fresh render at HEAD, so a plan-affecting commit that forgets
`tools/dump_plans.py` goes red instead of silently drifting (round 8:
commit 66406af changed g_triangle_counts' df-cap literal 250→64 and
claimed a re-dump that never landed — PLANS.md carried the stale 250
for the rest of the round).

Runs dump_plans --check in a SUBPROCESS: the dump session is pinned at
cpus=4 and Exchange nodes print their partition counts, so rendering
inside the shared test session (different cpus/shuffle partitions)
would diff on configuration, not plans.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_md_is_current_at_head():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dump_plans.py"), "--check"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=570,
    )
    assert proc.returncode == 0, (
        "PLANS.md is stale — run `python tools/dump_plans.py` and commit.\n"
        + proc.stderr[-2000:]
    )


def test_normalize_strips_volatile_ids_only():
    """The ID normalization must equate same-plan dumps from different
    sessions (IDs shift with analyzer history) while still seeing a
    REAL literal change — the exact round-8 drift (df <= 250 vs 64)
    must not be normalized away."""
    from tools.dump_plans import normalize

    a = "Condition : ((df#2248L >= 2) AND (df#2248L <= 64)) [plan_id=17]"
    b = "Condition : ((df#9001L >= 2) AND (df#9001L <= 64)) [plan_id=3]"
    stale = "Condition : ((df#2248L >= 2) AND (df#2248L <= 250)) [plan_id=17]"
    assert normalize(a) == normalize(b)
    assert normalize(a) != normalize(stale)
