"""Retry determinism for the seeded sampling/shuffle family
(VERDICT r12 #4).

The catalog claims x9_hash_sample / x9_weighted_sample /
x9_epoch_shuffle / DOULION's hash-Bernoulli are deterministic under
task re-execution because every membership/position decision is a
content hash of row ids, never ``rand()`` (whose draw depends on
partition and attempt) — this test makes that claim mechanical. It
spawns ``tests/retry_harness.py`` in a subprocess (task retries need a
``local[N, F]`` master, which the session-scoped fixture doesn't have
and a live context can't switch to), where each query runs clean and
then with a PLANTED one-shot partition-0 task failure; the harness
reports per-query value hashes plus attempt-marker receipts proving
the retry actually happened (a planted failure that didn't retry
would fail the job outright under maxFailures=2 — and the control
assertion below still demands both attempt markers).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sampling_family_identical_after_task_retry():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "retry_harness.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    expected = {
        "x9_hash_sample",
        "x9_weighted_sample",
        "x9_epoch_shuffle",
        "g_doulion_triangles",
    }
    assert set(out) == expected
    for name, r in out.items():
        # control: the planted failure provably fired AND retried
        assert r["retried"], f"{name}: no retry receipt — {r['attempts']}"
        assert r["rows"] > 0, name
        # the claim: retried output is bit-identical to the clean run
        assert r["match"], f"{name}: output hash changed after task retry"
