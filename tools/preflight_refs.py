#!/usr/bin/env python
"""Validate (or re-base) the bench pre-flight HEALTHY_WINDOW refs.

The floor references are PROTOCOL-BOUND (bench.HEALTHY_WINDOW
docstring; SCALE.md round 12): they are only meaningful under the
exact shallow-warm measurement the pre-flight performs. This tool
therefore does not re-implement the probes — it runs ``bench.py``
itself in N fresh subprocesses with ``SPARK_GRAFT_PREFLIGHT_ONLY=1``
(probes run, suite skipped) and aggregates the per-trial readings
against the pinned refs.

Output: per-probe trial values, best-of-trials, ratio vs ref, and a
suggested refs block if any probe's BEST trial sits outside ±20% of
its ref on a window where cpu AND io read healthy (a probe that
cannot reach its ref on a healthy-cpu/io window is mis-based — the
round-12 floor divergence shape; a probe merely elevated along with
cpu/io is a degraded host, not a bad ref).

    python tools/preflight_refs.py [--trials 3]

Exit 0 always (informational); re-basing is a deliberate commit, not
an automated side effect.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def assess(trials: list[dict], refs: dict, factor: float) -> dict:
    """Pure assessment: best-of-trials per probe vs refs; a probe is
    mis-based only when its BEST reading sits outside ±20% of its ref
    on a window where cpu AND io read healthy (elevation alongside
    cpu/io is a degraded host, not a bad ref — the distinction that
    separated the round-12 floor re-base from ordinary noise)."""
    best = {k: min(t[k] for t in trials if k in t) for k in trials[0]}
    report = {
        k: {
            "best": best[k],
            "ref": refs.get(k),
            "ratio": round(best[k] / refs[k], 3) if refs.get(k) else None,
        }
        for k in best
    }
    cpu_io_healthy = all(
        report[k]["ratio"] is not None and report[k]["ratio"] <= factor
        for k in ("cpu_calibration_sec", "io_calibration_sec")
        if k in report
    )
    misbased = [
        k
        for k, r in report.items()
        if r["ratio"] is not None and not (0.8 <= r["ratio"] <= 1.2)
    ] if cpu_io_healthy else []
    return {
        "trials": trials,
        "report": report,
        "cpu_io_healthy_window": cpu_io_healthy,
        "misbased_probes": misbased,
        "suggested_refs": {k: best[k] for k in misbased},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from bench import DEGRADED_FACTOR, HEALTHY_WINDOW

    trials: list[dict] = []
    for i in range(args.trials):
        env = dict(os.environ, SPARK_GRAFT_PREFLIGHT_ONLY="1")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
            capture_output=True, text=True, cwd=REPO_ROOT, env=env,
            timeout=600,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            checks = json.loads(line)["preflight"]["checks"]
        except (json.JSONDecodeError, KeyError, IndexError):
            print(f"trial {i}: FAILED\n{proc.stderr[-1500:]}", file=sys.stderr)
            continue
        trials.append({k: v["sec"] for k, v in checks.items()})
        print(f"trial {i}: " + json.dumps(trials[-1]), file=sys.stderr)

    if not trials:
        print(json.dumps({"error": "no successful trials"}))
        return 0

    out = assess(trials, HEALTHY_WINDOW, DEGRADED_FACTOR)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
