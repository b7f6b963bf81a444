#!/usr/bin/env python
"""Two-way calibration boundary bridge (VERDICT r9 #2 → r10 #4).

The frozen calibration workload (bench.calibration_df) was timed with
its DataFrame constructed per rep INSIDE the timed region through
rounds 6–8 and HOISTED outside it from round 9 on; the change silently
re-based the yardstick (r8's 0.3175 and r9's 0.2492 are on different
scales), so no cross-boundary headline normalization is possible
without a same-host conversion factor. This tool measures the SAME
frozen plan both ways in one session and prints one JSON line:

    {"per_rep_sec": ..., "hoisted_sec": ..., "bridge": per_rep/hoisted,
     "reps": N, "sf_dir": ...}

``bridge`` converts a per-rep-boundary calibration (r6–r8 artifacts)
to the hoisted scale: calib_hoisted ≈ calib_per_rep / bridge. Run it
on the bench host, quiet, and record the line in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench import calibration_df
    from odoo_batch_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    spark = get_spark("calibration-bridge", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm once (JVM + parquet footers), matching bench.py's ordering
    calibration_df(spark, sf_dir).count()

    # interleave the two boundaries A/B/A/B… so a host-load drift
    # during the run biases both the same way (the r7 drift-arbitration
    # lesson: gap inverting with order == noise)
    per_rep, hoisted = [], []
    cal = calibration_df(spark, sf_dir)
    for _ in range(reps):
        t0 = time.perf_counter()
        calibration_df(spark, sf_dir).count()  # r6–r8 boundary
        per_rep.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        cal.count()  # r9+ boundary
        hoisted.append(time.perf_counter() - t0)

    a, b = round(min(per_rep), 4), round(min(hoisted), 4)
    print(
        json.dumps(
            {
                "per_rep_sec": a,
                "hoisted_sec": b,
                "bridge": round(a / b, 4),
                "reps": reps,
                "raw_per_rep": [round(x, 4) for x in per_rep],
                "raw_hoisted": [round(x, 4) for x in hoisted],
                "sf_dir": sf_dir,
                "cpus": cpus,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
