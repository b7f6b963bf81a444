#!/usr/bin/env python
"""Micro-batch HISTORY ladder: certify that per-batch cost does not
grow with the number of batches already processed.

The streaming family's correctness and floors run over ≤8 micro-
batches; 100 TB ingest is 10⁵+. Two costs grow with HISTORY rather
than with data: the file source's seen-files log (every processed
file stays in the map, compacted every ``spark.sql.streaming.
fileSource.log.compactInterval`` batches) and the checkpoint
offset/commit logs (same compaction scheme). If either is
mishandled, batch N gets slower as N grows — invisible at 8 batches,
fatal at 10⁵. This ladder stages the SAME events corpus as
K = 8 / 32 / 128 time-sliced files, streams it with
``maxFilesPerTrigger=1`` (so K = number of micro-batches; per-batch
DATA shrinks as 1/K while per-batch HISTORY grows), and reads
per-batch ``triggerExecution`` durations from ``recentProgress``.

Flag rules (exit 1):

* ``late_batch_drift``: at the top rung, the mean duration of the
  LAST ``TAIL`` batches exceeds DRIFT_FACTOR × the mean of batches
  [WARM..WARM+TAIL) (the early reference window, skipping the first
  WARM warmup batches) — per-batch data is constant within a rung,
  so a late/early ratio ≫ 1 is history cost. The threshold is
  generous (2×) because single-batch jitter at ~100 ms scale is
  large; systematic growth compounds far past it at 10⁵ batches.
* ``per_batch_superlinear``: mean per-batch duration at the top rung
  exceeds DRIFT_FACTOR × the bottom rung's (each batch carries 1/K
  of the data, so per-batch cost should FALL or stay flat with K —
  growth means per-batch overhead scales with total history).

The recorded curve (mean per-batch sec per rung + early/late split at
every rung) is the posture line; Spark's log compaction is the
mechanism under test. At true 10⁵-file scale production fronts the
listing with a notification queue (sources/sources.py docstring) —
this axis certifies the engine-side logs, not the driver listing.

    python tools/scale_batches.py [--sf-dir /root/testdata/sf0.1]

Writes SCALE_BATCHES.json; exit 1 if flagged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

RUNGS = (8, 32, 128)
DRIFT_FACTOR = 2.0
WARM = 3  #: warmup batches excluded from the early reference window
TAIL = 5  #: batches in each of the early/late comparison windows


def run_rung(spark, sf_dir: str, k: int) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from odoo_batch_processing_spark.sources.sinks import scratch_dir
    from odoo_batch_processing_spark.streaming.queries import (
        _events_time_sliced_dir,
        _mem_name,
    )
    from odoo_batch_processing_spark.streaming.sources import change_source

    src = _events_time_sliced_dir(spark, sf_dir, k)
    name = _mem_name(f"scb_{k}")
    t0 = time.perf_counter()
    q = (
        change_source(spark, src, max_files_per_trigger=1)
        .select("event_id", "user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", scratch_dir(f"scb-{k}-ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    wall = time.perf_counter() - t0
    rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    durs = [
        p["durationMs"].get("triggerExecution", 0) / 1000.0
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    return {"k": k, "wall_sec": round(wall, 2), "rows": rows, "batch_secs": durs}


def _mean(xs):
    return sum(xs) / len(xs) if xs else 0.0


def judge(rungs: list[dict]) -> list[str]:
    """Flag rules from the module docstring; pure. recentProgress
    retains ~the last 100 batches, so the top rung's early window may
    be missing — drift is judged over whatever early window survives
    (first TAIL retained data batches after WARM), which at K=128
    still spans ≥60 batches of history growth."""
    flags = []
    top = rungs[-1]
    durs = top["batch_secs"]
    if len(durs) >= WARM + 2 * TAIL:
        early = _mean(durs[WARM : WARM + TAIL])
        late = _mean(durs[-TAIL:])
        if early > 0 and late > DRIFT_FACTOR * early:
            flags.append("late_batch_drift")
    means = [_mean(r["batch_secs"]) for r in rungs]
    if means[0] > 0 and means[-1] > DRIFT_FACTOR * means[0]:
        flags.append("per_batch_superlinear")
    if len({r["rows"] for r in rungs}) != 1:
        flags.append("rows_differ_across_rungs")
    return flags


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    parser.add_argument("--reps", type=int, default=2)
    args = parser.parse_args()

    from odoo_batch_processing_spark.session import get_spark
    from odoo_batch_processing_spark.streaming.queries import (
        STREAM_SHUFFLE_PARTITIONS,
    )

    spark = get_spark("scale-batches", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)

    run_rung(spark, args.sf_dir, RUNGS[0])  # warm JVM + staging path

    results = []
    for k in RUNGS:
        best = None
        for _ in range(args.reps):
            r = run_rung(spark, args.sf_dir, k)
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
        durs = best["batch_secs"]
        early = _mean(durs[WARM : WARM + TAIL]) if len(durs) > WARM + TAIL else None
        late = _mean(durs[-TAIL:]) if len(durs) >= TAIL else None
        best["early_mean_sec"] = round(early, 4) if early else None
        best["late_mean_sec"] = round(late, 4) if late else None
        best["mean_batch_sec"] = round(_mean(durs), 4)
        best["batch_secs"] = [round(d, 3) for d in durs]
        results.append(best)
        print(
            f"[K={k:4d}] wall={best['wall_sec']:6.2f}s rows={best['rows']} "
            f"mean/batch={best['mean_batch_sec']:.3f}s "
            f"early={best['early_mean_sec']} late={best['late_mean_sec']}",
            file=sys.stderr,
        )

    flags = judge(results)
    payload = {
        "metric": "scale_batches",
        "sf_dir": args.sf_dir,
        "rungs": list(RUNGS),
        "reps": args.reps,
        "drift_factor": DRIFT_FACTOR,
        "warm": WARM,
        "tail": TAIL,
        "results": results,
        "flagged": flags,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(os.path.join(REPO_ROOT, "SCALE_BATCHES.json"), "w") as fh:
        fh.write(line + "\n")
    print(line)
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
