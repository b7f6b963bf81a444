#!/usr/bin/env python
"""Dump `.explain("formatted")` for core-catalog queries to
plans/r<N>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (OPTIMIZATION_r17.md).

Usage:
    python tools/dump_round_plans.py --suffix before [names...]

With no names, dumps every core query. Streaming queries (s_*) execute
via foreachBatch inside their query functions, so their batch-side plan
is not reachable from a DataFrame handle; for those the tool records the
plan of the underlying batch computation where the module exposes one,
else skips with a note.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--round", default="r17")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized

    outdir = os.path.join(REPO, "plans", args.round)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("dump-round-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # default: batch rows only — an s_* query function RUNS its stream
    # and returns the sink read-back, whose plan is a bare parquet scan
    # (the interesting plan is per-micro-batch inside foreachBatch)
    names = args.names or [n for n in queries if not n.startswith("s_")]
    skipped = []
    for name in names:
        if name not in queries:
            print(f"[skip] {name}: not in core catalog", file=sys.stderr)
            skipped.append(name)
            continue
        release_materialized()
        try:
            df = queries[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            print(f"[err ] {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            skipped.append(name)
            continue
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"[ok  ] {path}")
    if skipped:
        # nonzero exit (ADVICE r17 #4): a sweep that failed to dump
        # before/after plan evidence must not look like success — a
        # hole in an optimization round's receipts was previously only
        # visible by reading stderr
        print(f"skipped: {skipped}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
