#!/usr/bin/env python
"""File-COUNT scale ladder: certify the scan path against small-file
explosion — the input-LAYOUT axis none of the other ladders vary.

Every certified axis so far varies DATA (corpus count, tokens/doc,
dims/vector, JSON size) or EXECUTION (parallelism); all of them read
the fixture tables as one parquet file per table. At 100 TB a table is
~10⁵ files, and the costs that appear are per-FILE, not per-byte:
driver-side listing, footer reads, split planning, task scheduling.
This ladder holds data volume CONSTANT and rewrites the two
scan-dominant tables (lineitem, documents) as K files, K × 1/16/256/
1024 — a pipeline whose cost is per-byte stays ~flat; per-file
overhead shows up as growth along K, and anything superlinear in K
(e.g. an O(K²) listing or a plan that defeats Spark's small-file
bin-packing) is flagged.

Expectation to certify, not assume: Spark packs small files into
splits of ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
totalBytes/defaultParallelism))`` with each file billed size +
openCost, so scan TASK count stays bounded as K grows (the model is
pinned exactly by tests/test_file_packing.py); wall cost then grows
mildly and LINEARLY in K via footer reads + listing. The recorded
per-rung scan-partition counts document the packing in action. The
compaction answer to this axis at rest is `sources/layout.
compaction_plan` (the operator exists precisely because this curve is
not flat); the ingest answer is fewer, larger files per commit.

Flag rules — the FILE axis is ADDITIVE, so the shared ratio-based
family rule (tools/ladder_flags.py) does not transfer: per-file
overhead is a cost in seconds per file that every stage pays about
equally, which makes a RATIO blow up on whichever stage has the
smallest base while staying invisible on expensive ones. (Running the
ratio rule anyway on the first sweep flagged exactly that — and the
smell was still useful: it surfaced deterministic_dedup's double scan,
now fixed to the single-scan min_by form. The ratio divergence is
therefore kept as an INFORMATIONAL `watch_divergent` column, never an
exit-code flag.) The gating rules are:

* absolute: top-rung ratio > FLAG_RATIO (4×) AND top-rung growth ≥
  ABS_FLOOR_SEC (1 s) — a stage that truly blows up in K clears any
  base, while a cheap stage whose purely-linear per-file overhead
  dwarfs its tiny base (the small-base misfire this additive axis
  must avoid) stays under the absolute floor;
* additive superlinearity: per-file overhead (sec(K) − sec(1)) / K
  must not GROW with K. Linear cost (base + a·K, the healthy shape:
  listing + footer reads) keeps it constant; an O(K²) listing or a
  plan defeating bin-packing multiplies it by K_top/K_mid. Flag when
  the top rung's per-file overhead exceeds DELTA_FACTOR × the
  floor-bounded per-file overhead of every middle rung, and the top
  overhead itself clears DELTA_FLOOR_SEC (below that it is
  measurement noise, not a scale signal).

    python tools/scale_files.py [--sf-dir /root/testdata/sf0.1]

Writes SCALE_FILES.json; exit 1 if any stage is flagged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: file-count rungs for the exploded tables (K=1 is the fixture shape)
RUNGS = (1, 16, 256, 1024)
FLAG_RATIO = 4.0
#: additive rule: top-rung per-file overhead may not exceed this
#: factor times any middle rung's (linear ⇒ ~1×; K² ⇒ K_top/K_mid ≈ 4×)
DELTA_FACTOR = 2.0
#: overhead below this is timer noise, not a per-file cost signal
DELTA_FLOOR_SEC = 0.25
#: the absolute-ratio rule additionally requires the top-rung growth
#: to clear this floor: a cheap stage (base ~0.1 s) with perfectly
#: linear per-file overhead (+0.5 s at K=1024) posts ratio 6 — the
#: healthy additive shape this axis must NOT flag. 1 s of growth at
#: 1024 files ≈ 1 ms/file on sf0.1 — at that magnitude the ratio is
#: a real per-file cost story, not a small-base artifact.
ABS_FLOOR_SEC = 1.0


def filecount_superlinear(stage_secs, rungs, factor=DELTA_FACTOR, floor=DELTA_FLOOR_SEC):
    """Additive-axis rule: flag stages whose per-file overhead GROWS
    with K. Returns (flagged names, per-stage overhead map)."""
    flagged, detail = [], {}
    for s, secs in stage_secs.items():
        deltas = [max(sec - secs[0], 0.0) for sec in secs]
        per_file = [d / k for d, k in zip(deltas, rungs)]
        # floor-bounded reference: a middle rung whose overhead is
        # below the floor still certifies per-file cost ≤ floor/K
        refs = [
            max(d, floor) / k for d, k in zip(deltas[1:-1], rungs[1:-1])
        ]
        top_d, top_pf = deltas[-1], per_file[-1]
        is_flagged = bool(
            refs and top_d >= floor and top_pf > factor * min(refs)
        )
        if is_flagged:
            flagged.append(s)
        detail[s] = {
            "overhead_sec": [round(d, 2) for d in deltas],
            "per_file_ms": [round(p * 1000, 3) for p in per_file],
            "superlinear": is_flagged,
        }
    return flagged, detail

def absolute_blowup(stage_secs, ratio=FLAG_RATIO, floor=ABS_FLOOR_SEC):
    """Absolute gating rule: top-rung ratio > ``ratio`` AND top-rung
    growth ≥ ``floor`` seconds. The ratio alone misfires on a cheap
    stage with purely linear per-file overhead (base ~0.1 s, +0.5 s at
    K=1024 posts ratio 6 — the healthy additive shape); the absolute
    floor keeps the rule for stages that truly blow up (ADVICE r11)."""
    return [
        n
        for n, secs in stage_secs.items()
        if secs[-1] / max(secs[0], 0.01) > ratio
        and (secs[-1] - secs[0]) >= floor
    ]


#: tables rewritten as K files; everything else is symlinked unchanged
EXPLODED = ("lineitem", "documents")
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: stages spanning the scan profiles over the exploded tables:
#: single-table agg, multi-join, per-row text features, shuffle dedup,
#: pair-generating shingle index — plus r06 (orders, UNTOUCHED) as the
#: control that should stay flat on every rung
STAGES = (
    "q01_pricing_summary",  # lineitem: scan + 4-group agg
    "q09_profit_by_nation_year",  # lineitem join part/supplier/orders
    "x5_text_features",  # documents: per-row token features
    "x2_dedup_survivors",  # documents: fingerprint shuffle
    "x3_ngram_jaccard",  # documents: capped inverted index + pairs
    "r06_counts",  # orders (1 file on every rung): control
)


def stage_rung(spark, sf_dir: str, out: str, k: int) -> dict[str, int]:
    """Build a rung dir: EXPLODED tables rewritten as ~k files, the
    rest symlinked to the fixture. Returns actual file counts."""
    counts = {}
    os.makedirs(out, exist_ok=True)
    for t in ALL_TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in EXPLODED and k > 1:
            spark.read.parquet(src).repartition(k).write.mode(
                "overwrite"
            ).parquet(dst)
            counts[t] = sum(
                1 for f in os.listdir(dst) if f.endswith(".parquet")
            )
        else:
            # re-point unconditionally: a stale symlink from a prior
            # run with a different --sf-dir would silently measure the
            # previous fixture (ADVICE r11)
            if os.path.lexists(dst):
                if os.path.islink(dst):
                    os.unlink(dst)
                else:  # a prior run exploded this table here
                    import shutil

                    shutil.rmtree(dst)
            os.symlink(src, dst)
            counts[t] = 1
    return counts


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = parser.parse_args()

    from bench import drain
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir

    spark = get_spark("scale-files", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(extended=True)

    results = []
    warmed = False
    for k in RUNGS:
        rung_dir = scratch_dir(f"files-{k}x")
        counts = stage_rung(spark, args.sf_dir, rung_dir, k)
        # the packing receipt: scan task count for the exploded
        # lineitem at this rung (bounded << K once packing engages)
        scan_parts = spark.read.parquet(
            os.path.join(rung_dir, "lineitem.parquet")
        ).rdd.getNumPartitions()
        if not warmed:
            for name in STAGES:
                drain(queries[name](spark, rung_dir))
            warmed = True
        row = {
            "k": k,
            "files": counts,
            "lineitem_scan_partitions": scan_parts,
            "stages": {},
        }
        for name in STAGES:
            release_materialized()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out_rows = drain(queries[name](spark, rung_dir))
            row["stages"][name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "rows": out_rows,
            }
        results.append(row)
        print(
            f"[K={k:5d}, scan_parts={scan_parts:4d}] "
            + "  ".join(f"{s}={v['sec']:.1f}s" for s, v in row["stages"].items()),
            file=sys.stderr,
        )

    from tools.ladder_flags import family_divergence

    stage_secs = {
        name: [r["stages"][name]["sec"] for r in results] for name in STAGES
    }
    # gating rules: absolute ratio + additive per-file-overhead growth
    abs_flagged = absolute_blowup(stage_secs)
    add_flagged, overhead = filecount_superlinear(stage_secs, RUNGS)
    flagged = sorted(set(abs_flagged) | set(add_flagged))
    # informational only on this axis (see module docstring): the
    # ratio rule mistakes a small base for a hazard here, but its
    # smell found the double-scan — keep it visible, not gating
    watch = family_divergence(stage_secs)
    print(f"{'stage':26s} " + "  ".join(f"K*{k:<5d}" for k in RUNGS), file=sys.stderr)
    for name in STAGES:
        secs = stage_secs[name]
        ratio = secs[-1] / max(secs[0], 0.01)
        pf = overhead[name]["per_file_ms"]
        marks = []
        if name in flagged:
            marks.append("FLAGGED")
        if watch[name]["divergent_rungs"]:
            marks.append(f"watch@{watch[name]['divergent_rungs']}")
        print(
            f"{name:26s} " + "  ".join(f"{s:7.2f}" for s in secs)
            + f"  (x{ratio:.1f}, per-file ms {pf[1:]}"
            + (", " + " ".join(marks) if marks else "") + ")",
            file=sys.stderr,
        )

    payload = {
        "metric": "scale_files",
        "sf_dir": args.sf_dir,
        "rungs": list(RUNGS),
        "exploded_tables": list(EXPLODED),
        "flag_ratio": FLAG_RATIO,
        "delta_factor": DELTA_FACTOR,
        "delta_floor_sec": DELTA_FLOOR_SEC,
        "abs_floor_sec": ABS_FLOOR_SEC,
        "flagged_filecount_superlinear": flagged,
        "overhead": overhead,
        "watch_divergent": {
            s: d["divergent_rungs"] for s, d in watch.items() if d["divergent_rungs"]
        },
        "results": results,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_FILES.json",
        ),
        "w",
    ) as fh:
        fh.write(line + "\n")
    print(line)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
